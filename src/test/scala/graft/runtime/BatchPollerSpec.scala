package graft.runtime

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** The S1/S5 poll-loop contract (reference PollingSource.cs:10-31):
  * interval validation, bounded polls, stop flag, transient-fault
  * restarts inside a tick. */
class BatchPollerSpec extends AnyFlatSpec with Matchers {

  private def poller(ms: Long = 10) =
    new BatchPoller(java.time.Duration.ofMillis(ms), sleep = _ => ())

  behavior of "BatchPoller"

  it should "reject a non-positive interval like the reference" in {
    an[IllegalArgumentException] should be thrownBy
      new BatchPoller(java.time.Duration.ZERO)
    an[IllegalArgumentException] should be thrownBy
      new BatchPoller(java.time.Duration.ofSeconds(-1))
  }

  it should "run exactly maxPolls polls" in {
    var polls = 0
    poller().run(maxPolls = 5)(() => polls += 1) shouldBe 5
    polls shouldBe 5
  }

  it should "stop when requested" in {
    val p = poller()
    var polls = 0
    p.run(maxPolls = 100) { () =>
      polls += 1
      if (polls == 3) p.requestStop()
    } shouldBe 3
  }

  it should "ride out transient faults within a tick" in {
    var attempts = 0
    poller().run(maxPolls = 1) { () =>
      attempts += 1
      if (attempts < 3) throw new java.io.IOException("flaky")
    } shouldBe 1
    attempts shouldBe 3
  }

  it should "propagate non-transient faults" in {
    a[RuntimeException] should be thrownBy
      poller().run(maxPolls = 1)(() => throw new RuntimeException("fatal"))
  }
}
