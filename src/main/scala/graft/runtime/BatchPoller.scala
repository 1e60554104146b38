package graft.runtime

/** Fixed-interval batch poll loop — the reference's
  * `PollingSourceLogic` (PollingSource.cs:10-31: validates
  * `changeCaptureInterval > 0`, owns the poll timer) for snapshot-style
  * sources that re-run a batch read per tick (S1 `SqlServerSource`
  * full-table poll, S5 blob listing re-list).
  *
  * Each poll runs under the [[Supervision]] restart decider (timeout /
  * I/O faults retry with a pause, reference
  * SqlServerChangeTrackingSource.cs:225-229); non-transient faults
  * propagate to the caller's exit-code mapping.
  */
final class BatchPoller(
    interval: java.time.Duration,
    maxRestartsPerPoll: Int = 3,
    sleep: Long => Unit = Thread.sleep) {

  require(!interval.isNegative && !interval.isZero,
    "changeCaptureInterval must be positive") // reference: PollingSource.cs:18

  @volatile private var stopRequested = false

  def requestStop(): Unit = { stopRequested = true }

  /** Poll until stopped (or `maxPolls` for backfill-style bounded
    * runs); returns the number of completed polls. */
  def run(maxPolls: Long = Long.MaxValue)(poll: () => Unit): Long = {
    var n = 0L
    while (!stopRequested && n < maxPolls) {
      Supervision.withRestarts(maxRestartsPerPoll, interval.toMillis, sleep)(poll())
      n += 1
      if (!stopRequested && n < maxPolls) sleep(interval.toMillis)
    }
    n
  }
}
