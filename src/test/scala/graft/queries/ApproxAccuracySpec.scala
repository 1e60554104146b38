package graft.queries

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** The accuracy contract of the approximate tier (`agg_approx` has no
  * SQL oracle — sketch internals aren't reproducible across engines —
  * so its guarantee lives HERE): HLL++ distinct counts within the
  * configured standard error of the exact aggregates, and the
  * sketch median within the rank error bound implied by its accuracy
  * parameter. Both sketches are deterministic for a given input, so
  * these are stable assertions, not flaky statistical ones. */
class ApproxAccuracySpec extends AnyFlatSpec with Matchers with SparkFixture {

  private val dir = "/root/testdata/sf0.01"

  behavior of "agg_approx (the 100 TB approximate tier)"

  it should "stay within HLL / quantile-sketch error of the exact aggregates" in {
    val approx = AnalyticsQueries.aggApprox(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val exactDistinct = AnalyticsQueries.distinctAgg(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val exactPct = AnalyticsQueries.aggPercentiles(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap

    approx.keySet shouldBe exactDistinct.keySet
    approx.foreach { case (flag, a) =>
      val ed = exactDistinct(flag)
      // HLL++ default relativeSD = 0.05 → 3σ bound of 15%
      math.abs(a.getLong(1) - ed.getLong(2)).toDouble / ed.getLong(2) should be < 0.15 // parts
      math.abs(a.getLong(2) - ed.getLong(1)).toDouble / ed.getLong(1) should be < 0.15 // suppliers
      // approx_percentile(accuracy=1000): rank error ≤ n/1000 → the
      // price at that rank distance; 2% relative price slack covers it
      val p50Exact = exactPct(flag).getLong(1)
      math.abs(a.getLong(3) - p50Exact).toDouble / p50Exact should be < 0.02
    }
  }
}
