package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture
import graft.queries.QueryKit

/** Sketch-based aggregation at scale: HyperLogLog distinct counts and
  * KLL/GK approximate percentiles are THE way to aggregate 100 TB
  * (fixed-size buffers, map-side mergeable) — verify their error
  * bounds against exact answers on the driver corpus. */
class SketchAggSpec extends AnyFlatSpec with Matchers with SparkFixture {

  private val dir = "/root/testdata/sf0.01"

  behavior of "approximate sketches vs exact"

  it should "bound HLL distinct-count error under 5%" in {
    val events = QueryKit.table(spark, dir, "events")
    val row = events.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), rsd = 0.02).as("approx")).head()
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    math.abs(approx - exact).toDouble / exact should be < 0.05
  }

  it should "bound approximate percentile drift" in {
    val li = QueryKit.table(spark, dir, "lineitem")
    val row = li.agg(
      expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("p50_approx"),
      expr("percentile(l_extendedprice, 0.5)").as("p50_exact")).head()
    val (approx, exact) = (row.getDouble(0), row.getDouble(1))
    math.abs(approx - exact) / exact should be < 0.01
  }

  it should "merge HLL sketches across groups (two-level aggregation)" in {
    val events = QueryKit.table(spark, dir, "events")
    // sketch per event_type, then merge to a global count — the
    // reaggregation pattern rollup pipelines need
    val perType = events.groupBy("event_type")
      .agg(hll_sketch_agg(col("user_id").cast("string")).as("sk"))
    val merged = perType.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("merged")).head().getLong(0)
    val exact = events.select(countDistinct("user_id")).head().getLong(0)
    math.abs(merged - exact).toDouble / exact should be < 0.05
  }
}
