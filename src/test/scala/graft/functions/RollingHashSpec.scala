package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

class RollingHashSpec extends AnyFlatSpec with Matchers with SparkFixture {

  private def reference(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 257L + (b & 0xff)) % 1000000007L)

  behavior of "RollingHash expression"

  it should "match the byte-fold reference across inputs" in {
    import spark.implicits._
    GraftFunctions.register(spark)
    val inputs = Seq("", "a", "abc", "the quick brown fox", "0123456789" * 50)
    val out = inputs.toDF("s")
      .select(expr("graft_rolling_hash(s)")).as[Long].collect()
    out.toSeq shouldBe inputs.map(reference)
  }

  it should "be order-sensitive (unlike a bag hash) and null-safe" in {
    import spark.implicits._
    GraftFunctions.register(spark)
    val out = Seq("ab", "ba").toDF("s")
      .select(expr("graft_rolling_hash(s)")).as[Long].collect()
    out(0) should not be out(1)
    Seq[String](null).toDF("s")
      .select(expr("graft_rolling_hash(s)")).collect().head.isNullAt(0) shouldBe true
  }

  it should "run inside whole-stage codegen with correct results" in {
    import spark.implicits._
    GraftFunctions.register(spark)
    // range source ⇒ codegen'd stage (a local relation would be
    // constant-folded before ever reaching the generated code path)
    val df = spark.range(3)
      .select(expr("graft_rolling_hash(cast(id as string))").as("h"), col("id"))
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen stage
    df.queryExecution.executedPlan.toString should include("*(1) Project [graft_rolling_hash")
    val out = df.orderBy("id").select("h").as[Long].collect()
    out.toSeq shouldBe Seq("0", "1", "2").map(reference)
  }
}
