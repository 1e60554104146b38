package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** DedupState's equality contract at the unit level (the job-level
  * proofs live in CorpusBuildJobSpec): the persisted-state full build
  * decides bit-identically to the in-plan `dedupDecision` composition,
  * and an incremental run with NOTHING reusable degenerates to the
  * full arithmetic. */
class DedupStateSpec extends AnyFlatSpec with Matchers with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  private def fixture = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") >= 20)
      .select("doc_id", "source", "text")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
      .join(d.select(col("doc_id").as("vec_id")), Seq("vec_id"))
    (d, e)
  }

  behavior of "DedupState"

  it should "decide bit-identically to the in-plan dedupDecision composition" in {
    val (d, e) = fixture
    val expected = ExtQueries.dedupDecision(d.select("doc_id", "text"), e)
      .collect().map(_.toString).sorted
    val state = tempDir("dedupstate-full")
    val got = DedupState.full(spark, d, e, state)
      .collect().map(_.toString).sorted
    got shouldBe expected
    // and the state tables landed with their markers
    Seq("sig", "near_pairs", "centroids", "sem_asg", "sem_pairs").foreach { t =>
      withClue(t) {
        new java.io.File(s"$state/$t/_SUCCESS").exists() shouldBe true
      }
    }
  }

  it should "degenerate to the full arithmetic when no source is reusable" in {
    val (d, e) = fixture
    val prior = tempDir("dedupstate-prior")
    DedupState.full(spark, d, e, prior)
    val expected = ExtQueries
      .dedupDecision(d.select("doc_id", "text"), e,
        semCents = Some(spark.read.parquet(s"$prior/centroids")))
      .collect().map(_.toString).sorted
    // empty unchanged set: every doc recomputes, prior pairs unusable,
    // quantizer carried — must equal the same-quantizer full recompute
    val got = DedupState.incremental(spark, d, e, prior,
        unchangedSources = Seq.empty, stateRoot = tempDir("dedupstate-incr0"))
      .collect().map(_.toString).sorted
    got shouldBe expected
  }

  it should "refuse a prior root without state tables" in {
    val (d, e) = fixture
    val err = intercept[IllegalArgumentException] {
      DedupState.incremental(spark, d, e, tempDir("dedupstate-empty"),
        unchangedSources = Seq("src4"), stateRoot = tempDir("dedupstate-out"))
    }
    err.getMessage should include("dedup_state")
  }
}
