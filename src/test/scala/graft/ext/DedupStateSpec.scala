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

  // ----------------------------------------------------------------
  // round 18 (VERDICT r17 #2): the quantizer-drift gate — encode-only
  // reuse is valid until the geometry goes stale; a cell that lost a
  // majority of its trained membership trips an automatic escalation
  // to the full-retrain semantic tier
  // ----------------------------------------------------------------

  it should "stay incremental under a sub-majority edit and escalate to a full retrain past the majority trip-wire" in {
    val (d, e) = fixture
    val allSources = d.select("source").distinct()
      .collect().map(_.getString(0)).toSeq
    val prior = tempDir("dedupstate-drift-prior")
    DedupState.full(spark, d, e, prior)
    val asg = spark.read.parquet(s"$prior/sem_asg")
    val biggest = asg.groupBy("cell").count()
      .orderBy(col("count").desc, col("cell")).head()
    val (cell, n) = (biggest.getLong(0), biggest.getLong(1))
    val members = asg.filter(col("cell") === cell)
      .select("vec_id").orderBy("vec_id").collect().map(_.getLong(0))
    n.toInt shouldBe members.length

    // SUB-MAJORITY: remove strictly less than half the cell's vectors
    // from the embedded set — the gate must NOT trip, and the result
    // must equal the encode-only (driftPolicy=off) path
    val subCut = members.take((n.toInt - 1) / 2)
    val eSub = e.filter(!col("vec_id").isin(subCut: _*))
    val msgsSub = scala.collection.mutable.ArrayBuffer.empty[String]
    val gotSubAuto = DedupState.incremental(spark, d, eSub, prior,
        unchangedSources = allSources,
        stateRoot = tempDir("dedupstate-drift-sub-auto"),
        status = msgsSub += _)
      .collect().map(_.toString).sorted
    msgsSub.exists(_.contains("quantizer drift")) shouldBe false
    val gotSubOff = DedupState.incremental(spark, d, eSub, prior,
        unchangedSources = allSources,
        stateRoot = tempDir("dedupstate-drift-sub-off"),
        driftPolicy = "off")
      .collect().map(_.toString).sorted
    gotSubAuto shouldBe gotSubOff

    // MAJORITY: remove over half — the gate must trip, the tier must
    // retrain, and the ledger must equal a PLAIN FULL REBUILD's (the
    // r17 documented divergence self-heals)
    val majCut = members.take(n.toInt / 2 + 1)
    val eMaj = e.filter(!col("vec_id").isin(majCut: _*))
    val expectedFull = DedupState.full(spark, d, eMaj,
        tempDir("dedupstate-drift-fullref"))
      .collect().map(_.toString).sorted
    val msgsMaj = scala.collection.mutable.ArrayBuffer.empty[String]
    val majRoot = tempDir("dedupstate-drift-maj")
    val gotMaj = DedupState.incremental(spark, d, eMaj, prior,
        unchangedSources = allSources,
        stateRoot = majRoot, status = msgsMaj += _)
      .collect().map(_.toString).sorted
    msgsMaj.exists(_.contains("quantizer drift")) shouldBe true
    gotMaj shouldBe expectedFull

    // and the escalated state root carries the RETRAINED quantizer,
    // not the prior one (the next build inherits healthy geometry)
    val priorCents = spark.read.parquet(s"$prior/centroids")
      .collect().map(_.toString).sorted
    val escCents = spark.read.parquet(s"$majRoot/centroids")
      .collect().map(_.toString).sorted
    escCents should not be priorCents
  }

  it should "refuse a prior state that overlaps the output root (ADVICE r17)" in {
    val (d, e) = fixture
    val root = tempDir("dedupstate-overlap")
    val err = intercept[IllegalArgumentException] {
      DedupState.incremental(spark, d, e, root,
        unchangedSources = Seq.empty, stateRoot = root)
    }
    err.getMessage should include("must not overlap")
    val err2 = intercept[IllegalArgumentException] {
      DedupState.incremental(spark, d, e, s"$root/dedup_state", Seq.empty, root)
    }
    err2.getMessage should include("must not overlap")
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
