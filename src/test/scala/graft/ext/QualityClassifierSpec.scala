package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** The composite quality gate (VERDICT r12 #7): the closed-form
  * diagonal-LDA fit must SEPARATE — planted junk ranks below clean
  * docs — and compose ahead of the sampling stage as the keep/drop
  * filter. Exact oracle equality (features, weights, scores) is the
  * `text_quality_classifier` CORRECTNESS entry; these specs pin the
  * classifier's BEHAVIOR. */
class QualityClassifierSpec extends AnyFlatSpec with Matchers with SparkFixture {

  behavior of "QualityClassifier"

  private def scoredFrame() =
    ExtQueries.textQualityClassifier(spark, "/root/testdata/sf0.001")

  it should "rank planted junk below clean docs and separate the classes at 0" in {
    val out = scoredFrame().select("doc_id", "label", "score_e6", "keep")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val clean = out.filter(_._2 == 1L)
    val junk = out.filter(_._2 == 0L)
    clean.length should be > 10
    junk.length should be > 5
    // mean separation is structural for LDA (E[score|keep] −
    // E[score|drop] = Σ Δmean²/var ≥ 0); the MARGIN is the empirical
    // claim: classes sit on opposite sides of the 0 threshold
    val mClean = clean.map(_._3).sum.toDouble / clean.length
    val mJunk = junk.map(_._3).sum.toDouble / junk.length
    mClean should be > 0.0
    mJunk should be < 0.0
    // keep/drop accuracy: ≥ 90% of clean kept, ≤ 10% of junk kept
    clean.count(_._4 == 1L).toDouble / clean.length should be >= 0.9
    junk.count(_._4 == 1L).toDouble / junk.length should be <= 0.1
    // both junk families are caught — repetition (+7e6 ids) and
    // gibberish (+8e6 ids) fail for DIFFERENT feature reasons, and a
    // single-feature scorer would miss one of them
    val rep = junk.filter(r => r._1 >= 7000000L && r._1 < 8000000L)
    val rev = junk.filter(_._1 >= 8000000L)
    rep.length should be > 0
    rev.length should be > 0
    rep.count(_._4 == 0L).toDouble / rep.length should be >= 0.9
    rev.count(_._4 == 0L).toDouble / rev.length should be >= 0.9
  }

  it should "compose ahead of sampling: the gate drops junk before pipelineSampleMix's selection" in {
    // the pipeline shape: score → filter keep = 1 → sample/mix. The
    // gated frame must contain (nearly) only label-1 docs, and every
    // clean doc the gate dropped is a bounded false-negative tail
    val gated = scoredFrame().filter(col("keep") === 1L)
    val byLabel = gated.groupBy("label").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val junkThrough = byLabel.getOrElse(0L, 0L)
    val cleanThrough = byLabel.getOrElse(1L, 0L)
    cleanThrough should be > 10L
    junkThrough.toDouble / (junkThrough + cleanThrough) should be <= 0.05
  }

  it should "score bit-identically through the streaming shape and the batch features() pass" in {
    // VERDICT r14 #5: the streaming deployment computes x1..x4 map-only
    // (withLocalFeatures) and x5 from the BROADCAST LM tables
    // (withLmFeature); the batch classifier computes the same five via
    // grouped passes inside features(). Same docs, same LM corpus →
    // the per-doc feature vectors and e6 scores must be IDENTICAL (not
    // approximately — the score is a pinned IEEE tree over integer
    // features), or a doc could pass the stream gate and fail batch.
    val stop = TextOps.LangMarkers.head._2
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val src = d.withColumn("__t", TextOps.tokens(col("text")))
      .filter(org.apache.spark.sql.functions.size(col("__t")) >= 3).drop("__t")
    val labeled = src.withColumn("label",
      when(pmod(col("doc_id"), lit(2)) === 0, lit(1L)).otherwise(lit(0L)))

    val batchFeats = QualityClassifier
      .features(labeled, src, "doc_id", "text", stop)
      .select((Seq("doc_id", "label") ++ QualityClassifier.FeatureCols).map(col): _*)

    val lm = QualityClassifier.trainLm(src, "doc_id", "text")
    val base = QualityClassifier
      .withLocalFeatures(labeled, "text", stop, 3)
      .filter(col("__q_has"))
    val streamFeats = base.join(
      QualityClassifier.withLmFeature(base, "doc_id", "__toks", lm,
        broadcastLm = true),
      Seq("doc_id"))
      .select((Seq("doc_id", "label") ++ QualityClassifier.FeatureCols).map(col): _*)

    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        QualityClassifier.FeatureCols.map(c => r.getAs[Long](c))).toMap
    val bm = collect(batchFeats)
    val sm = collect(streamFeats)
    bm.size should be > 20
    sm should equal(bm)

    // and the scores from one shared fit are equal long-for-long
    val fits = QualityClassifier.fit(batchFeats, "label")
    def scores(df: org.apache.spark.sql.DataFrame) =
      QualityClassifier.score(df, fits)
        .select("doc_id", "score_e6")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    scores(streamFeats) should equal(scores(batchFeats))
  }
}
