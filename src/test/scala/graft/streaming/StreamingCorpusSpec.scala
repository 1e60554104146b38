package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture
import graft.ext.TextOps
import graft.sinks.{ArcaneLayoutReader, ArcaneParquetSink, SinkConfig}

/** The LLM-corpus cleaning operators composed WITH the ingestion
  * runtime: documents arrive as a file stream, are quality-gated and
  * exact-deduplicated in flight (all narrow + stateful built-ins — the
  * same expressions the batch `pipeline_corpus_clean` uses), and land
  * in the arcane sink layout with schema/token publication. This is
  * the shape a 100 TB continuous-crawl pipeline runs: cleaning happens
  * on the way IN, not as an after-the-fact batch rewrite. */
class StreamingCorpusSpec extends AnyFlatSpec with Matchers with SparkFixture {

  behavior of "streaming corpus cleaning into the arcane layout"

  it should "quality-gate, dedup, and land documents with the layout contract" in {
    import spark.implicits._
    val srcDir = tempDir("stream-corpus-src")

    // corpus with planted exact duplicates and low-quality rows
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again today"),
      (1L, "pack my box with five dozen liquor jugs before the long trip home"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"), // dup of 0
      (3L, "tiny"), // fails the min-token quality gate
      (4L, "every good boy deserves fudge while the orchestra tunes up slowly"))
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(srcDir)

    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .parquet(srcDir)
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("n_tokens",
        org.apache.spark.sql.functions.size(col("toks")).cast("long"))
      // quality gate: the pipeline_corpus_clean expressions, streaming
      .filter(col("n_tokens").between(10, 5000))
      .withColumn("content_hash", sha2(concat_ws(" ", col("toks")), 256))
      // exact dedup in flight: first occurrence per content hash
      .dropDuplicates("content_hash")
      .select("doc_id", "n_tokens", "content_hash")

    val target = tempDir("stream-corpus-sink")
    val sink = new ArcaneParquetSink(SinkConfig(target))
    val q = sink.start(stream, tempDir("stream-corpus-ckpt"), Trigger.AvailableNow())
    try q.awaitTermination(60000) shouldBe true
    finally q.stop()
    sink.complete(stream)

    // layout contract: schema + completion token published
    ArcaneLayoutReader.isComplete(spark, target) shouldBe true
    val out = ArcaneLayoutReader.readRaw(spark, target)
      .select("doc_id").as[Long].collect().sorted

    // doc 3 failed quality; exactly one of {0, 2} survived the dedup
    out.length shouldBe 3
    out should contain allOf (1L, 4L)
    Seq(0L, 2L).count(out.contains) shouldBe 1
  }
}
