package graft.runtime

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture
import graft.model.ExitCodes

/** Round 20: the two new build knobs at the JOB level.
  * `CORPUS_BUILD_TOKENS=unicode` must produce, through the hosted
  * stage-mode job (DedupState seam included), the bit-identical ledger
  * the in-plan composition produces under `tokensU` — which proves the
  * token layer threads through every hosted seam, not just the
  * in-plan chain. Same for `CORPUS_BUILD_KEEPER=best`. The resume
  * guard must refuse a layer change over crashed-run stage files. */
class JobKnobsSpec extends AnyFlatSpec with Matchers with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  private def d0 = spark.read.parquet(s"$dir/documents.parquet")
    .select("doc_id", "source", "text")
  private def e = spark.read.parquet(s"$dir/embeddings.parquet")
    .select("vec_id", "embedding")

  private def baseEnv(out: String): Map[String, String] = Map(
    "CORPUS_BUILD_DOCS_PATH" -> s"$dir/documents.parquet",
    "CORPUS_BUILD_EMBEDDINGS_PATH" -> s"$dir/embeddings.parquet",
    "CORPUS_BUILD_OUTPUT_PATH" -> out)

  private def ledgerRows(path: String): Array[String] = {
    val df = spark.read.parquet(path)
    val cols = df.columns.sorted.map(col)
    df.select(cols: _*).collect().map(_.toString).sorted
  }

  private def planRows(df: org.apache.spark.sql.DataFrame): Array[String] = {
    val d = df.drop("text")
    val cols = d.columns.sorted.map(col)
    d.select(cols: _*).collect().map(_.toString).sorted
  }

  behavior of "CORPUS_BUILD_TOKENS"

  it should "build the unicode-layer ledger through the hosted job, DedupState seam included" in {
    val out = tempDir("job-tokens-uni")
    CorpusBuildJob.run(spark,
      baseEnv(out) + ("CORPUS_BUILD_TOKENS" -> "unicode"),
      _ => ()) shouldBe ExitCodes.Success
    val expected = graft.ext.ExtQueries.corpusBuildLedger(d0, e,
      tok = graft.ext.TextOps.tokensU)
    ledgerRows(s"$out/ledger") shouldBe planRows(expected)
  }

  it should "refuse to resume stage files built under a different token layer" in {
    val out = tempDir("job-tokens-resume")
    CorpusBuildJob.run(spark, baseEnv(out), _ => ()) shouldBe ExitCodes.Success
    val statuses = scala.collection.mutable.ArrayBuffer.empty[String]
    CorpusBuildJob.run(spark,
      baseEnv(out) ++ Map("CORPUS_BUILD_RESUME" -> "true",
        "CORPUS_BUILD_TOKENS" -> "unicode"),
      statuses += _) shouldBe ExitCodes.Fatal
    statuses.exists(_.contains("build configuration changed")) shouldBe true
  }

  it should "exit Fatal on a bogus value" in {
    val out = tempDir("job-tokens-bogus")
    CorpusBuildJob.run(spark,
      baseEnv(out) + ("CORPUS_BUILD_TOKENS" -> "utf8"),
      _ => ()) shouldBe ExitCodes.Fatal
  }

  behavior of "CORPUS_BUILD_KEEPER"

  it should "elect best keepers through the hosted job, DedupState seam included" in {
    val out = tempDir("job-keeper-best")
    CorpusBuildJob.run(spark,
      baseEnv(out) + ("CORPUS_BUILD_KEEPER" -> "best"),
      _ => ()) shouldBe ExitCodes.Success
    val expected = graft.ext.ExtQueries.corpusBuildLedger(d0, e,
      keeperMode = "best")
    ledgerRows(s"$out/ledger") shouldBe planRows(expected)
  }

  it should "exit Fatal on a bogus value" in {
    val out = tempDir("job-keeper-bogus")
    CorpusBuildJob.run(spark,
      baseEnv(out) + ("CORPUS_BUILD_KEEPER" -> "richest"),
      _ => ()) shouldBe ExitCodes.Fatal
  }
}
