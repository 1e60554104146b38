package graft.runtime

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.model.ExitCodes

/** HOSTED CORPUS-BUILD JOB (round 14): the end-to-end training-data
  * build as ONE operational entry point — the batch sibling of
  * [[RetractionJob]], hosted under the same env-contract/exit-code
  * discipline as [[GraftMain]]'s stream kinds. One run takes a raw
  * document corpus (plus its embeddings) through the full proven
  * chain — unicode/mojibake normalize → html extract → rule quality
  * gate → three-tier dedup decision (exact/near/semantic) → benchmark
  * decontamination → mixture sampling → sequence packing →
  * reproducible shard shuffle → per-source manifest — and lands three
  * artifacts under the output root:
  *
  *  - `ledger/`  one row per corpus doc: the stage verdict that
  *    removed it (`drop_quality` / `drop_exact` / `drop_near` /
  *    `drop_semantic` / `drop_contaminated` / `drop_mix`) or its
  *    packing stats, (shard, pos) placement and source-manifest
  *    columns when kept — the audit trail a takedown or re-run diffs
  *    against;
  *  - `corpus/`  the kept slice WITH text, hive-partitioned by
  *    `shard` and written in (shard, pos) order — the layout a
  *    training loader consumes directly;
  *  - `manifest/` one row per source: doc/char counts and the
  *    order-insensitive `content_version` hash.
  *
  * The chain is [[graft.ext.ExtQueries.corpusBuildLedger]] — the
  * exact composition the `pipeline_corpus_build` CORRECTNESS entry
  * hashes against DuckDB — with the job's phase hook threaded in:
  * each stage is eagerly materialized (`localCheckpoint`), timed and
  * counted, yielding the per-phase operator ledger and truncating
  * lineage so the three final writes reuse stage results instead of
  * recomputing the decision chain. Stage plans are unchanged from
  * their standalone proven forms (bucketed LSH/IVF candidates,
  * per-source/per-shard windows, broadcast benchmark shingles), so
  * the 100 TB scale posture is inherited, not re-derived.
  *
  * The output root is guarded by the single-writer lease
  * ([[graft.ext.StoreMeta.withWriterLease]]): a concurrent build or
  * maintenance pass against the same root refuses instead of
  * interleaving writes. Re-running after a crash is safe — every
  * write is an idempotent overwrite under a fresh lease epoch.
  *
  * Environment contract (mirrors [[RetractionJob]]):
  * {{{
  *   CORPUS_BUILD_DOCS_PATH        required  parquet doc corpus
  *   CORPUS_BUILD_EMBEDDINGS_PATH  required  parquet embeddings
  *   CORPUS_BUILD_OUTPUT_PATH      required  output root (leased)
  *   CORPUS_BUILD_ID_COLUMN / _SOURCE_COLUMN / _TEXT_COLUMN
  *                                 optional  (doc_id / source / text)
  *   CORPUS_BUILD_EMBEDDING_ID_COLUMN / _EMBEDDING_COLUMN
  *                                 optional  (vec_id / embedding)
  * }}}
  * Exit code 0 on success, 1 (Fatal) on misconfiguration or failure. */
object CorpusBuildJob {

  final case class Phase(name: String, rows: Long, millis: Long)

  final case class Report(total: Long, kept: Long,
      verdicts: Map[String, Long], phases: Seq[Phase])

  def execute(spark: SparkSession, env: Map[String, String],
      status: String => Unit = s => System.err.println(s"[corpus-build] $s")): Report = {
    def req(k: String): String = env.getOrElse(k,
      throw new IllegalArgumentException(s"env '$k' is required"))
    val out = req("CORPUS_BUILD_OUTPUT_PATH")
    val d0 = spark.read.parquet(req("CORPUS_BUILD_DOCS_PATH")).select(
      col(env.getOrElse("CORPUS_BUILD_ID_COLUMN", "doc_id")).cast("long").as("doc_id"),
      col(env.getOrElse("CORPUS_BUILD_SOURCE_COLUMN", "source")).as("source"),
      col(env.getOrElse("CORPUS_BUILD_TEXT_COLUMN", "text")).as("text"))
    val e = spark.read.parquet(req("CORPUS_BUILD_EMBEDDINGS_PATH")).select(
      col(env.getOrElse("CORPUS_BUILD_EMBEDDING_ID_COLUMN", "vec_id")).cast("long").as("vec_id"),
      col(env.getOrElse("CORPUS_BUILD_EMBEDDING_COLUMN", "embedding")).as("embedding"))

    val phases = ArrayBuffer.empty[Phase]
    def timed(name: String, df: DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      val mat = df.localCheckpoint(true)
      val n = mat.count()
      val ms = (System.nanoTime() - t0) / 1000000L
      phases += Phase(name, n, ms)
      status(s"phase $name: $n rows in $ms ms")
      mat
    }

    graft.ext.StoreMeta.withWriterLease(spark, out, "corpus-build") {
      val ledger = timed("ledger",
        graft.ext.ExtQueries.corpusBuildLedger(d0, e, timed))
      val kept = ledger.filter(col("verdict") === "keep")

      val t0 = System.nanoTime()
      ledger.drop("text").write.mode("overwrite").parquet(s"$out/ledger")
      // the training layout: one hive partition per shard, rows in
      // shuffle (pos) order so a loader streams each shard sequentially
      kept.select("doc_id", "source", "text", "n_tokens",
          "n_chunks", "seq_first", "shard", "pos")
        .repartition(col("shard")).sortWithinPartitions("shard", "pos")
        .write.mode("overwrite").partitionBy("shard").parquet(s"$out/corpus")
      kept.select("source", "m_docs", "m_chars", "content_version")
        .distinct()
        .write.mode("overwrite").parquet(s"$out/manifest")
      phases += Phase("write_outputs", 0L, (System.nanoTime() - t0) / 1000000L)
      status(s"phase write_outputs: done in ${phases.last.millis} ms")

      val verdicts = ledger.groupBy("verdict").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val report = Report(verdicts.valuesIterator.sum,
        verdicts.getOrElse("keep", 0L), verdicts, phases.toSeq)
      status(s"built: ${report.kept}/${report.total} docs kept " +
        s"(${report.verdicts.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(", ")})")
      report
    }
  }

  /** Testable wrapper: exit code instead of an exception. */
  def run(spark: SparkSession, env: Map[String, String],
      status: String => Unit = s => System.err.println(s"[corpus-build] $s")): Int =
    try { execute(spark, env, status); ExitCodes.Success }
    catch {
      case e: Throwable =>
        status(s"fatal: ${e.getClass.getSimpleName}: ${e.getMessage}")
        ExitCodes.Fatal
    }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-corpus-build",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt).getOrCreate()
    val code = run(spark, sys.env)
    spark.stop()
    sys.exit(code)
  }
}
