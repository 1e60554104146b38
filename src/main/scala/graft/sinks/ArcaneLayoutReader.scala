package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.Constants
import graft.ops.ColumnOps

/** Consumer side of the arcane blob layout — what the reference's
  * downstream merge job does with a sink directory (SURVEY.md §2.2:
  * at-least-once append-only part files + COMPLETED token, dedup is
  * the consumer's job via ARCANE_MERGE_KEY):
  *
  *  1. gate on the `{hash}.COMPLETED` token (absent ⇒ the producing
  *     stream failed or was interrupted — output must not be consumed);
  *  2. read every `data/part-*` file (duplicates included);
  *  3. collapse to the latest version per merge key and drop deletes.
  *
  * Makes the library self-sufficient: our sinks' output is consumable
  * without the reference's merge job.
  */
object ArcaneLayoutReader {

  final case class IncompleteOutputException(path: String)
      extends RuntimeException(
        s"no COMPLETED token under $path — producer failed or was interrupted")

  /** True iff some `*.COMPLETED` token exists at the root. */
  def isComplete(spark: SparkSession, targetPath: String): Boolean = {
    val root = new Path(targetPath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(root) &&
      fs.listStatus(root).exists(_.getPath.getName.endsWith(".COMPLETED"))
  }

  /** Raw at-least-once rows (duplicates possible), token-gated. */
  def readRaw(spark: SparkSession, targetPath: String,
      format: String = "parquet"): DataFrame = {
    if (!isComplete(spark, targetPath)) throw IncompleteOutputException(targetPath)
    spark.read.format(format).load(s"$targetPath/data")
  }

  /** Merged view: latest version per ARCANE_MERGE_KEY, deletes applied
    * — the idempotent-consumer contract. Falls back to plain distinct
    * when no CT version column is present (append-only feeds). */
  def readMerged(spark: SparkSession, targetPath: String,
      format: String = "parquet"): DataFrame = {
    val raw = readRaw(spark, targetPath, format)
    val merged =
      if (raw.columns.contains(Constants.ChangeVersionColumn))
        ColumnOps.applyDeletes(
          ColumnOps.latestByKey(raw, Constants.MergeKeyColumn,
            Constants.ChangeVersionColumn))
      else raw.dropDuplicates(Constants.MergeKeyColumn)
    merged
  }
}
