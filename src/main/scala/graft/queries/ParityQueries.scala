package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.ColumnOps
import QueryKit._

/** Queries exercising the reference-parity operators (SURVEY.md §2.3,
  * §2.6): merge-key projection, date-partition projection, CDM
  * change-feed normalization, and the CDC "latest version per key"
  * merge view. Each has a DuckDB oracle.
  */
object ParityQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Merge-key projection over lineitem's composite PK. Oracle uses the
    * UTF-8 encoding variant (DuckDB sha256 hashes UTF-8); the
    * reference-compatible UTF-16LE variant is covered by the golden-value
    * ScalaTest. */
  def mergeKey(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        ColumnOps.mergeKeyExpr(Seq("l_orderkey", "l_linenumber"), "UTF-8")
          .as("ARCANE_MERGE_KEY"))
      .orderBy("l_orderkey", "l_linenumber")

  val mergeKeySql: String =
    """SELECT l_orderkey, l_linenumber,
      |  sha256(concat_ws('#', CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR))) AS ARCANE_MERGE_KEY
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Date-partition projection (reference pushes `format(getdate(),'yyyyMM')`
    * into T-SQL; we evaluate the expression on executors). */
  def datePartition(spark: SparkSession, dir: String): DataFrame =
    ColumnOps.withDatePartition(
        table(spark, dir, "orders").select("o_orderkey", "o_orderdate"),
        "date_format(o_orderdate, 'yyyyMM')")
      .orderBy("o_orderkey")

  val datePartitionSql: String =
    """SELECT o_orderkey, o_orderdate,
      |  strftime(o_orderdate, '%Y%m') AS DATE_PARTITION_KEY
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** CDM backfill normalization applied to the events table: inject the
    * constant change-feed columns, copy the key to ARCANE_MERGE_KEY,
    * reorder. Pure projection — collapses into the scan. */
  def cdmNormalize(spark: SparkSession, dir: String): DataFrame = {
    // events.props stands in for the base entity's LSN column so the
    // rename path (LSN → Start_LSN) is exercised end-to-end.
    val base = ColumnOps.withMergeKeyFrom(
      table(spark, dir, "events").withColumnRenamed("props", "LSN"), "event_id")
    ColumnOps.cdmBackfillNormalize(base,
        Seq("Start_LSN", "End_LSN", "DML_Action", "Seq_Val", "Update_Mask",
          "event_id", "event_type", "user_id", "ARCANE_MERGE_KEY"))
      .orderBy("event_id")
  }

  val cdmNormalizeSql: String =
    """SELECT props AS Start_LSN, '' AS End_LSN, 'INSERT' AS DML_Action,
      |  '' AS Seq_Val, '' AS Update_Mask,
      |  event_id, event_type, user_id,
      |  CAST(event_id AS VARCHAR) AS ARCANE_MERGE_KEY
      |FROM events ORDER BY event_id""".stripMargin

  /** CDC merge view: latest event per user (row_number over key, version
    * desc). This is what a consumer of the at-least-once sink layout
    * computes to apply upserts; one shuffle on the merge key. */
  def latestByKey(spark: SparkSession, dir: String): DataFrame =
    ColumnOps.latestByKey(table(spark, dir, "events"),
        keyColumn = "user_id", versionColumn = "ts",
        tieBreakers = Seq("event_id"))
      .select("user_id", "event_id", "event_type", "value")
      .orderBy("user_id")

  val latestByKeySql: String =
    """SELECT user_id, event_id, event_type, value FROM (
      |  SELECT user_id, event_id, event_type, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** Deletes applied after a CDC merge: drop operation='D' rows.
    * Emulated on events by treating event_type='click' as deletes. */
  def applyDeletes(spark: SparkSession, dir: String): DataFrame =
    ColumnOps.applyDeletes(
        table(spark, dir, "events").withColumnRenamed("event_type", "SYS_CHANGE_OPERATION")
          .withColumn("SYS_CHANGE_OPERATION",
            when(col("SYS_CHANGE_OPERATION") === "click", "D")
              .otherwise(col("SYS_CHANGE_OPERATION"))))
      .select("event_id", "user_id", "SYS_CHANGE_OPERATION")
      .orderBy("event_id")

  val applyDeletesSql: String =
    """SELECT event_id, user_id,
      |  CASE WHEN event_type = 'click' THEN 'D' ELSE event_type END AS SYS_CHANGE_OPERATION
      |FROM events WHERE event_type <> 'click' ORDER BY event_id""".stripMargin

  /** SCD type-2 history view over the events-as-CDC stream: each
    * user's events become versioned rows with [valid_from, valid_to)
    * intervals and an is_current flag ([[ColumnOps.scd2]]) — the
    * history-preserving sibling of [[latestByKey]]'s latest-only merge. */
  def scd2History(spark: SparkSession, dir: String): DataFrame =
    ColumnOps.scd2(table(spark, dir, "events"),
        keyColumn = "user_id", versionColumn = tsMicros("ts"),
        tieBreakers = Seq("event_id"))
      .select("user_id", "event_id", "event_type",
        "valid_from", "valid_to", "is_current")
      .orderBy("event_id")

  val scd2HistorySql: String =
    """SELECT user_id, event_id, event_type,
      |  make_timestamp(epoch_ns(ts) // 1000) AS valid_from,
      |  lead(make_timestamp(epoch_ns(ts) // 1000)) OVER
      |    (PARTITION BY user_id ORDER BY make_timestamp(epoch_ns(ts) // 1000), event_id)
      |    AS valid_to,
      |  (CASE WHEN lead(ts) OVER
      |    (PARTITION BY user_id ORDER BY make_timestamp(epoch_ns(ts) // 1000), event_id)
      |    IS NULL THEN 1 ELSE 0 END)::BIGINT AS is_current
      |FROM events ORDER BY event_id""".stripMargin

  /** Full-table snapshot source projection (reference S1: SELECT * poll). */
  def snapshot(spark: SparkSession, dir: String): DataFrame =
    ColumnOps.withFullLoadChangeColumns(
        table(spark, dir, "customer"), currentVersion = 0L)
      .orderBy("c_custkey")

  val snapshotSql: String =
    """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
      |  CAST(0 AS BIGINT) AS SYS_CHANGE_VERSION, 'I' AS SYS_CHANGE_OPERATION,
      |  CAST(0 AS BIGINT) AS ChangeTrackingVersion
      |FROM customer ORDER BY c_custkey""".stripMargin

  val queries: Map[String, Q] = Map(
    "parity_merge_key" -> mergeKey,
    "parity_date_partition" -> datePartition,
    "parity_cdm_normalize" -> cdmNormalize,
    "parity_latest_by_key" -> latestByKey,
    "parity_apply_deletes" -> applyDeletes,
    "parity_scd2" -> scd2History,
    "parity_snapshot" -> snapshot)

  val oracles: Map[String, String] = Map(
    "parity_merge_key" -> mergeKeySql,
    "parity_date_partition" -> datePartitionSql,
    "parity_cdm_normalize" -> cdmNormalizeSql,
    "parity_latest_by_key" -> latestByKeySql,
    "parity_apply_deletes" -> applyDeletesSql,
    "parity_scd2" -> scd2HistorySql,
    "parity_snapshot" -> snapshotSql)
}
