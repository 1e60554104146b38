package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Constants

/** Row-shaping operations shared by every source — the engine's
  * equivalent of the reference's generated T-SQL projections
  * (SURVEY.md §2.3). All are plain `DataFrame => DataFrame` transforms:
  * narrow, codegen-friendly, no shuffle, safe at any scale.
  */
object ColumnOps {

  /** Deterministic merge key: lowercase-hex SHA-256 of the '#'-joined
    * primary-key values.
    *
    * With the default UTF-16LE encoding this is byte-for-byte compatible
    * with the reference's T-SQL `lower(convert(nvarchar(128),
    * HashBytes('SHA2_256', cast(pk1 as nvarchar(128)) + '#' + ...), 2))`
    * — nvarchar is UTF-16LE on the wire
    * (reference: src/Sources/SqlServer/SqlSnippets/GetSelectAllQuery.sql:6,
    * builder SqlServerChangeTrackingSource.cs:312-319). Golden value: a
    * single PK "88888" hashes to
    * cc2b36e9f63cdbf5baa90d8eeb0d8edfae3017b137ff2c94ef9d9436bac760f0.
    *
    * Computed on executors rather than pushed into the source database —
    * same result, no OLTP load (SURVEY.md §4). `sha2` already yields
    * lowercase hex.
    */
  def mergeKeyExpr(pkColumns: Seq[String], encoding: String = "UTF-16LE"): Column = {
    val joined = concat_ws("#", pkColumns.map(c => col(c).cast("string")): _*)
    val bytes = if (encoding == "UTF-8") joined.cast("binary") else encode(joined, encoding)
    sha2(bytes, 256)
  }

  def withMergeKey(df: DataFrame, pkColumns: Seq[String],
      encoding: String = "UTF-16LE"): DataFrame =
    df.withColumn(Constants.MergeKeyColumn, mergeKeyExpr(pkColumns, encoding))

  /** Merge key copied verbatim from an existing key column — the CDM
    * path, where RECID is already a stable surrogate key
    * (reference: CdmChangeFeedSource.cs:266-272). */
  def withMergeKeyFrom(df: DataFrame, keyColumn: String): DataFrame =
    df.withColumn(Constants.MergeKeyColumn, col(keyColumn).cast("string"))

  /** Arbitrary SQL expression as the date-partition column
    * (reference: SqlSnippets/GetSelectAllQuery_date_partitioned.sql:7;
    * e.g. `date_format(o_orderdate, 'yyyyMM')`). */
  def withDatePartition(df: DataFrame, partitionExpression: String): DataFrame =
    df.withColumn(Constants.DatePartitionKeyColumn,
      expr(partitionExpression).cast("string"))

  /** Normalize a CDM *base-entity* (backfill) frame to change-feed shape
    * (reference: CdmChangeFeedSource.cs:243-264):
    * rename LSN→Start_LSN, drop _SysRowId, inject the four constant
    * change-feed columns, reorder to the feed schema's column order.
    * A pure projection — Catalyst collapses it into the scan.
    */
  def cdmBackfillNormalize(df: DataFrame, feedColumnOrder: Seq[String]): DataFrame = {
    var out = df
    if (out.columns.contains("LSN")) out = out.withColumnRenamed("LSN", "Start_LSN")
    if (out.columns.contains("_SysRowId")) out = out.drop("_SysRowId")
    val injected = Map(
      "End_LSN" -> lit(""),
      "DML_Action" -> lit("INSERT"),
      "Seq_Val" -> lit(""),
      "Update_Mask" -> lit(""))
    injected.foreach { case (name, value) =>
      if (!out.columns.contains(name)) out = out.withColumn(name, value)
    }
    out.select(feedColumnOrder.map(col): _*)
  }

  /** Full-load constants for the change-tracking shape: version 0,
    * operation 'I' (reference:
    * SqlServerChangeTrackingSource.cs:337-349). */
  def withFullLoadChangeColumns(df: DataFrame, currentVersion: Long): DataFrame =
    df.withColumn(Constants.ChangeVersionColumn, lit(0L))
      .withColumn(Constants.ChangeOperationColumn, lit("I"))
      .withColumn(Constants.ChangeTrackingVersionColumn, lit(currentVersion))

  /** CDC merge: keep the latest version of each key. This is the
    * downstream consumer's view of the at-least-once, append-only sink
    * output (SURVEY.md §2.6): row_number over (partition by mergeKey
    * order by version desc) = 1. One shuffle on the merge key; at 100 TB
    * use it after partition pruning on DATE_PARTITION_KEY.
    *
    * @param tieBreakers additional descending order columns for
    *        deterministic choice when versions tie
    */
  def latestByKey(
      df: DataFrame,
      keyColumn: String,
      versionColumn: String,
      tieBreakers: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyColumn))
      .orderBy((versionColumn +: tieBreakers).map(col(_).desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Slowly-changing-dimension type-2 view over a CDC change stream:
    * every version of a key becomes a row with a validity interval —
    * `valid_from` = its own version timestamp, `valid_to` = the NEXT
    * version's timestamp (null while current), `is_current` = 1 on the
    * open interval. The standard downstream materialization of the
    * at-least-once CDC layout when consumers need history, where
    * [[latestByKey]] is the materialization when they need only the
    * present. One shuffle on the key; `lead` and the interval columns
    * are computed inside a single window over (version, tieBreakers) —
    * made total by the tie-breakers, so interval bounds are
    * deterministic under duplicate version values. */
  def scd2(
      df: DataFrame,
      keyColumn: String,
      versionColumn: org.apache.spark.sql.Column,
      tieBreakers: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyColumn))
      .orderBy(versionColumn.asc +: tieBreakers.map(col(_).asc): _*)
    df.withColumn("valid_from", versionColumn)
      .withColumn("valid_to", lead(versionColumn, 1).over(w))
      .withColumn("is_current",
        when(col("valid_to").isNull, 1L).otherwise(0L))
  }

  /** Event-time as-of join: for each left row, the single right row
    * with the greatest `rightTime` ≤ `leftTime` for the same key (the
    * enrich-events-with-latest-dimension-state pattern a CDC consumer
    * runs constantly). Composed from built-ins — hash join on the key,
    * then a windowed argmax per left row — per the extension
    * preference order (compose before custom plans, SURVEY §2.9/§4):
    * Catalyst keeps the key join shuffled/broadcast as appropriate and
    * the inequality as a cheap post-join filter. Left rows with no
    * match survive with null right columns.
    *
    * @param uniqueLeftId    a unique left column (window partition key)
    * @param rightTieBreakers extra descending sort columns for a
    *        deterministic pick when right times tie
    */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      uniqueLeftId: String,
      rightTieBreakers: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = left.join(right,
      col(leftKey) === col(rightKey) && col(rightTime) <= col(leftTime), "left")
    val w = Window.partitionBy(col(uniqueLeftId))
      .orderBy(col(rightTime).desc +: rightTieBreakers.map(col(_).desc): _*)
    joined.withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1)
      .drop("__asof_rn")
  }

  /** Drop rows marked deleted after a CDC merge (operation 'D'). */
  def applyDeletes(df: DataFrame,
      operationColumn: String = Constants.ChangeOperationColumn): DataFrame =
    df.filter(col(operationColumn) =!= "D")

}
