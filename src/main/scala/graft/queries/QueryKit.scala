package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the declared query inventory.
  *
  * Every query here exists twice — once as a Spark plan, once as ANSI
  * SQL for the DuckDB oracle — and the two must match hash-for-hash on
  * the driver's compare. Two rules keep that true:
  *
  *   1. Aggregates over doubles go through exact decimal arithmetic and
  *      are cast back to double at the end ([[decSum]]): floating-point
  *      summation order differs between Spark's partial aggregation and
  *      DuckDB, but decimal sums are exact on both engines.
  *   2. Every query ends in a total ORDER BY over a deterministic,
  *      duplicate-free key prefix, mirrored in the oracle SQL.
  */
object QueryKit {
  /** `spark.read.parquet` over one driver-generated table.
    *
    * The events table's `ts` has been generated two ways across driver
    * rounds — TIMESTAMP(NANOS), which Spark's Parquet reader rejects
    * unless `nanosAsLong` surfaces it as epoch-nanos LongType, and
    * plain TIMESTAMP(MICROS), which arrives as TIMESTAMP_NTZ. Every
    * consumer (and every DuckDB oracle, via `epoch_ns(ts)`) is written
    * against the epoch-nanos-long shape, so both generations normalize
    * to it here: the session runs in UTC ([[graft.runtime.GraftSession]]),
    * making the NTZ→instant cast the same identity DuckDB applies to a
    * naive timestamp. The conf flip is scoped to the one table that
    * needs it instead of mutating the shared session on every call. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events" &&
        !spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType != org.apache.spark.sql.types.LongType)
      df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
    else df
  }

  /** Epoch-nanos long column → TimestampType (microsecond floor).
    * Integral `div` — `/` on longs is double division, which is not
    * exact at epoch-nanos magnitude. Mirror in DuckDB:
    * `make_timestamp(epoch_ns(ts) // 1000)`. */
  def tsMicros(colName: String): Column =
    timestamp_micros(expr(s"$colName div 1000"))

  /** Exact sum of a double column: decimal-accumulate, then one final
    * rounding to double. Deterministic regardless of partitioning. */
  def decSum(c: Column): Column =
    sum(c.cast("decimal(18,4)")).cast("double")

  /** Matching oracle fragment for [[decSum]]. */
  def decSumSql(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,4))) AS DOUBLE)"

  /** Exact average: decimal sum divided by count, evaluated in double.
    * Same expression on both engines. */
  def decAvg(c: Column): Column =
    sum(c.cast("decimal(18,4)")).cast("double") / count(lit(1))

  def decAvgSql(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)"
}
