package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.ColumnOps
import graft.queries.{AnalyticsQueries, ParityQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator inventory (one entry per
  * implemented operator); `oracleSql` holds the DuckDB-equivalent ANSI
  * SQL the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** Flagship pipeline on sf0.001: snapshot → merge-key projection →
    * CDC latest-per-key merge — the core reference semantics
    * (ingest + idempotent downstream merge) in one plan. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    val keyed = ColumnOps.withMergeKey(lineitem, Seq("l_orderkey", "l_linenumber"))
    ColumnOps.latestByKey(keyed,
      keyColumn = graft.model.Constants.MergeKeyColumn,
      versionColumn = "l_shipdate",
      tieBreakers = Seq("l_orderkey", "l_linenumber"))
  }

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * LLM-pipeline extension layer (graft.ext). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ AnalyticsQueries.queries ++ graft.ext.ExtQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ParityQueries.oracles ++ AnalyticsQueries.oracles ++ graft.ext.ExtQueries.oracles
}
