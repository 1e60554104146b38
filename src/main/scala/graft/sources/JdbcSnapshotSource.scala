package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.ColumnOps

/** Full-table polling source (reference:
  * src/Sources/SqlServer/SqlServerSource.cs:28-210; SURVEY.md §2.1 S1):
  * `SELECT *` re-issued per poll interval — plain batch JDBC with
  * snapshot semantics.
  *
  * Scale: partition the read over a numeric column so executors fetch
  * ranges in parallel (`partitionColumn/numPartitions`) instead of the
  * reference's single-connection row-at-a-time pull.
  */
final class JdbcSnapshotSource(
    spark: SparkSession,
    url: String,
    schemaName: String,
    tableName: String,
    properties: Properties = new Properties(),
    partitionColumn: Option[String] = None,
    numPartitions: Int = 8) {

  def snapshot(): DataFrame = {
    val table = s"$schemaName.$tableName"
    partitionColumn match {
      case Some(pc) =>
        val bounds = spark.read.jdbc(url,
            s"(SELECT MIN($pc) lo, MAX($pc) hi FROM $table) b", properties)
          .collect().head
        if (bounds.isNullAt(0)) spark.read.jdbc(url, table, properties)
        else spark.read.jdbc(url, table, pc,
          bounds.getLong(0), bounds.getLong(1), numPartitions, properties)
      case None => spark.read.jdbc(url, table, properties)
    }
  }

  /** Snapshot with merge key appended, ready for the arcane sink. */
  def snapshotWithMergeKey(pkColumns: Seq[String]): DataFrame =
    ColumnOps.withMergeKey(snapshot(), pkColumns)
}
