package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Path-addressed JSON sink (reference: src/Sinks/Json/JsonSink.cs:18-167;
  * SURVEY.md §2.2 K3): input rows carry (path, timestamp, body); each
  * record is wrapped as `{timestamp, body}` and lands under
  * `<root>/<path>/`. The reference writes one blob per (path, batch);
  * `partitionBy` reproduces the path-addressing with distributed writes
  * instead of a driver-side loop.
  */
object KeyedJsonSink {

  def writeBatch(
      df: DataFrame,
      rootPath: String,
      pathColumn: String = "path",
      timestampColumn: String = "timestamp",
      bodyColumn: String = "body"): Unit =
    df.select(
        col(pathColumn).as("__path"),
        col(timestampColumn).as("timestamp"),
        col(bodyColumn).as("body"))
      .write.mode(SaveMode.Append)
      .partitionBy("__path")
      .json(rootPath)
}
