package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Path-addressed JSON sink (reference: src/Sinks/Json/JsonSink.cs:18-167;
  * SURVEY.md §2.2 K3): input rows carry (path, timestamp, body); each
  * record is wrapped as `{timestamp, body}` and lands under the literal
  * `<root>/<path>/` directory — exactly where a reference-built
  * consumer looks for it.
  *
  * The write itself is distributed (`partitionBy` on the path column);
  * the Hive-style `__path=<escaped>` directories it produces are then
  * renamed to the raw paths — a metadata-only move of O(distinct paths)
  * directories on the driver, not O(rows).
  */
object KeyedJsonSink {

  def writeBatch(
      df: DataFrame,
      rootPath: String,
      pathColumn: String = "path",
      timestampColumn: String = "timestamp",
      bodyColumn: String = "body"): Unit = {
    df.select(
        col(pathColumn).as("__path"),
        col(timestampColumn).as("timestamp"),
        col(bodyColumn).as("body"))
      .write.mode(SaveMode.Append)
      .partitionBy("__path")
      .json(rootPath)

    // rename __path=<escaped>/ → literal <path>/ (merging into any
    // directory left by a previous batch)
    val root = new Path(rootPath)
    val fs = root.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
    fs.globStatus(new Path(s"$rootPath/__path=*")).foreach { d =>
      val raw = unescapePathName(d.getPath.getName.stripPrefix("__path="))
      requireSafeRelativePath(raw)
      val dest = new Path(root, raw)
      if (!fs.exists(dest)) {
        fs.mkdirs(dest.getParent)
        fs.rename(d.getPath, dest)
      } else {
        fs.listStatus(d.getPath).filter(_.isFile).foreach { f =>
          fs.rename(f.getPath, new Path(dest, f.getPath.getName))
        }
        fs.delete(d.getPath, true)
      }
    }
  }

  /** Path values come from the DATA, so validate before using them as
    * directories: an absolute path or a `.`/`..` segment would resolve
    * outside the sink root — a data-driven path traversal on write. */
  private[graft] def requireSafeRelativePath(raw: String): Unit = {
    val absolute = raw.startsWith("/") || raw.startsWith("\\") ||
      raw.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*") // URI scheme / drive letter
    val dotted = raw.split("[/\\\\]").exists(s => s == "." || s == "..")
    if (absolute || dotted || raw.isEmpty)
      throw new IllegalArgumentException(
        s"unsafe sink path from data (absolute or dotted segment): '$raw'")
  }

  /** Invert Hive partition-value escaping (`%xx` sequences) so the raw
    * path — including `/` separators — is restored. Mirrors
    * org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils. */
  private[graft] def unescapePathName(escaped: String): String = {
    val sb = new StringBuilder(escaped.length)
    var i = 0
    while (i < escaped.length) {
      val c = escaped.charAt(i)
      if (c == '%' && i + 2 < escaped.length &&
          isHex(escaped.charAt(i + 1)) && isHex(escaped.charAt(i + 2))) {
        sb.append(Integer.parseInt(escaped.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') || (c >= 'a' && c <= 'f')
}
