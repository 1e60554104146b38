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
    // validate the path values BEFORE anything is staged (ADVICE r3:
    // throwing mid-rename left a poisoned __path= dir under the root
    // that every later batch re-globbed). One O(distinct paths)
    // aggregation — the same cardinality as the rename loop below.
    val bad = df.select(col(pathColumn).as("p")).distinct()
      .filter(!isSafeRelativePathCol(col("p")))
      .limit(5).collect().map(_.getString(0))
    if (bad.nonEmpty)
      throw new IllegalArgumentException(
        s"unsafe sink path(s) from data (absolute or dotted segment), " +
          s"nothing written: ${bad.mkString("'", "', '", "'")}")

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
      // defense in depth: the pre-write gate makes this unreachable for
      // this batch's rows, but a dir left by an OLDER (pre-gate) run
      // must not wedge the sink — quarantine it and keep going
      if (!isSafeRelativePath(raw)) {
        val qdir = new Path(root, "_rejected")
        fs.mkdirs(qdir)
        fs.rename(d.getPath, new Path(qdir, d.getPath.getName))
      } else {
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
  }

  /** Path values come from the DATA, so validate before using them as
    * directories: an absolute path or a `.`/`..` segment would resolve
    * outside the sink root — a data-driven path traversal on write. */
  private[graft] def isSafeRelativePath(raw: String): Boolean = {
    val absolute = raw.startsWith("/") || raw.startsWith("\\") ||
      raw.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*") // URI scheme / drive letter
    val dotted = raw.split("[/\\\\]").exists(s => s == "." || s == "..")
    !(absolute || dotted || raw.isEmpty)
  }

  private[graft] def requireSafeRelativePath(raw: String): Unit =
    if (!isSafeRelativePath(raw))
      throw new IllegalArgumentException(
        s"unsafe sink path from data (absolute or dotted segment): '$raw'")

  /** Column form of [[isSafeRelativePath]] — evaluated distributed in
    * the pre-write gate. Semantics must match the Scala predicate. */
  private[graft] def isSafeRelativePathCol(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val absolute = c.startsWith("/") || c.startsWith("\\") ||
      c.rlike("^[A-Za-z][A-Za-z0-9+.-]*:")
    val dotted = exists(split(c, "[/\\\\]"), s => s === "." || s === "..")
    !(absolute || dotted || c === "" || c.isNull)
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
