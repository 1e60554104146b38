package graft.runtime

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.SparkSession

/** Durable connector offsets under the stream's checkpoint directory
  * (SURVEY.md §2.8's deliberate improvement over the reference, which
  * keeps CT versions and REST page pointers in memory only —
  * SqlServerChangeTrackingSource.cs:213,455-459, PagedUriProvider.cs:25,
  * 67-71 — and relies on a lookback re-read after restart).
  *
  * One tiny file per key, written temp-then-rename so readers never see
  * a torn value. Works on any Hadoop filesystem (local, HDFS, object
  * stores with atomic rename); offsets are driver-side metadata, so the
  * O(1) file write per poll is irrelevant at any scale.
  */
final class OffsetStore(spark: SparkSession, checkpointDir: String) {

  private val dir = new Path(checkpointDir, "graft-offsets")
  private def fs: FileSystem =
    dir.getFileSystem(spark.sessionState.newHadoopConf())

  def write(key: String, value: String): Unit = {
    val f = fs
    f.mkdirs(dir)
    val tmp = new Path(dir, s".$key.tmp")
    val out = f.create(tmp, true)
    out.write(value.getBytes(StandardCharsets.UTF_8))
    out.close()
    // single-step overwriting rename: the previous offset survives every
    // crash point (the delete-then-rename alternative has a window where
    // no offset exists at all, weakening the torn-value contract below).
    // FileContext needs an AbstractFileSystem binding for the scheme
    // (present for file/hdfs/viewfs; s3a only with
    // fs.AbstractFileSystem.s3a.impl configured) — schemes without one
    // fall back to delete+rename, trading the no-offset crash window
    // for working at all on that filesystem (ADVICE r3).
    val dest = new Path(dir, key)
    try {
      val conf = spark.sessionState.newHadoopConf()
      val fc = FileContext.getFileContext(f.makeQualified(dir).toUri, conf)
      fc.rename(f.makeQualified(tmp), f.makeQualified(dest),
        Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        f.delete(dest, false)
        if (!f.rename(tmp, dest))
          throw new java.io.IOException(s"offset rename failed: $tmp -> $dest")
    }
  }

  def read(key: String): Option[String] = {
    val f = fs
    val p = new Path(dir, key)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        Some(new String(bytes.toByteArray, StandardCharsets.UTF_8))
      } finally in.close()
    }
  }

  def readLong(key: String): Option[Long] = read(key).map(_.trim.toLong)
  def writeLong(key: String, value: Long): Unit = write(key, value.toString)
}
