package graft.sources

import org.apache.hadoop.fs.{Path, RemoteIterator}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Blob/file-listing source (reference:
  * src/Sources/BlobStorage/BlobStorageSource.cs:19-139; SURVEY.md §2.1
  * S5): emits object names under a prefix, re-listed per poll. The
  * reference emits bare names forever on an interval; we expose the
  * listing as a DataFrame of (name, size, modificationTime) so
  * downstream filters (prefix/suffix/modifiedAfter) stay declarative.
  *
  * Scale note: the listing itself is driver-side (as in the reference —
  * it's a metadata operation), but is immediately parallelized as a
  * DataFrame. For 100M+ object stores, swap in a manifest/inventory
  * table scan instead of a live listing.
  */
object BlobListingSource {

  final case class BlobInfo(name: String, size: Long, modificationTime: Long)

  def list(spark: SparkSession, prefix: String, recursive: Boolean = true): DataFrame = {
    import spark.implicits._
    val path = new Path(prefix)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val blobs = Vector.newBuilder[BlobInfo]
    if (fs.exists(path)) {
      val it: RemoteIterator[org.apache.hadoop.fs.LocatedFileStatus] =
        fs.listFiles(path, recursive)
      while (it.hasNext) {
        val s = it.next()
        blobs += BlobInfo(s.getPath.toString, s.getLen, s.getModificationTime)
      }
    }
    blobs.result().toDF()
  }

  /** Names only — the reference's exact emission shape. */
  def listNames(spark: SparkSession, prefix: String): DataFrame =
    list(spark, prefix).select("name")

  /** Poll loop: re-list every `intervalMillis`, invoke `onBatch` with
    * the listing (the reference never completes; bound with
    * `maxPolls` >= 0 for tests / backfill-style runs). */
  def poll(
      spark: SparkSession,
      prefix: String,
      intervalMillis: Long,
      maxPolls: Long = Long.MaxValue)(onBatch: DataFrame => Unit): Unit = {
    require(intervalMillis > 0, "changeCaptureInterval must be positive")
    var i = 0L
    while (i < maxPolls) {
      onBatch(list(spark, prefix))
      i += 1
      if (i < maxPolls) Thread.sleep(intervalMillis)
    }
  }
}
