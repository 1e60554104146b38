package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Constants

/** Multimodal (image / audio / video) column handling for training-data
  * pipelines (VERDICT r1 rank 0).
  *
  * Payloads travel as opaque `binary` columns next to a typed metadata
  * struct; identity is the sha-256 of the bytes (content-addressed
  * ARCANE_MERGE_KEY, same dedup contract as text rows). Ingestion uses
  * Spark's `binaryFile` source — file discovery, split planning and
  * binary materialization all stay distributed.
  *
  * The actual codec step (image decode, audio resample, frame sample)
  * is STUBBED: this sandbox ships no media libraries, so
  * [[extractFeatures]] derives deterministic pseudo-features from the
  * content hash. The Spark-side plumbing that matters at 100 TB —
  * binary schema, partition-wise batch iteration, typed output rows —
  * is real and tested; swap [[FakeCodec.decode]] for a real codec to
  * productionize.
  */
object Multimodal {

  /** Typed row produced by feature extraction. */
  final case class MediaFeatures(
      path: String,
      byteLen: Long,
      contentSha: String,
      mime: String,
      width: Int,
      height: Int)

  /** Read a directory of media files as (path, modificationTime,
    * length, content) — Spark's binaryFile source, distributed and
    * split-planned like any file scan. */
  def readBinaryDir(spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)

  /** Content-addressed identity: ARCANE_MERGE_KEY = sha-256 of the
    * payload bytes, so binary rows merge/dedup under the exact contract
    * text rows use (reference merge-key semantics, SURVEY.md §1.3). */
  def withContentKey(df: DataFrame, binCol: String = "content"): DataFrame =
    df.withColumn(Constants.MergeKeyColumn, sha2(col(binCol), 256))

  /** Deterministic stand-in for a media codec. Replace with a real
    * decoder in production; signature (bytes in, features out) is the
    * real contract. */
  object FakeCodec {
    def decode(path: String, bytes: Array[Byte]): MediaFeatures = {
      val sha = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
        .map(b => f"$b%02x").mkString
      val mime = path.toLowerCase match {
        case p if p.endsWith(".png") => "image/png"
        case p if p.endsWith(".jpg") || p.endsWith(".jpeg") => "image/jpeg"
        case p if p.endsWith(".wav") => "audio/wav"
        case p if p.endsWith(".mp4") => "video/mp4"
        case _ => "application/octet-stream"
      }
      // pseudo-dimensions from the hash: deterministic, codec-free
      val width = 16 + (java.lang.Integer.parseInt(sha.substring(0, 2), 16) % 64)
      val height = 16 + (java.lang.Integer.parseInt(sha.substring(2, 4), 16) % 64)
      MediaFeatures(path, bytes.length.toLong, sha, mime, width, height)
    }
  }

  /** Partition-wise feature extraction: each executor iterates its
    * partition's payloads through the codec once — the shape a real
    * decode (native lib per batch, GPU per partition) needs. */
  def extractFeatures(df: DataFrame,
      pathCol: String = "path", binCol: String = "content"): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(pathCol).cast("string"), col(binCol))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (path, bytes) => FakeCodec.decode(path, bytes) })
  }
}
