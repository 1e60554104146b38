package graft.runtime

import org.apache.spark.sql.SparkSession

/** Opinionated SparkSession defaults for the engine's workloads —
  * the conf surface a 100 TB deployment tunes, pre-set to sane values:
  *
  *  - shuffle partitions sized to the cluster, not Spark's default 200
  *    (local mode: cores; cluster: ~2-3× total executor cores);
  *  - AQE on with skew-join handling: runtime re-plan absorbs the skew
  *    that static planning can't see (pair with [[graft.ops.Skew]] for
  *    aggregation skew);
  *  - 128 MiB scan partitions — parquet split size that keeps scan
  *    tasks fat enough to amortize scheduling but small enough to fit
  *    executor memory alongside shuffle buffers;
  *  - UTC session timezone (oracle parity and sanity).
  */
object GraftSession {

  def builder(appName: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")

  /** Local harness variant (the sandbox's local[N] shape). */
  def local(appName: String, cores: Int): SparkSession.Builder =
    builder(appName, cores).master(s"local[$cores]")
}
