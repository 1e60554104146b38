package graft

import java.nio.file.{Files, Paths}

/** Dev utility: run ONE named query from [[SparkEntry.queries]] against
  * a data dir, write its parquet result + a one-entry oracle_sql.json —
  * the same layout [[Verify]] produces, so `tools/check.py` can
  * hash-compare a single query while iterating on it.
  *
  * Usage: `sbt "runMain graft.VerifyOne sim_pq /root/testdata/sf0.01 /tmp/v1"`
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = graft.runtime.GraftSession.local("graft-verify-one", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.get(name)
      .map(sql => s"{${q(name)}: ${q(sql)}}").getOrElse("{}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
