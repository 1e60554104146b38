package graft

import java.nio.file.{Files, Paths}

/** Dev utility: write the FULL [[SparkEntry.oracleSql]] map as
  * `<outDir>/oracle_sql.json` without running any query — lets
  * `tools/check.py` re-compare parquet results that earlier
  * [[VerifyOne]] runs already produced (VerifyOne writes a one-entry
  * oracle file, clobbering its predecessor's).
  *
  * Usage: `sbt "runMain graft.DumpOracle /tmp/v1"`
  */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(".")
    new java.io.File(outDir).mkdirs()
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",\n", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"wrote ${SparkEntry.oracleSql.size} oracle entries to $outDir/oracle_sql.json")
  }
}
