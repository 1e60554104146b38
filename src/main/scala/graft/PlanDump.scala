package graft

/** Dev utility (optimization rounds): dump `.explain("formatted")` for
  * named declared queries to files — the plan evidence the round's
  * OPTIMIZATION notes cite (`plans/rNN/<query>_{before,after}.txt`).
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.PlanDump plans/r20 before q1 q2 ..."
  *
  * Args: <outDir> <suffix> <query...>; `all` expands to every declared
  * query. Writes `<outDir>/<query>_<suffix>.txt`. MOST plans are built
  * lazily (no execution), but queries that materialize reused stages at
  * DataFrame-construction time (the four corpus builds' benchPhase
  * persist/checkpoint of token_stats/dedup_decision/decontaminate; the
  * classifier build's driver-side fit) DO run real corpus passes, and
  * their dumped plans truncate lineage at the cache/checkpoint scans —
  * that truncation is itself the plan evidence (ADVICE r20). Expect
  * `all` to take minutes, not seconds, because of those rows; AQE plans
  * print `isFinalPlan=false` — still the shape evidence (Exchange
  * count, join strategy, PushedFilters, codegen spans) the optimization
  * notes reference.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query...|all>")
    val outDir = args(0)
    val suffix = args(1)
    val names: Seq[String] =
      if (args(2) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.runtime.GraftSession.local("graft-plandump", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
        System.err.println(s"[plandump] $name -> $outDir/${name}_$suffix.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
