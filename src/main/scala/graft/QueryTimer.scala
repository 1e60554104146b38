package graft

/** Dev utility: time a named subset of [[SparkEntry.queries]] (all of
  * them if no args), one warm-up pass then min of two measured passes —
  * the same contract as [[Bench]] but scoped, for iterating on a single
  * query's plan without paying the full-suite wall clock.
  *
  * Usage: `sbt "runMain graft.QueryTimer dedup_cluster dedup_jaccard"`
  * (data dir from SPARK_GRAFT_SF_DIR, default sf0.1).
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.runtime.GraftSession.local("graft-timer", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.isEmpty || args.contains(n) }
    def once(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    selected.foreach { case (name, fn) =>
      once(fn) // warm-up
      val t = math.min(once(fn), once(fn))
      println(f"[timer] $name $t%.2fs")
    }
    spark.stop()
  }
}
