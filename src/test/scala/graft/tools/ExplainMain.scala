package graft.tools

/** Dev utility: print the formatted physical plan (and optionally time)
  * of declared queries. `sbt "Test/runMain graft.tools.ExplainMain
  * <query> [sfDir] [--time]"`. Not part of the driver contract. */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("pipeline_corpus_clean")
    val dir = args.drop(1).headOption.filterNot(_.startsWith("--"))
      .getOrElse("/root/testdata/sf0.01")
    val time = args.contains("--time")
    val spark = graft.runtime.GraftSession.local("graft-explain", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    if (time) {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val run = graft.SparkEntry.queries(name)(spark, dir)
        run.write.format("noop").mode("overwrite").save()
        println(f"[time] $name pass$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
        if (i == 1) {
          // collect() executes THIS QueryExecution (write.save() builds
          // its own), so the adaptive final plan carries reuse markers
          val probe = graft.SparkEntry.queries(name)(spark, dir)
          probe.collect()
          val finalPlan = probe.queryExecution.executedPlan.toString
          val reused = "ReusedQueryStage|ReusedExchange".r.findAllIn(finalPlan).size
          val scans = "Scan parquet".r.findAllIn(finalPlan).size
          println(s"[reuse] final plan: $reused reuse markers, $scans scans")
        }
      }
    }
    spark.stop()
  }
}
