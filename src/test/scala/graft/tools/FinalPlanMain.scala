package graft.tools

/** Dev utility: execute a declared query via collect() and print the
  * ADAPTIVE FINAL plan (with ReusedQueryStage markers). */
object FinalPlanMain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("dedup_jaccard")
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.runtime.GraftSession.local("graft-finalplan", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.collect()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
