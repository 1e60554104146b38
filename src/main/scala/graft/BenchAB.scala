package graft

/** Dev utility: INTERLEAVED A/B measurement of named bench rows — the
  * dispute-resolution tool for driver-vs-builder wall-time
  * disagreements (VERDICT r9 closed `agg_approx` with exactly this
  * shape; VERDICT r10 #1 asks for the same record on
  * `dedup_minhash` / `dedup_segments`).
  *
  * Alternates the queries round-robin for `SPARK_GRAFT_AB_ROUNDS`
  * rounds (default 5) with a CPU probe and a SHUFFLE probe between
  * rounds — interleaving means a contended window hits all queries
  * and the probes alike, so "query X regressed" separates from "the
  * box was busy while X happened to run". Prints a per-round table
  * plus min/median per query; one JSON line on stdout for records.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.BenchAB dedup_minhash dedup_segments"`
  */
object BenchAB {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq("dedup_minhash", "dedup_segments")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_AB_ROUNDS", "5").toInt
    val spark = graft.runtime.GraftSession.local("graft-bench-ab", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.{col, lit, pmod, sum, xxhash64}

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // decision_steady is not a SparkEntry query — it is Bench's
    // prepare-then-batch special (seed stores untimed, time ONE fresh
    // batch against them). Each prepare yields TWO genuinely fresh
    // slices, so a prepare is amortized over two timed samples; a
    // replayed batch would append nothing and bias the number low
    // (the same discipline as Bench.decisionSteady). VERDICT r13 #4
    // asks for exactly this row interleaved with the probes.
    var steadyState: (String, Seq[(Long, Array[Double])], Iterator[org.apache.spark.sql.DataFrame]) = null
    var steadyPass = 0
    def runDecisionSteady(): Double = {
      if (steadyState == null || !steadyState._3.hasNext) {
        if (steadyState != null)
          graft.ext.SignatureStore.deleteStore(java.nio.file.Paths.get(steadyState._1))
        val (store, cents, lasts) = graft.ext.ExtQueries.decisionSteadyPrepare(spark, sfDir)
        steadyState = (store, cents, lasts.iterator)
      }
      val batch = steadyState._3.next()
      steadyPass += 1
      time { graft.ext.ExtQueries.decisionSteadyBatch(
        steadyState._1, steadyState._2, batch, s"ab-steady-$steadyPass"): Unit }
    }
    def run(name: String): Double =
      if (name == "decision_steady") runDecisionSteady()
      else time {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    def cpuProbe(): Double = time {
      spark.range(0, 1500000000L, 1, 32)
        .select(pmod(xxhash64(col("id")), lit(1000L)).as("h"))
        .agg(sum("h")).write.format("noop").mode("overwrite").save()
    }
    def shuffleProbe(): Double = time {
      spark.range(0, 25000000L, 1, 32)
        .repartition(64, col("id"))
        .agg(sum(col("id"))).write.format("noop").mode("overwrite").save()
    }

    names.foreach(run); cpuProbe(); shuffleProbe() // warm-up
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to rounds).foreach { r =>
      names.foreach { n => samples(n) = samples(n) :+ run(n) }
      samples("cpu_probe") = samples("cpu_probe") :+ cpuProbe()
      samples("shuffle_probe") = samples("shuffle_probe") :+ shuffleProbe()
      System.err.println(f"[ab] round $r: " + (names ++ Seq("cpu_probe", "shuffle_probe"))
        .map(n => f"$n=${samples(n).last}%.2f").mkString(" "))
    }
    def med(xs: Vector[Double]): Double = xs.sorted.apply(xs.size / 2)
    val json = samples.toSeq.sortBy(_._1).map { case (n, xs) =>
      val series = xs.map(v => f"$v%.2f").mkString("[", ",", "]")
      f""""$n":{"min":${xs.min}%.2f,"med":${med(xs)}%.2f,"series":$series}"""
    }.mkString("{", ",", s""","sf_dir":"$sfDir","rounds":$rounds}""")
    println(json)
    spark.stop()
  }
}
