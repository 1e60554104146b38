package graft.tools

/** Dev utility: replicate Bench's streaming_dedup row in isolation to
  * iterate on state/partition tuning without a full bench pass. */
object StreamBenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val parts = args.drop(1).headOption.getOrElse("8")
    val spark = graft.runtime.GraftSession.local("stream-probe", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream-probe")
    val slice = s"$tmp/docs"
    val docsDf = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").limit(10000)
    docsDf.repartition(8).write.parquet(slice)
    val n = spark.read.parquet(slice).count()
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    (1 to 2).foreach { pass =>
      val src = spark.readStream.schema(docsDf.schema)
        .option("maxFilesPerTrigger", "2").parquet(slice)
      val hits = graft.streaming.StreamingDedup.nearDupStream(
        graft.streaming.StreamingDedup.bandRows(src, "doc_id", "text"))
      val t0 = System.nanoTime()
      val q = hits.writeStream.format("noop")
        .option("checkpointLocation", s"$tmp/ckpt$pass").start()
      q.processAllAvailable()
      val sec = (System.nanoTime() - t0) / 1e9
      val state = q.recentProgress.toSeq
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .lastOption.map(_.numRowsTotal).getOrElse(-1L)
      q.stop()
      println(f"PROBE pass=$pass parts=$parts $n docs ${sec}%.2fs rate=${n / sec}%.0f/s state=$state")
    }
    graft.ext.SignatureStore.deleteStore(tmp)
    spark.stop()
  }
}
