package graft.tools

/** Round-21 dev probe: time the rows affected by the materialization
  * primitive choice (store_ingest shape + corpus builds) without a
  * full bench run. Same timing discipline as Bench (min over 2 fresh
  * passes, noop sink for declared queries). */
object ProbeR21 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.runtime.GraftSession.local("graft-probe-r21", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.{col, lit, pmod}
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val names = if (args.nonEmpty) args.toSeq
      else Seq("store_ingest", "pipeline_corpus_build", "text_cooccurrence",
        "pipeline_corpus_build_lang")
    names.foreach {
      case "store_ingest" =>
        val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
          .select("doc_id", "text").filter(pmod(col("doc_id"), lit(2)) === 0)
        val ts = (1 to 2).map { _ =>
          val tmp = java.nio.file.Files.createTempDirectory("graft-ingest-probe")
          val s = time(graft.ext.SignatureStore.append(corpus, "doc_id", "text", tmp.toString): Unit)
          graft.ext.SignatureStore.deleteStore(tmp); s
        }
        System.err.println(f"[probe] store_ingest min=${ts.min}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
      case q =>
        val ts = (1 to 2).map { _ =>
          time(graft.SparkEntry.queries(q)(spark, sfDir)
            .write.format("noop").mode("overwrite").save())
        }
        System.err.println(f"[probe] $q min=${ts.min}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
