package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ext.Similarity

object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.runtime.GraftSession.local("recall-probe", 16).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select("vec_id", "embedding")
    val queries = e.filter(col("vec_id") < 30)
    val exact = queries.alias("q").join(e.alias("n"), col("q.vec_id") =!= col("n.vec_id"))
      .withColumn("d", Similarity.sqDist("q.embedding", "n.embedding"))
      .withColumn("rnk", row_number().over(Window.partitionBy(col("q.vec_id")).orderBy(col("d").asc, col("n.vec_id").asc)))
      .filter(col("rnk") <= 3)
      .select(col("q.vec_id"), col("n.vec_id")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recall(m: Map[Long, Set[Long]]): Double = {
      val rs = exact.map { case (q, ex) => m.get(q).fold(0.0)(a => a.intersect(ex).size.toDouble / ex.size) }
      rs.sum / rs.size
    }
    val cents = Similarity.trainCentroids(e, "vec_id", "embedding", k = 8, iters = 1).localCheckpoint(true)
    // cell-capture ceiling: exact scoring restricted to probed cells = ivfTopK
    for (np <- Seq(1, 2, 3, 4)) {
      val ivf = Similarity.ivfTopK(queries, e, cents, "vec_id", "embedding", k = 3, nProbe = np)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      println(f"CEILING nProbe=$np ivf-exact recall=${recall(ivf)}%.3f")
    }
    for (np <- Seq(2, 3); c <- Seq(12, 24, 48)) {
      val rr = Similarity.ivfPqRerankTopK(queries, e, cents, "vec_id", "embedding",
          dim = 64, m = 8, codebookK = 16, k = 3, nProbe = np, iters = 2, rerankC = c)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      println(f"RERANK nProbe=$np c=$c recall=${recall(rr)}%.3f")
    }
    spark.stop()
  }
}
