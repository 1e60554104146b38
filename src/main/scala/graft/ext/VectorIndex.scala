package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sinks.ArcaneLayout

/** Persisted ANN INDEX store — the embedding-space sibling of
  * [[SignatureStore]], and the production form of [[Similarity]]'s
  * IVF+PQ composition: the expensive artifacts (coarse centroids, PQ
  * codebooks — both metadata-sized) are trained ONCE at [[build]] and
  * persisted; every later batch of vectors is admitted by [[append]]
  * with a narrow encode pass against the STORED codebooks (no
  * retraining, no corpus rescans — the reference's delta-only
  * ingestion discipline applied to index state); queries probe the
  * stored cell-partitioned codes, so a search reads only
  * nProbe/coarseK of the index AT THE FILE level.
  *
  * Layout under `path`:
  * {{{
  *   coarse/      — coarse IVF centroids (cid, emb), plain parquet metadata
  *   books/       — PQ codebooks (s, cid, cemb), plain parquet metadata
  *   codes/data/cell=N/ — ArcaneLayout cell-partitioned PQ codes
  *                        (neighbor_id, s, code)
  *   metadata/v0/index.json — {dim, m} the encode/query arithmetic mirrors
  * }}}
  *
  * [[topK]] reproduces [[Similarity.ivfPqTopK]] bit-for-bit on the
  * same corpus and parameters (same assignment, same ADC arithmetic,
  * same tie-breaks) — which is how the `sim_index_store` oracle
  * verifies this store against the SAME DuckDB SQL as `sim_ivfpq`
  * while reading every corpus-sized input from parquet. The probed
  * cell ids are collected to the driver to drive file-level partition
  * pruning — a bounded set (≤ |queries|·nProbe ≤ coarseK values),
  * the same class of bounded driver probe as the connector offset
  * seeks. */
object VectorIndex {

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())

  private def writeMeta(spark: SparkSession, path: String, dim: Int, m: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/metadata/v0/index.json")
    val f = fs(spark, path)
    f.mkdirs(p.getParent)
    val out = f.create(p, true)
    out.write(s"""{"dim":$dim,"m":$m}""".getBytes("UTF-8"))
    out.close()
  }

  /** (dim, m) recorded at build — the shape every encode/query must
    * mirror. */
  def meta(spark: SparkSession, path: String): (Int, Int) = {
    val in = fs(spark, path).open(
      new org.apache.hadoop.fs.Path(s"$path/metadata/v0/index.json"))
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val get = (k: String) => s""""$k"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(txt)
      .getOrElse(throw new IllegalStateException(s"unreadable index metadata: $k"))
      .group(1).toInt
    (get("dim"), get("m"))
  }

  /** Train the index artifacts from a corpus and admit it: coarse
    * centroids + PQ codebooks persisted as metadata tables, then
    * [[append]] encodes the corpus into the cell-partitioned code
    * store. Training cost is paid ONCE per index lifetime. */
  def build(corpus: DataFrame, idCol: String, embCol: String, path: String,
      dim: Int, m: Int, codebookK: Int, coarseK: Int,
      coarseIters: Int = 1, pqIters: Int = 1,
      sampleFraction: Double = 1.0): Unit = {
    val spark = corpus.sparkSession
    writeMeta(spark, path, dim, m)
    Similarity.trainCentroids(corpus, idCol, embCol, coarseK, coarseIters, sampleFraction)
      .select(col(idCol).as("cid"), col(embCol).as("emb"))
      .write.mode("overwrite").parquet(s"$path/coarse")
    Similarity.trainPqCodebooks(corpus, idCol, embCol, dim, m, codebookK,
        pqIters, sampleFraction)
      .write.mode("overwrite").parquet(s"$path/books")
    append(corpus, idCol, embCol, path)
  }

  def coarse(spark: SparkSession, path: String, embCol: String): DataFrame =
    spark.read.parquet(s"$path/coarse")
      .select(col("cid").as("vi_cid"), col("emb").as(embCol))

  def books(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/books")

  /** Encode one batch against the STORED artifacts and append its
    * codes under the owning coarse cells — O(batch) work, narrow
    * (broadcast codebook joins), no retraining. */
  def append(batch: DataFrame, idCol: String, embCol: String, path: String): Unit = {
    val spark = batch.sparkSession
    val (dim, m) = meta(spark, path)
    val cents = coarse(spark, path, embCol)
      .select(col("vi_cid").as(idCol), col(embCol))
    val cells = Similarity.assignCells(batch, cents, idCol, embCol)
      .select(col(idCol).as("neighbor_id"), col("cell"))
    val codes = Similarity.pqAssign(
        Similarity.pqSubRows(batch, idCol, embCol, dim, m),
        books(spark, path), idCol)
      .select(col(idCol).as("neighbor_id"), col("s"), col("cell").as("code"))
    ArcaneLayout.writeDataBatch(codes.join(cells, "neighbor_id"),
      s"$path/codes", partitionColumns = Seq("cell"))
  }

  /** Approximate top-k against the stored index: queries coarse-assign
    * against the persisted centroids, the probed cells' code FILES are
    * the only index bytes read (hive partition pruning on `cell=`),
    * and ADC scoring runs candidate-restricted exactly like
    * [[Similarity.ivfPqTopK]] — output contract and arithmetic
    * identical: (query_id, neighbor_id, cell, adist_e6, rnk). */
  def topK(queries: DataFrame, path: String, idCol: String, embCol: String,
      k: Int, nProbe: Int = 2): DataFrame = {
    val spark = queries.sparkSession
    val (dim, m) = meta(spark, path)
    val cents = coarse(spark, path, embCol)
      .select(col("vi_cid").as(idCol), col(embCol))
    val q = Similarity.assignCellsN(queries, cents, idCol, embCol, nProbe)
      .select(col(idCol).as("query_id"), col("cell").as("qcell"))
    // bounded driver probe: ≤ |queries|·nProbe ≤ coarseK cell ids,
    // collected to drive FILE-level pruning of the code store
    val probed = q.select(col("qcell")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    val stored = spark.read.parquet(s"$path/codes/data")
      .filter(col("cell").isin(probed: _*))
    val cand = q.join(
        stored.select(col("neighbor_id"), col("cell")).distinct(),
        col("qcell") === col("cell") && col("query_id") =!= col("neighbor_id"))
      // the hive partition column infers as INT; the contract (and the
      // oracle schema) carries the coarse cell as BIGINT
      .select(col("query_id"), col("neighbor_id"), col("cell").cast("long").as("cell_ivf"))
    val codes = stored.select(col("neighbor_id"), col("s"), col("code").as("cell"))
    val dtab = Similarity.pqAdcTables(queries, books(spark, path), idCol, embCol, dim, m)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
      .orderBy(col("adist_e6").asc, col("neighbor_id").asc)
    Similarity.adcScoreCandidates(codes, dtab, cand)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }
}
