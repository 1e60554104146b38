package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-similarity search over `array<float>` columns (VERDICT r1
  * rank 0; SURVEY.md §7.1 module 7).
  *
  * Two tiers:
  *  - [[cosineTopK]]: brute force — broadcast the (small) query set
  *    against the full corpus; exact, O(|queries|·|corpus|·dim). The
  *    correctness baseline, and the right plan whenever the query set
  *    fits in a broadcast.
  *  - [[annTopK]]: sign-bucket LSH — each vector hashes to a bucket
  *    from deterministic coordinate-difference hyperplanes; search is a
  *    shuffle hash join on the bucket key, so cost scales with bucket
  *    occupancy, never |corpus|². The 100 TB path: buckets partition
  *    the corpus and each executor scans only its bucket.
  *
  * All vector math runs in double via `zip_with`/`aggregate` in strict
  * left-to-right order — bit-reproducible by any engine folding the
  * same way (the DuckDB oracle does). Scores are emitted as
  * `score_e4 = round(cosine·10⁴)` BIGINTs so results hash-compare
  * exactly with no float representation drift.
  */
object Similarity {

  /** Strict left-to-right dot product of two `array<float>` columns in
    * double — the native codegen'd [[graft.functions.VectorDot]]
    * expression (one fused primitive loop; the portable
    * `zip_with`/`aggregate` fold it replaces is interpreted and ~10×
    * slower per row, with bit-identical results). */
  def dot(a: String, b: String): Column = expr(s"graft_vector_dot($a, $b)")

  def l2Norm(a: String): Column = sqrt(dot(a, a))

  /** Deterministic sign-bucket code: bit i set iff v[i] > v[i+offset].
    * Coordinate-difference hyperplanes need no stored projection matrix
    * (and no RNG), so the bucketing is reproducible everywhere. */
  def signBucket(embCol: String, bits: Int = 8, offset: Int = 32): Column = expr(
    s"""aggregate(sequence(0, ${bits - 1}), 0, (acc, i) -> acc +
       |  CASE WHEN element_at($embCol, i + 1) > element_at($embCol, i + 1 + $offset)
       |       THEN shiftleft(1, i) ELSE 0 END)""".stripMargin)

  /** Normalize to (id, embedding, nrm) with the L2 norm precomputed.
    * Registers the native vector expressions on the session — every
    * similarity entry point funnels through here. */
  def withNorm(df: DataFrame, idCol: String, embCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol), col(embCol).as("embedding"))
      .withColumn("nrm", l2Norm("embedding"))
  }

  private def scored(q: DataFrame, n: DataFrame, joinCond: Column): DataFrame =
    q.alias("q").join(n.alias("n"), joinCond)
      .withColumn("score_e4",
        round(dot("q.embedding", "n.embedding") / (col("q.nrm") * col("n.nrm")) * 10000)
          .cast("long"))

  /** Exact top-k neighbors for each query vector (brute force; the
    * query side is broadcast so the corpus never shuffles). */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, idCol: String, embCol: String,
      k: Int): DataFrame = {
    val q = withNorm(queries, idCol, embCol)
    val n = withNorm(corpus, idCol, embCol)
    val joined = scored(broadcast(q), n, col(s"q.$idCol") =!= col(s"n.$idCol"))
    rank(joined, idCol, k)
  }

  /** Approximate top-k: candidates restricted to the query's sign
    * bucket; join is a hash join on the bucket key. Recall trades off
    * against `bits` (more bits ⇒ smaller buckets ⇒ faster, lower
    * recall). */
  def annTopK(queries: DataFrame, corpus: DataFrame, idCol: String, embCol: String,
      k: Int, bits: Int = 8): DataFrame = {
    val dim = 64 // offset pairs (i, i+dim/2) keep hyperplanes in-range
    val q = withNorm(queries, idCol, embCol)
      .withColumn("qbucket", signBucket("embedding", bits, dim / 2))
    val n = withNorm(corpus, idCol, embCol)
      .withColumn("nbucket", signBucket("embedding", bits, dim / 2))
    val joined = scored(q, n,
      col("qbucket") === col("nbucket") && col(s"q.$idCol") =!= col(s"n.$idCol"))
      .withColumn("bucket", col("qbucket").cast("long"))
    rank(joined, idCol, k)
  }

  /** Squared-L2 distance between two array columns, strict left fold. */
  def sqDist(a: String, b: String): Column = expr(
    s"""aggregate(zip_with($a, $b, (x, y) -> (cast(x as double) - cast(y as double))
       |  * (cast(x as double) - cast(y as double))),
       |  cast(0 as double), (acc, v) -> acc + v)""".stripMargin)

  /** IVF cell assignment: nearest of the (broadcast) centroid set by
    * squared L2, ties to the lowest centroid id. The cross join is
    * |rows| × |centroids| — centroids are metadata-sized, so this is a
    * narrow broadcast pass, the standard IVF assignment shape. */
  def assignCells(df: DataFrame, centroids: DataFrame,
      idCol: String, embCol: String): DataFrame = {
    val c = centroids.select(col(idCol).as("cid"), col(embCol).as("cemb"))
    val assigned = withNorm(df, idCol, embCol)
      .crossJoin(broadcast(c))
      .withColumn("dist", sqDist("embedding", "cemb"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("dist").asc, col("cid").asc)
    assigned
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("embedding"), col("nrm"), col("cid").as("cell"))
  }

  /** IVF approximate top-k: vectors are bucketed into inverted-file
    * cells by nearest centroid; a query searches only its own cell
    * (nProbe = 1), joined on the cell key. The second of the two ANN
    * structures (vs [[annTopK]]'s LSH sign buckets): cells follow the
    * data distribution, buckets are data-independent. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      idCol: String, embCol: String, k: Int): DataFrame = {
    val q = assignCells(queries, centroids, idCol, embCol)
      .withColumnRenamed("cell", "qcell")
    val n = assignCells(corpus, centroids, idCol, embCol)
      .withColumnRenamed("cell", "ncell")
    val joined = q.alias("q").join(n.alias("n"),
        col("qcell") === col("ncell") && col(s"q.$idCol") =!= col(s"n.$idCol"))
      .withColumn("score_e4",
        round(dot("q.embedding", "n.embedding") / (col("q.nrm") * col("n.nrm")) * 10000)
          .cast("long"))
      .withColumn("cell", col("qcell"))
    rank(joined, idCol, k)
  }

  /** Embedding-cosine near-dup pairs: candidates restricted to shared
    * sign buckets (hash join on the bucket key — never all-pairs),
    * kept when cosine ≥ threshold. The embedding-space sibling of
    * MinHash-LSH text dedup: same bucket-then-verify shape, so the
    * exact-verify cost is O(bucket collisions), not O(n²). */
  def embedNearDupPairs(df: DataFrame, idCol: String, embCol: String,
      minScoreE4: Long, bits: Int = 8): DataFrame = {
    val dim = 64
    val a = withNorm(df, idCol, embCol)
      .withColumn("qbucket", signBucket("embedding", bits, dim / 2))
    val b = withNorm(df, idCol, embCol)
      .withColumn("nbucket", signBucket("embedding", bits, dim / 2))
    scored(a, b,
      col("qbucket") === col("nbucket") && col(s"q.$idCol") < col(s"n.$idCol"))
      .filter(col("score_e4") >= minScoreE4)
      .select(
        col(s"q.$idCol").as("id_a"), col(s"n.$idCol").as("id_b"),
        col("qbucket").cast("long").as("bucket"), col("score_e4"))
  }

  private def rank(scoredPairs: DataFrame, idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(s"q.$idCol"))
      .orderBy(col("score_e4").desc, col(s"n.$idCol"))
    scoredPairs
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .withColumn("query_id", col(s"q.$idCol"))
      .withColumn("neighbor_id", col(s"n.$idCol"))
  }
}
