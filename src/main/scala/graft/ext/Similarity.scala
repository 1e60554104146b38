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

  /** Bucket-count geometry for a corpus: enough bits that the EXPECTED
    * bucket occupancy stays ~`targetOccupancy` regardless of corpus
    * size (VERDICT r2 #1: a fixed 8-bit bucket means candidate volume
    * ~n²/256 forever — the bits must grow with n). ceil(log2(n/target)),
    * clamped to [2, half/tables] — the upper clamp is the
    * [[signBucketTable]] coordinate-pair budget ((t+1)·bits ≤ half for
    * every table), so the derived bits always plan with the `tables`
    * the caller will pass to [[annTopK]]/[[embedNearDupPairs]]
    * (ADVICE r3: a 16-bit clamp with tables=3 threw at plan time). */
  def bitsFor(corpusSize: Long, targetOccupancy: Long = 1024L,
      tables: Int = 3, half: Int = 32): Int = {
    val maxBits = math.max(2, half / math.max(1, tables))
    val buckets = math.max(1L, corpusSize / math.max(1L, targetOccupancy))
    val ceilLog2 = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, buckets - 1))
    math.min(maxBits, math.max(2, ceilLog2))
  }

  /** One sign-bucket table: table `t` draws its `bits` hyperplanes from
    * coordinate pairs (t·bits+i, t·bits+i+half), so tables are
    * independent cuts of the space. The key embeds the table index
    * (t << bits | code): two vectors collide only when they agree on
    * the SAME table — the `bands × rowsPerBand` OR-construction of
    * [[Dedup.lshBandKeys]], transplanted to embedding space. */
  def signBucketTable(embCol: String, t: Int, bits: Int, half: Int = 32): Column = {
    require((t + 1) * bits <= half,
      s"table $t with $bits bits exceeds the $half coordinate-pair budget")
    expr(
      s"""aggregate(sequence(0, ${bits - 1}), cast(${t.toLong << bits} as bigint),
         |  (acc, i) -> acc +
         |  CASE WHEN element_at($embCol, i + ${t * bits + 1})
         |            > element_at($embCol, i + ${t * bits + 1 + half})
         |       THEN shiftleft(cast(1 as bigint), i) ELSE cast(0 as bigint) END)"""
        .stripMargin)
  }

  /** All `tables` bucket keys of a vector, for `explode` →
    * equi-join candidate generation (multi-table OR-construction:
    * a candidate surfaces if ANY table buckets the pair together —
    * recall grows with tables while per-table occupancy, and therefore
    * join fan-out, stays bounded by `bits`). */
  def signBucketKeys(embCol: String, bits: Int, tables: Int): Column =
    array((0 until tables).map(t => signBucketTable(embCol, t, bits)): _*)

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

  /** Approximate top-k via multi-table sign-bucket LSH: a candidate is
    * any (query, corpus) pair sharing a bucket in AT LEAST ONE of the
    * `tables` independent tables (OR-construction). The candidate join
    * carries ONLY (id, bucket-key) rows — embeddings re-attach by id
    * after the per-pair dedup, so the heavy arrays never ride the
    * candidate shuffle. Recall grows with `tables`; per-table occupancy
    * (join fan-out) is bounded by `bits` — derive `bits` from the
    * corpus size via [[bitsFor]] at scale.
    *
    * Output: (query_id, neighbor_id, n_tables, score_e4, rnk) where
    * n_tables = how many tables bucketed the pair together (a free
    * closeness prior, exactly like MinHash's n_sig_match). */
  def annTopK(queries: DataFrame, corpus: DataFrame, idCol: String, embCol: String,
      k: Int, bits: Int = 8, tables: Int = 3): DataFrame = {
    val qb = queries.select(col(idCol).as("query_id"),
      explode(signBucketKeys(embCol, bits, tables)).as("bk"))
    val nb = corpus.select(col(idCol).as("neighbor_id"),
      explode(signBucketKeys(embCol, bits, tables)).as("bk"))
    val cand = qb.join(nb, Seq("bk"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(count(lit(1)).as("n_tables"))
    rankCandidates(cand, queries, corpus, idCol, embCol, k)
  }

  /** Attach embeddings to id-only candidate pairs, score, and keep the
    * top-k per query (deterministic ties on neighbor id). */
  private def rankCandidates(cand: DataFrame, queries: DataFrame, corpus: DataFrame,
      idCol: String, embCol: String, k: Int): DataFrame = {
    val q = withNorm(queries, idCol, embCol)
      .select(col(idCol).as("query_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val n = withNorm(corpus, idCol, embCol)
      .select(col(idCol).as("neighbor_id"), col("embedding").as("n_emb"), col("nrm").as("n_nrm"))
    val scoredPairs = cand.join(q, "query_id").join(n, "neighbor_id")
      .withColumn("score_e4",
        round(dot("q_emb", "n_emb") / (col("q_nrm") * col("n_nrm")) * 10000).cast("long"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_e4").desc, col("neighbor_id"))
    scoredPairs
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "n_tables", "score_e4", "rnk")
  }

  /** Squared-L2 distance between two array columns — the native
    * codegen'd [[graft.functions.VectorSqDist]] (one fused primitive
    * loop on the IVF/PQ assignment hot path; for the equal-length dense
    * vectors every caller here passes, the portable
    * `aggregate`/`zip_with` fold it replaces is interpreted with
    * bit-identical results — same strict left-to-right double fold.
    * Mismatched-length or null-element inputs take VectorSqDist's
    * defensive prefix-fold semantics, see its scaladoc). */
  def sqDist(a: String, b: String): Column = expr(s"graft_vector_sqdist($a, $b)")

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

  /** Multi-probe IVF cell assignment: each row gets its `nProbe`
    * nearest centroids (probe_rn 1..nProbe, ties to lowest cid). The
    * query-side generalization of [[assignCells]] — probing more cells
    * trades a proportional candidate-count increase for recall, the IVF
    * analogue of [[annTopK]]'s multi-table OR-construction. */
  def assignCellsN(df: DataFrame, centroids: DataFrame,
      idCol: String, embCol: String, nProbe: Int): DataFrame = {
    val c = centroids.select(col(idCol).as("cid"), col(embCol).as("cemb"))
    val assigned = withNorm(df, idCol, embCol)
      .crossJoin(broadcast(c))
      .withColumn("dist", sqDist("embedding", "cemb"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("dist").asc, col("cid").asc)
    assigned
      .withColumn("probe_rn", row_number().over(w))
      .filter(col("probe_rn") <= nProbe)
      .select(col(idCol), col("embedding"), col("nrm"), col("cid").as("cell"))
  }

  /** Deterministic seeded k-means centroids as pure DataFrame ops
    * (no collect, no RNG): seeds are the `k` lowest-id vectors —
    * bottom-k by `orderBy(id).limit(k)`, which plans as a distributed
    * TakeOrderedAndProject and works for ANY id scheme (VERDICT r6 #2:
    * the old `filter(id < k)` silently produced an empty or short seed
    * set for sparse, offset, or non-numeric ids) — then `iters` Lloyd
    * iterations of broadcast-assign → per-(cell, coordinate) mean.
    * Coordinates are summed as e6 fixed-point BIGINTs — integer
    * addition is associative, so the resulting centroids are
    * bit-identical regardless of partition order (and reproducible by
    * any engine, which is how the DuckDB oracle re-derives them).
    * Each iteration is one narrow broadcast pass over the training set
    * plus a (cell, pos) shuffle of quantized coordinates.
    *
    * `sampleFraction < 1` trains on a deterministic-seed sample — the
    * 100 TB path: Lloyd passes touch the sample only, and the caller
    * assigns the FULL corpus once against the returned centroids (the
    * assignment pass, not training, is the at-scale cost). Seeds still
    * come from the full frame, so the seed set is sample-independent.
    * Cells that lose all members drop out (k shrinks), ties to the
    * lowest cell id. */
  def trainCentroids(df: DataFrame, idCol: String, embCol: String,
      k: Int, iters: Int = 2, sampleFraction: Double = 1.0): DataFrame = {
    val trainSet =
      if (sampleFraction >= 1.0) df
      else df.sample(withReplacement = false, sampleFraction, seed = 2654435761L)
    var cents = df.select(col(idCol), col(embCol))
      .orderBy(col(idCol)).limit(k)
    for (_ <- 1 to iters) {
      val assigned = assignCells(trainSet, cents, idCol, embCol)
      val sums = assigned
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cell", "pos")
        .agg(sum(round(col("v").cast("double") * 1e6).cast("long")).as("s"),
          count(lit(1)).as("c"))
      cents = sums
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("pos"),
          (col("s").cast("double") / 1e6 / col("c")).as("v")))).as("pv"))
        .select(col("cell").as(idCol), expr("transform(pv, x -> x.v)").as(embCol))
        // centroids are metadata (k rows): materialize per iteration so
        // every consumer (corpus assignment, multi-probe query
        // assignment, the next Lloyd pass) references a tiny table
        // instead of re-executing the whole training lineage — the same
        // persisted-codebook discipline pqTopK applies
        .localCheckpoint(true)
    }
    cents
  }

  /** IVF approximate top-k: vectors are bucketed into inverted-file
    * cells by nearest centroid; a query searches its `nProbe` nearest
    * cells, joined on the cell key (each corpus vector lives in exactly
    * one cell, so a (query, neighbor) pair surfaces at most once). The
    * second of the two ANN structures (vs [[annTopK]]'s LSH sign
    * buckets): cells follow the data distribution, buckets are
    * data-independent. Pass [[trainCentroids]] output for real cells. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      idCol: String, embCol: String, k: Int, nProbe: Int = 1): DataFrame = {
    val q = assignCellsN(queries, centroids, idCol, embCol, nProbe)
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

  /** Product-quantization (PQ) approximate top-k by L2: the embedding
    * is split into `m` contiguous subvectors; each subspace gets its
    * own [[trainCentroids]] codebook (seeded k-means, bit-reproducible
    * e6 fixed-point means) and every corpus vector is encoded as `m`
    * small codes — 64 dims × 4 bytes → `m` bytes per vector, the
    * memory-compression half of the IVF-PQ design used for
    * billion-scale ANN (vs [[ivfTopK]]'s candidate-pruning half; at
    * real scale compose them: IVF prunes cells, PQ scores survivors).
    *
    * Search is asymmetric-distance computation (ADC): a query computes
    * an exact distance table to each subspace codebook (|codebook| · m
    * entries — broadcast), then a corpus vector's approximate distance
    * is the SUM of table lookups on its codes — never a full
    * d-dimensional calculation per (query, vector) pair. Per-subspace
    * distances are quantized to e6 BIGINTs before summing, so the
    * total is an integer sum — associative, partition-order-proof, and
    * bit-reproducible by the oracle.
    *
    * Plan shape: per subspace — narrow encode pass over the corpus
    * (broadcast codebook) + broadcast distance-table join on the code;
    * the m per-subspace legs union and hash-aggregate on (query,
    * neighbor). No shuffle ever carries an embedding. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      embCol: String, dim: Int, m: Int, codebookK: Int, k: Int,
      iters: Int = 1, sampleFraction: Double = 1.0): DataFrame = {
    val (codes, dtab) =
      pqStructures(queries, corpus, idCol, embCol, dim, m, codebookK, iters, sampleFraction)
    rankByDist(adcScoreAll(codes, dtab), k)
  }

  /** Full-corpus ADC scoring (pqTopK's search stage): every vector's
    * codes meet the broadcast distance tables; the aggregate's shuffle
    * carries |queries|·|corpus| pairs. Exposed as a seam so ScaleBench
    * can measure this stage against [[adcScoreCandidates]] on
    * identical pre-built structures. */
  private[graft] def adcScoreAll(codes: DataFrame, dtab: DataFrame): DataFrame =
    codes
      .join(broadcast(dtab),
        col("s") === col("qs") && col("cell") === col("cid"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("d_e6")).as("adist_e6"))
      .filter(col("query_id") =!= col("neighbor_id"))

  /** Cell-pruned ADC scoring (ivfPqTopK's search stage): the broadcast
    * candidate set filters the codes BEFORE any table lookup, so the
    * aggregate's shuffle carries only candidate pairs. */
  private[graft] def adcScoreCandidates(codes: DataFrame, dtab: DataFrame,
      cand: DataFrame): DataFrame = {
    val dt = dtab.withColumnRenamed("query_id", "dq")
    codes
      .join(broadcast(cand), "neighbor_id")
      .join(broadcast(dt),
        col("query_id") === col("dq") &&
          col("s") === col("qs") && col("cell") === col("cid"))
      .groupBy("query_id", "neighbor_id")
      .agg(first(col("cell_ivf")).as("cell"), sum(col("d_e6")).as("adist_e6"))
  }

  /** The PQ index pair: corpus codes (neighbor_id, s, cell) — m small
    * codes per vector — and per-query ADC distance tables (query_id, qs,
    * cid, d_e6) — |codebook|·m entries per query, broadcast-sized.
    * Shared by [[pqTopK]] (full-corpus ADC scan) and [[ivfPqTopK]]
    * (cell-pruned scoring). */
  /** (id, s, semb) sub-vector rows — ALL subspaces ride one exploded
    * frame: training, encoding, and the distance tables are single
    * multi-key jobs keyed by (s, …) instead of m independent pipelines
    * (m separate legs cost m× every shuffle/broadcast at plan level
    * even when each is tiny). */
  private[graft] def pqSubRows(df: DataFrame, idCol: String, embCol: String,
      dim: Int, m: Int): DataFrame = {
    val subDim = dim / m
    df.select(col(idCol),
      posexplode(expr(
        s"transform(sequence(0, ${m - 1}), s -> slice($embCol, s * $subDim + 1, $subDim))"))
        .as(Seq("s", "semb")))
  }

  private def pqSubSqDist = expr("graft_vector_sqdist(semb, cemb)")

  /** Nearest codebook entry per (id, subspace) over exploded sub-rows:
    * (id, s, semb, cell). The codebook is broadcast (m × codebookK
    * rows — metadata). */
  private[graft] def pqAssign(sub: DataFrame, cents: DataFrame,
      idCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol), col("s"))
      .orderBy(col("dist").asc, col("cid").asc)
    sub.join(broadcast(cents), "s")
      .withColumn("dist", pqSubSqDist)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("s"), col("semb"), col("cid").as("cell"))
  }

  /** Seeded per-subspace codebooks + Lloyd iterations, all subspaces
    * at once: e6 fixed-point (s, cell, pos) sums — bit-reproducible.
    * Seeds are the bottom-codebookK ids (TakeOrderedAndProject +
    * broadcast semi-join — id-scheme-independent, VERDICT r6 #2);
    * Lloyd passes run over a deterministic sample when
    * sampleFraction < 1 (train on the sample, ENCODE the full corpus —
    * the at-scale discipline), seeds still from the full frame.
    * Returns (s, cid, cemb) — m × codebookK rows of metadata, the
    * artifact [[VectorIndex]] persists. */
  private[graft] def trainPqCodebooks(corpus: DataFrame, idCol: String,
      embCol: String, dim: Int, m: Int, codebookK: Int, iters: Int,
      sampleFraction: Double = 1.0): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val corpusSub = pqSubRows(corpus, idCol, embCol, dim, m)
    val trainSub =
      if (sampleFraction >= 1.0) corpusSub
      else pqSubRows(corpus.sample(withReplacement = false, sampleFraction, seed = 2654435761L),
        idCol, embCol, dim, m)
    val seedIds = corpus.select(col(idCol)).orderBy(col(idCol)).limit(codebookK)
    var cents = corpusSub
      .join(broadcast(seedIds), Seq(idCol), "left_semi")
      .select(col("s"), col(idCol).as("cid"), col("semb").as("cemb"))
    for (_ <- 1 to iters) {
      cents = pqAssign(trainSub, cents, idCol)
        .select(col("s"), col("cell"), posexplode(col("semb")).as(Seq("pos", "v")))
        .groupBy("s", "cell", "pos")
        .agg(sum(round(col("v").cast("double") * 1e6).cast("long")).as("su"),
          count(lit(1)).as("c"))
        .groupBy("s", "cell")
        .agg(array_sort(collect_list(struct(col("pos"),
          (col("su").cast("double") / 1e6 / col("c")).as("v")))).as("pv"))
        .select(col("s"), col("cell").as("cid"), expr("transform(pv, x -> x.v)").as("cemb"))
        // codebooks are metadata (m × codebookK rows): materialize per
        // iteration so the encode pass and the ADC tables reference a
        // tiny table, not the whole training lineage re-executed per
        // consumer (exactly what persisting a trained codebook means in
        // production)
        .localCheckpoint(true)
    }
    cents
  }

  /** Per-query ADC distance tables against a (possibly persisted)
    * codebook: (query_id, qs, cid, d_e6) — |codebook|·m rows per
    * query, broadcast-sized. */
  private[graft] def pqAdcTables(queries: DataFrame, cents: DataFrame,
      idCol: String, embCol: String, dim: Int, m: Int): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    pqSubRows(queries, idCol, embCol, dim, m)
      .select(col(idCol).as("query_id"), col("s"), col("semb"))
      .join(broadcast(cents), "s")
      .select(col("query_id"), col("s").as("qs"), col("cid"),
        round(pqSubSqDist * 1e6).cast("long").as("d_e6"))
  }

  private[graft] def pqStructures(queries: DataFrame, corpus: DataFrame, idCol: String,
      embCol: String, dim: Int, m: Int, codebookK: Int,
      iters: Int, sampleFraction: Double = 1.0): (DataFrame, DataFrame) = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val cents = trainPqCodebooks(corpus, idCol, embCol, dim, m, codebookK, iters, sampleFraction)
    val codes = pqAssign(pqSubRows(corpus, idCol, embCol, dim, m), cents, idCol)
      .select(col(idCol).as("neighbor_id"), col("s"), col("cell"))
    val dtab = pqAdcTables(queries, cents, idCol, embCol, dim, m)
    (codes, dtab)
  }

  private def rankByDist(approx: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist_e6").asc, col("neighbor_id").asc)
    approx.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Composed IVF+PQ approximate top-k — the billion-scale ANN shape
    * ([[ivfTopK]]'s candidate pruning × [[pqTopK]]'s memory
    * compression): the corpus is bucketed once into inverted-file cells
    * by nearest coarse centroid AND encoded once as m PQ codes; a query
    * probes its `nProbe` nearest cells and ADC-scores ONLY the
    * survivors — never the full corpus of codes (the gap [[pqTopK]]
    * leaves: its ADC scan touches every vector's codes per query
    * batch).
    *
    * Plan shape: coarse assignment is a narrow broadcast pass on each
    * side; the candidate set (query_id, neighbor_id, cell) — bounded by
    * |queries| · nProbe · avg cell size — is explicitly broadcast
    * against the corpus codes, so no corpus-sized shuffle exists
    * anywhere: codes scan → broadcast semi-restriction → broadcast ADC
    * table lookup → hash aggregate over candidate pairs only. The
    * aggregate's shuffle carries candidate pairs (the pruning win
    * ScaleBench measures vs [[pqTopK]]). At real scale, store the codes
    * PARTITIONED BY cell and the scan itself prunes to the probed
    * cells — this operator's join keys are laid out for exactly that.
    *
    * Codebooks quantize raw vectors (not per-cell residuals) so the
    * structure matches [[pqTopK]] and the DuckDB oracle re-derives
    * cells, codebooks, and tables with the same arithmetic. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      idCol: String, embCol: String, dim: Int, m: Int, codebookK: Int,
      k: Int, nProbe: Int = 2, iters: Int = 1,
      sampleFraction: Double = 1.0): DataFrame = {
    val q = assignCellsN(queries, centroids, idCol, embCol, nProbe)
      .select(col(idCol).as("query_id"), col("cell").as("qcell"))
    val n = assignCells(corpus, centroids, idCol, embCol)
      .select(col(idCol).as("neighbor_id"), col("cell").as("ncell"))
    val cand = q.join(n,
        col("qcell") === col("ncell") && col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("ncell").as("cell_ivf"))
    val (codes, dtab) =
      pqStructures(queries, corpus, idCol, embCol, dim, m, codebookK, iters, sampleFraction)
    rankByDist(adcScoreCandidates(codes, dtab, cand), k)
  }

  /** Exact re-rank tier over an ADC-ranked candidate list (VERDICT r7
    * #5: ADC quantization error caps recall; the standard fix is to
    * re-score a short exact tail). `approx` is a ranked candidate
    * frame (query_id, neighbor_id, cell, rnk) already limited to the
    * re-rank depth c — |queries|·c rows, BROADCAST-SIZED BY
    * CONSTRUCTION — so the true-embedding fetch is a broadcast
    * restriction of the corpus scan (no corpus-sized shuffle, no
    * second pass over non-candidates), and the exact squared-L2
    * re-score is O(c) native-expression work per query. Output ranks
    * by exact distance: (query_id, neighbor_id, cell, dist_e6, rnk). */
  def rerankExact(approx: DataFrame, queries: DataFrame, corpus: DataFrame,
      idCol: String, embCol: String, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val pairs = approx.select(col("query_id"), col("neighbor_id"), col("cell"))
    val n = corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("nemb"))
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("qemb"))
    val exact = n.join(broadcast(pairs), "neighbor_id")
      .join(broadcast(q), "query_id")
      .withColumn("dist_e6",
        round(expr("graft_vector_sqdist(qemb, nemb)") * 1e6).cast("long"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist_e6").asc, col("neighbor_id").asc)
    exact.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "cell", "dist_e6", "rnk")
  }

  /** Residual view of a cell-assigned frame: (idCol, cell, remb) with
    * `remb[i] = embedding[i] − centroid(cell)[i]` as doubles — the
    * input representation for RESIDUAL product quantization (VERDICT
    * r10 #5): PQ codebooks trained on residuals only need to span the
    * spread WITHIN a coarse cell, not the whole corpus diameter, so
    * the same m × codebookK budget quantizes finer. The centroid side
    * is metadata-sized and broadcast; the subtraction is a narrow
    * codegen'd `zip_with` pass. */
  private[graft] def residuals(asg: DataFrame, centroids: DataFrame,
      idCol: String, embCol: String): DataFrame = {
    val c = centroids.select(col(idCol).as("rcid"), col(embCol).as("rcemb"))
    asg.join(broadcast(c), col("cell") === col("rcid"))
      .select(col(idCol), col("cell"),
        zip_with(col("embedding"), col("rcemb"),
          (x, cc) => x.cast("double") - cc).as("remb"))
  }

  /** Residual-encoded IVF+PQ with the exact re-rank tier — the
    * standard accuracy step above [[ivfPqRerankTopK]] (which encodes
    * raw vectors; see Jégou et al., "Product Quantization for Nearest
    * Neighbor Search", §IV: encode x − q_coarse(x)). Differences from
    * the raw path, all of them per-probed-cell:
    *
    *  - corpus codes encode the vector's residual against ITS cell's
    *    centroid ([[residuals]] over the one-cell assignment);
    *  - the per-query ADC tables are computed PER PROBED CELL — the
    *    query's residual differs per probe — so the table is
    *    (query, probed cell, s, cid): |queries| · nProbe · m ·
    *    codebookK rows, still broadcast-sized metadata;
    *  - ADC lookup joins on the candidate's coarse cell as well, so a
    *    candidate is always scored against the query residual IN THE
    *    CELL THEY SHARE.
    *
    * Plan shape is unchanged from [[ivfPqTopK]]: no shuffle ever
    * carries an embedding, candidates and tables broadcast, the
    * aggregate's shuffle holds candidate pairs only. Recall: ADC
    * ranking approaches the cell-capture ceiling (the fraction of true
    * neighbors inside the probed cells — what nProbe controls, and the
    * hard upper bound NO encoding can exceed; measured ceilings are
    * pinned in TrainingRobustnessSpec). */
  def ivfPqResidualRerankTopK(queries: DataFrame, corpus: DataFrame,
      centroids: DataFrame, idCol: String, embCol: String, dim: Int, m: Int,
      codebookK: Int, k: Int, nProbe: Int = 2, iters: Int = 1,
      sampleFraction: Double = 1.0, rerankC: Int = 0): DataFrame = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val c = if (rerankC > 0) rerankC else 4 * k
    val subDim = dim / m
    val asgN = assignCells(corpus, centroids, idCol, embCol)
    val qsgN = assignCellsN(queries, centroids, idCol, embCol, nProbe)
    val cand = qsgN.select(col(idCol).as("query_id"), col("cell").as("qcell"))
      .join(asgN.select(col(idCol).as("neighbor_id"), col("cell").as("ncell")),
        col("qcell") === col("ncell") && col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("ncell").as("cell_ivf"))
    val corpusRes = residuals(asgN, centroids, idCol, embCol)
    val cents = trainPqCodebooks(corpusRes, idCol, "remb", dim, m, codebookK,
      iters, sampleFraction)
    val codes = pqAssign(pqSubRows(corpusRes, idCol, "remb", dim, m), cents, idCol)
      .select(col(idCol).as("neighbor_id"), col("s"), col("cell"))
    val qsub = residuals(qsgN, centroids, idCol, embCol)
      .select(col(idCol).as("dq"), col("cell").as("qcell"),
        posexplode(expr(
          s"transform(sequence(0, ${m - 1}), s -> slice(remb, s * $subDim + 1, $subDim))"))
          .as(Seq("s", "semb")))
    val dtab = qsub.join(broadcast(cents), "s")
      .select(col("dq"), col("qcell"), col("s").as("qs"), col("cid"),
        round(pqSubSqDist * 1e6).cast("long").as("d_e6"))
    val approx = codes
      .join(broadcast(cand), "neighbor_id")
      .join(broadcast(dtab),
        col("query_id") === col("dq") && col("qcell") === col("cell_ivf") &&
          col("s") === col("qs") && col("cell") === col("cid"))
      .groupBy("query_id", "neighbor_id")
      .agg(first(col("cell_ivf")).as("cell"), sum(col("d_e6")).as("adist_e6"))
    rerankExact(rankByDist(approx, c), queries, corpus, idCol, embCol, k)
  }

  /** [[ivfPqTopK]] with the exact re-rank tier composed on top: ADC
    * ranks the probed-cell candidates to depth `rerankC` (default 4k),
    * then [[rerankExact]] fetches true embeddings for ONLY those pairs
    * and re-scores. Recall@k rises toward the cell-capture ceiling
    * (the fraction of true neighbors inside the probed cells — what
    * nProbe controls) at O(rerankC) extra exact work per query, and
    * the no-corpus-shuffle property is preserved end to end. */
  def ivfPqRerankTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      idCol: String, embCol: String, dim: Int, m: Int, codebookK: Int,
      k: Int, nProbe: Int = 2, iters: Int = 1,
      sampleFraction: Double = 1.0, rerankC: Int = 0): DataFrame = {
    val c = if (rerankC > 0) rerankC else 4 * k
    val approx = ivfPqTopK(queries, corpus, centroids, idCol, embCol,
      dim, m, codebookK, c, nProbe, iters, sampleFraction)
    rerankExact(approx, queries, corpus, idCol, embCol, k)
  }

  /** Materialize a PQ code index hive-PARTITIONED BY coarse IVF cell
    * (VERDICT r6 missing #2: [[ivfPqTopK]] claims "with the codes
    * partitioned by cell the scan itself prunes" — this writes that
    * layout, via [[graft.sinks.ArcaneLayout.writeDataBatch]] so the
    * files also follow the reference blob naming). `codes` is
    * [[pqStructures]] output (neighbor_id, s, cell) — its per-subspace
    * code is stored as `code`; `coarseCells` is (neighbor_id, cell)
    * from [[assignCells]] over the trained coarse centroids. The join
    * is a broadcast of the metadata-sized cell map in any realistic
    * geometry; rows land under `data/cell=<id>/…parquet`. */
  def writeCellPartitionedCodes(codes: DataFrame, coarseCells: DataFrame,
      path: String): Unit = {
    val withCell = codes.withColumnRenamed("cell", "code")
      .join(coarseCells, "neighbor_id")
    graft.sinks.ArcaneLayout.writeDataBatch(withCell, path,
      partitionColumns = Seq("cell"))
  }

  /** Read back ONLY the probed cells of a [[writeCellPartitionedCodes]]
    * index: `cell` is a hive partition column, so the `isin` filter is
    * a PartitionFilter — the scan never opens the other cells' files
    * (input bytes ≈ nProbe/coarseK of the full index, measured by
    * ScaleBench). Returns exactly the [[pqStructures]] codes shape
    * (neighbor_id, s, cell = the PQ code) so it drops into
    * [[adcScoreCandidates]] unchanged — the coarse cell is
    * deliberately NOT carried (the candidate frame owns `cell_ivf`;
    * carrying a second copy would make the scoring join ambiguous). */
  def readCellPartitionedCodes(spark: org.apache.spark.sql.SparkSession,
      path: String, probeCells: Seq[Long]): DataFrame =
    spark.read.parquet(s"$path/data")
      .filter(col("cell").isin(probeCells: _*))
      .select(col("neighbor_id"), col("s"), col("code").as("cell"))

  /** Embedding-cosine near-dup pairs: candidates from the multi-table
    * sign-bucket self-join (hash join on the table-qualified bucket key
    * — never all-pairs), kept when cosine ≥ threshold. The
    * embedding-space sibling of MinHash-LSH text dedup: same
    * bucket-then-verify shape, same OR-construction, so the exact-verify
    * cost is O(bucket collisions) with recall controlled by `tables`
    * instead of a single band's cliff. The candidate self-join carries
    * only (id, key) rows; embeddings re-attach by id for the verify. */
  def embedNearDupPairs(df: DataFrame, idCol: String, embCol: String,
      minScoreE4: Long, bits: Int = 8, tables: Int = 3): DataFrame = {
    val keyed = df.select(col(idCol),
      explode(signBucketKeys(embCol, bits, tables)).as("bk"))
    val cand = keyed.alias("a").join(keyed.alias("b"),
        col("a.bk") === col("b.bk") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("n_tables"))
    val e = withNorm(df, idCol, embCol)
    val a = e.select(col(idCol).as("id_a"), col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    val b = e.select(col(idCol).as("id_b"), col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
    cand.join(a, "id_a").join(b, "id_b")
      .withColumn("score_e4",
        round(dot("a_emb", "b_emb") / (col("a_nrm") * col("b_nrm")) * 10000).cast("long"))
      .filter(col("score_e4") >= minScoreE4)
      .select("id_a", "id_b", "n_tables", "score_e4")
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    * at web-scale through semantic deduplication") Spark-first:
    * semantic near-duplicates are detected INSIDE coarse k-means
    * clusters only — the candidate pair space is Σ|cell|² instead of
    * n², and the cluster count is the scale knob (the paper runs 50 K
    * clusters over LAION; more cells ⇒ smaller cells ⇒ fewer pairs,
    * with [[trainCentroids]]' sampling keeping the training cost
    * flat). Within a cell, pairs with cosine ≥ the e4 threshold are
    * semantic duplicates; the keeper rule here is deterministic
    * min-id (the paper keeps the member farthest from the centroid —
    * any fixed representative works, and min-id keeps the decision
    * bit-reproducible across engines). Both join sides arrive
    * hash-partitioned by cell, so the pair enumeration is co-located;
    * no corpus-sized broadcast, no n² term.
    *
    * Returns one row per vector: (id, cell, n_dups — above-threshold
    * partners in its cell, decision keep/drop — drop iff a
    * smaller-id partner exists). */
  def semanticDedup(df: DataFrame, idCol: String, embCol: String,
      centroids: DataFrame, minScoreE4: Long, maxCellSize: Int = 0): DataFrame =
    semanticDecision(assignCells(df, centroids, idCol, embCol), idCol,
      minScoreE4, maxCellSize)

  /** The decision stage on an already-cell-assigned frame — shared by
    * the in-plan [[semanticDedup]] and [[VectorIndex.semanticDedup]]'s
    * store-backed assignment. */
  private[ext] def semanticDecision(asg: DataFrame, idCol: String,
      minScoreE4: Long, maxCellSize: Int): DataFrame = {
    val pairs = pairsWithinCells(asg, idCol, minScoreE4, maxCellSize)
    val asA = pairs.groupBy(col("id_a").as(idCol)).agg(count(lit(1)).as("n_a"))
    val asB = pairs.groupBy(col("id_b").as(idCol)).agg(count(lit(1)).as("n_b"))
    asg.select(col(idCol), col("cell"))
      .join(asA, Seq(idCol), "left")
      .join(asB, Seq(idCol), "left")
      .withColumn("n_dups",
        coalesce(col("n_a"), lit(0L)) + coalesce(col("n_b"), lit(0L)))
      .withColumn("decision",
        when(coalesce(col("n_b"), lit(0L)) > 0, lit("drop")).otherwise(lit("keep")))
      .select(col(idCol), col("cell"), col("n_dups"), col("decision"))
  }

  /** The SemDeDup pair stage alone — (id_a, id_b) with id_a < id_b,
    * cosine ≥ threshold, enumerated ONLY within coarse cells (same
    * Σ|cell|² bound and co-location as [[semanticDedup]]). This is the
    * edge list the corpus-decision composition feeds to connected
    * components, mirroring how the near tier's verified LSH pairs
    * feed `pipeline_dedup_apply`. */
  def semanticPairs(df: DataFrame, idCol: String, embCol: String,
      centroids: DataFrame, minScoreE4: Long, maxCellSize: Int = 0): DataFrame =
    pairsWithinCells(assignCells(df, centroids, idCol, embCol), idCol,
      minScoreE4, maxCellSize)

  /** Within-cell pair enumeration with the DEGENERATE-CELL skew guard
    * (VERDICT r9 #2): with `maxCellSize > 0`, any cell larger than the
    * cap is split into ⌈size/cap⌉ deterministic subcells by `id mod
    * nsplit`, and pairs are enumerated within (cell, subcell) — so one
    * boilerplate cluster (near-identical embeddings collapsing into a
    * single cell) puts at most ~cap²/2-scale pair work in a partition
    * instead of |cell|²/2. The embedding-space analogue of
    * [[Dedup.capBuckets]]'s LSH stop-bucket cap, with the softer
    * semantics splitting buys: capped cells are still deduped WITHIN
    * each subcell (a boilerplate member still drops against its
    * subcell's minimum), only cross-subcell pairs are forgone — the
    * documented recall tradeoff. The subcell key is `id mod n`, not a
    * hash, so any engine (and the DuckDB oracle) replays it exactly.
    * Cell sizes are a k-row aggregate attached by broadcast — no extra
    * corpus shuffle. */
  private def pairsWithinCells(asg: DataFrame, idCol: String,
      minScoreE4: Long, maxCellSize: Int = 0): DataFrame =
    pairsWithinCellsKeyed(asg, idCol, minScoreE4, maxCellSize)
      .select(col("id_a"), col("id_b"))

  /** [[pairsWithinCells]] retaining the cell key on each pair row —
    * the incremental corpus rebuild stores pairs per cell so untouched
    * cells carry their prior enumeration verbatim (round 17,
    * [[DedupState]]). */
  private[ext] def pairsWithinCellsKeyed(asg: DataFrame, idCol: String,
      minScoreE4: Long, maxCellSize: Int = 0): DataFrame = {
    val keyed =
      if (maxCellSize <= 0) asg.withColumn("sub", lit(0L))
      else {
        val sizes = asg.groupBy(col("cell")).agg(count(lit(1)).as("cn"))
        asg.join(broadcast(sizes), Seq("cell"))
          .withColumn("sub", pmod(col(idCol).cast("long"),
            greatest(lit(1L), ceil(col("cn") / lit(maxCellSize.toDouble)).cast("long"))))
      }
    val a = keyed.select(col("cell"), col("sub"), col(idCol).as("id_a"),
      col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    val b = keyed.select(col("cell"), col("sub"), col(idCol).as("id_b"),
      col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
    a.join(b, Seq("cell", "sub")).filter(col("id_a") < col("id_b"))
      .withColumn("score_e4",
        round(dot("a_emb", "b_emb") / (col("a_nrm") * col("b_nrm")) * 10000).cast("long"))
      .filter(col("score_e4") >= minScoreE4)
      .select(col("cell"), col("id_a"), col("id_b"))
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
