package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training corpora (VERDICT r1 rank 0;
  * SURVEY.md §7.1 module 7). Four tiers, cheapest first:
  *
  *  1. exact: hash-groupBy on the normalized text — one shuffle on the
  *     content hash, map-side partial agg;
  *  2. MinHash-LSH: per-row signatures (narrow), band-bucket self-join
  *     (shuffle on band key) — candidate pairs WITHOUT the all-pairs
  *     cartesian, the only formulation that survives 100 TB;
  *  3. SimHash: per-row 32-bit sketch ([[TextOps.simhash32]]), pairs by
  *     Hamming distance over bucketed prefixes;
  *  4. exact n-gram Jaccard: the precise verification stage, run ONLY
  *     on LSH candidate pairs.
  *
  * MinHash permutations are `md5(i + "|" + shingle)` hex strings with
  * lexicographic min — engine-portable (any SQL engine with md5
  * reproduces the signature bit-for-bit, which is how the DuckDB
  * oracle verifies us).
  */
object Dedup {

  /** k per-permutation MinHash values over a shingle array column. */
  def minhashSig(shinglesCol: Column, k: Int): Column =
    array((0 until k).map(i =>
      array_min(transform(shinglesCol, s => md5(concat(lit(s"$i|"), s))))): _*)

  /** LSH band keys over a signature array: b bands of r rows each;
    * two docs share a band key iff all r signature slots in the band
    * match. */
  def lshBandKeys(sigCol: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(j =>
      md5(concat_ws("|",
        (1 to rowsPerBand).map(r => element_at(sigCol, j * rowsPerBand + r)): _*))): _*)

  /** Exact dedup: group rows by the sha-256 of their normalized text,
    * keep the smallest id per group. One shuffle, partial-aggregated. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(sha2(TextOps.normalized(col(textCol)), 256).as("content_hash"))
      .agg(min(col(idCol)).as("keep_" + idCol), count(lit(1)).as("n_copies"))

  /** Doc → (id, sig, bands) projection; rows with fewer than
    * `shingleN` tokens carry no shingles and are dropped (they can't
    * near-dup by n-gram overlap). Entirely narrow — no shuffle. */
  def minhashProject(df: DataFrame, idCol: String, textCol: String,
      k: Int = 12, bands: Int = 4, rowsPerBand: Int = 3,
      shingleN: Int = 3): DataFrame = {
    require(bands * rowsPerBand == k, "bands * rowsPerBand must equal k")
    df.select(col(idCol), TextOps.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= shingleN)
      .withColumn("sh", TextOps.shingles(col("toks"), shingleN))
      .select(col(idCol), minhashSig(col("sh"), k).as("sig"))
      .withColumn("bands", lshBandKeys(col("sig"), bands, rowsPerBand))
  }

  /** Candidate near-dup pairs: explode band keys, self-join on the
    * band bucket (shuffle hash join on `bk` — never a cartesian), keep
    * id_a < id_b, dedup pairs that collide in several bands. The
    * returned `n_sig_match` (0..k matching signature slots) estimates
    * Jaccard as n_sig_match/k. */
  def minhashCandidates(projected: DataFrame, idCol: String, k: Int = 12): DataFrame = {
    val ex = projected.select(col(idCol), col("sig"), explode(col("bands")).as("bk"))
    val a = ex.alias("a")
    val b = ex.alias("b")
    a.join(b, col("a.bk") === col("b.bk") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(
        col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("n_sig_match",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          v => v)).cast("long"))
      .drop("sig_a", "sig_b")
  }

  /** Exact n-gram Jaccard verification over candidate pairs: join the
    * distinct-shingle sets back per side, emit intersection/union sizes
    * and the ≥ `threshold` duplicate verdict. Cost is O(candidates),
    * not O(n²) — candidates must come from [[minhashCandidates]]. */
  def jaccardVerify(candidates: DataFrame, shingleSets: DataFrame,
      threshold: Double = 0.8): DataFrame = {
    val a = shingleSets.select(col("doc_id").as("doc_a"), col("shd").as("shd_a"))
    val b = shingleSets.select(col("doc_id").as("doc_b"), col("shd").as("shd_b"))
    val pct = math.round(threshold * 10).toInt
    candidates.join(a, "doc_a").join(b, "doc_b")
      .withColumn("n_common", size(array_intersect(col("shd_a"), col("shd_b"))).cast("long"))
      .withColumn("n_union", size(array_union(col("shd_a"), col("shd_b"))).cast("long"))
      .withColumn("is_dup",
        when(col("n_common") * 10 >= col("n_union") * pct, 1L).otherwise(0L))
      .drop("shd_a", "shd_b")
  }
}
