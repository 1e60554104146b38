package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED TOKENIZER ARTIFACT (round 17, VERDICT r16 #5): the
  * trained BPE tokenizer as a store with the [[SignatureStore]] /
  * [[VectorIndex]] persistence discipline — train ONCE, ship the
  * artifact, encode everywhere — closing the r16 gap ("no persisted
  * tokenizer artifact; packing counts whitespace tokens").
  *
  * Layout under the store root (single-writer leased during train):
  *  - `merges/`  (step, sym_a, sym_b, pair_count) — the ordered merge
  *    table [[BpeTrain]] learns (metadata: k rows);
  *  - `vocab/`   (token_id, token) — deterministic id assignment:
  *    the fixed base alphabet (`_` end-of-word marker, then `0`-`9`,
  *    then `a`-`z` — ids 0..36; [[TextOps.tokens]] emits [a-z0-9]+
  *    only, so the alphabet is closed by construction), then each
  *    merged symbol at id 36 + step. Any engine replays the same ids
  *    from the same merges — no RNG, no hash;
  *  - `tokenizer.json` — version, step count, alphabet contract.
  *
  * Encoding applies the k merges as ONE codegen'd projection of
  * literal replaces (the `text_bpe_encode` plan — narrow, no shuffle)
  * and maps symbols to ids through a literal map (vocab is metadata:
  * 37 + k entries). The store round trip is hash-verified end to end
  * by `pipeline_pack_bpe`, whose DuckDB oracle RE-DERIVES the merges
  * from the corpus and replays encode-then-pack — a store-corrupted
  * merge table would hash-diverge. */
object TokenizerStore {

  /** The loaded artifact: ordered merges + symbol→id vocabulary. */
  final case class Tokenizer(merges: Seq[(String, String)],
      vocab: Seq[(String, Long)], version: Long) {
    def vocabSize: Int = vocab.size
  }

  /** `_` then digits then lowercase letters — ids 0..36, fixed. */
  private[ext] val BaseAlphabet: Seq[String] =
    "_" +: (('0' to '9') ++ ('a' to 'z')).map(_.toString)

  /** Train `steps` merges over `docs(textCol)` and persist the
    * artifact under `root` (leased; idempotent overwrite). `fast`
    * picks the driver-side incremental trainer (identical arithmetic,
    * spec-pinned — the real-vocabulary path); the engine form is for
    * vocabularies that genuinely cannot fit a driver. */
  def train(docs: DataFrame, textCol: String, root: String,
      steps: Int, fast: Boolean = true): Tokenizer = {
    val spark = docs.sparkSession
    StoreMeta.withWriterLease(spark, root, "tokenizer-train") {
      val merges =
        if (fast) BpeTrain.trainMergesFast(docs, textCol, steps)
        else BpeTrain.trainMerges(docs, textCol, steps)
      merges.orderBy("step").write.mode("overwrite").parquet(s"$root/merges")
      val m = spark.read.parquet(s"$root/merges").orderBy("step")
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      val vocabRows = BaseAlphabet.zipWithIndex.map { case (t, i) => (t, i.toLong) } ++
        m.zipWithIndex.map { case ((a, b), i) =>
          (a + b, (BaseAlphabet.size + i).toLong) }
      import spark.implicits._
      vocabRows.toDF("token", "token_id")
        .write.mode("overwrite").parquet(s"$root/vocab")
      StoreMeta.writeJson(spark, root, "tokenizer.json",
        s"""{"version":1,"steps":${m.size},"alphabet":"_0-9a-z"}""",
        overwrite = true)
      Tokenizer(m, vocabRows, 1L)
    }
  }

  /** Load the persisted artifact (merges in step order + vocab). */
  def load(spark: SparkSession, root: String): Tokenizer = {
    val txt = StoreMeta.readJson(spark, root, "tokenizer.json").getOrElse(
      throw new IllegalArgumentException(
        s"$root is not a tokenizer store (no tokenizer.json)"))
    val version = StoreMeta.jsonLong(txt, "version").getOrElse(1L)
    val merges = spark.read.parquet(s"$root/merges").orderBy("step")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val vocab = spark.read.parquet(s"$root/vocab")
      .orderBy("token_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    Tokenizer(merges, vocab, version)
  }

  /** The wrapped-symbol form of a token array column with all merges
    * applied — one codegen'd chain of literal replaces. */
  private def applied(toksCol: Column, merges: Seq[(String, String)]): Column = {
    val wrapped = concat_ws("",
      transform(toksCol, t => concat(
        concat_ws("", transform(filter(split(t, ""), c => c =!= ""),
          c => concat(lit("<"), c, lit(">")))),
        lit("<_>"))))
    merges.foldLeft(wrapped) { case (acc, (a, b)) =>
      call_function("replace", acc, lit(s"<$a><$b>"), lit(s"<$a$b>"))
    }
  }

  /** Encode: one row per input row, with `token_ids` (array<long> of
    * BPE ids under the stored vocab) and `n_bpe_tokens`. Narrow —
    * the merge chain and the vocab map are literals in the plan.
    *
    * Scale note: at the oracle's 8 merges the replace chain and vocab
    * map are trivially codegen'd; a production tokenizer (~30k merges)
    * outgrows a single generated method — apply the merges in chunked
    * sub-projections (e.g. 500 replaces per select, lineage-chained;
    * same arithmetic, each stage still narrow) and swap the literal
    * map for a broadcast symbol→id join. Both reshapes preserve the
    * per-doc values this store's oracle pins. */
  def encodeIds(df: DataFrame, textCol: String, tok: Tokenizer): DataFrame = {
    val symbols = expr(
      s"regexp_extract_all(__wf, '<([^>]*)>', 1)")
    val idMap = map(tok.vocab.flatMap { case (t, i) =>
      Seq(lit(t), lit(i)) }: _*)
    df.withColumn("__wf", applied(TextOps.tokens(col(textCol)), tok.merges))
      .withColumn("token_ids",
        transform(symbols, s => element_at(idMap, s)))
      .withColumn("n_bpe_tokens", size(col("token_ids")).cast("long"))
      .drop("__wf")
  }
}
