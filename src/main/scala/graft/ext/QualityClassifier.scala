package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** COMPOSITE QUALITY CLASSIFIER (VERDICT r12 #7): one TRAINED linear
  * keep/drop scorer over the per-doc quality features this engine
  * already extracts — token stats, repetition, stopword (language)
  * rate, n-gram LM surprise — the standard last gate before corpus
  * sampling ([[ExtQueries.pipelineSampleMix]] composes after it).
  *
  * The fit is CLOSED-FORM diagonal LDA — no SGD, no iterations: per
  * feature j and class c, the engine aggregates exact integer
  * (count, sum, sum-of-squares); the weight is
  * `w_j = (mean_keep − mean_drop) / (pooledVar + 1)` and the score is
  * `Σ_j w_j · (x_j − midpoint_j)`, thresholded at 0. Everything before
  * the division is exact long arithmetic; everything after is a FIXED
  * expression tree of IEEE primitives (+,−,×,÷ are correctly rounded,
  * so Spark and DuckDB produce bit-identical doubles given identical
  * trees — the engine-wide oracle discipline, see `text_lm_score`).
  * The final score is floored to e6 fixed point (floor, not round:
  * scores are signed and round's half-up vs half-away differ below
  * zero).
  *
  * Scale shape: feature extraction is the engine's existing linear
  * passes (token explode, shingle groupBy, bigram join against the
  * corpus-trained LM counts); the FIT reads one 2-row aggregate
  * (bounded driver collect) and scoring is a map-only pass with
  * literal weights — at 100 TB the only corpus-sized jobs are the
  * feature passes themselves.
  */
object QualityClassifier {

  /** The five feature columns, in the FIXED order both engines sum
    * score terms in (left-associated — order is part of the bit
    * contract). */
  val FeatureCols: Seq[String] = Seq("x1", "x2", "x3", "x4", "x5")

  /** Cap on the LM mean-surprise feature before the e5 downscale: an
    * all-OOV doc's mean inverse probability is ~10·N·1e6 (corpus-
    * sized — far past the cap, so gibberish saturates at x5 = 1e5),
    * while ordinary prose stays well below it; and the capped value's
    * SQUARE must stay inside exact long aggregation —
    * `least(ms, 1e10) // 1e5` bounds x5 at 1e5, whose square times
    * any realistic doc count fits comfortably. */
  val LmSurpriseCap = 10000000000L

  /** Per-feature fitted parameters: `w` the LDA weight, `mid` the
    * class-midpoint the feature is centered on. */
  final case class FeatureFit(w: Double, mid: Double)

  /** The four PER-DOC feature columns (x1..x4) — computable from the
    * document text alone as pure column expressions, no corpus-trained
    * LM tables: the feature set the STREAMING quality tier scores
    * arrivals with ([[graft.streaming.StreamingDecision]]'s
    * `drop_quality`, VERDICT r13 #2). x5 (LM surprise) needs the
    * corpus-sized bigram tables and stays batch-only. */
  val LocalFeatureCols: Seq[String] = Seq("x1", "x2", "x3", "x4")

  /** Append x1..x4 ([[LocalFeatureCols]]) plus a `__q_has` support
    * flag as MAP-ONLY expressions — no explode, no groupBy: x4's
    * shingle counts come from array length vs distinct length, the
    * same integer arithmetic as [[features]]' grouped form. Docs
    * without shingle support (`size(toks) < shingleN` — the exclusion
    * rule [[features]] applies by filter) get `__q_has = false` and
    * null ratio features; callers gate the verdict on `__q_has`. */
  def withLocalFeatures(df: DataFrame, textCol: String,
      stopWords: Seq[String], shingleN: Int = 3,
      tok: Column => Column = TextOps.tokens): DataFrame =
    df.withColumn("__toks", tok(col(textCol)))
      .withColumn("__q_has", size(col("__toks")) >= shingleN)
      // shingles() must not see < shingleN tokens (descending-sequence
      // trap) — null toks short-circuit the whole chain to null
      .withColumn("__sh",
        when(col("__q_has"), TextOps.shingles(col("__toks"), shingleN)))
      .withColumn("x1", size(col("__toks")).cast("long"))
      .withColumn("x2",
        expr("(size(array_distinct(__toks)) * 10000L) div size(__toks)"))
      .withColumn("__hits", TextOps.wordListHits(col("__toks"), stopWords))
      .withColumn("x3", expr("(__hits * 10000L) div size(__toks)"))
      .withColumn("x4",
        expr("((size(__sh) - size(array_distinct(__sh))) * 10000L) div size(__sh)"))
      .drop("__hits")

  /** The corpus-trained Jelinek-Mercer bigram LM the x5 feature scores
    * against, as three count tables plus the two vocabulary scalars.
    * The tables are VOCABULARY-sized (bigram/unigram types, not corpus
    * tokens) — bounded by language, not data, so a streaming deployment
    * broadcasts them into every micro-batch plan
    * ([[graft.streaming.StreamingDecision]]'s 5-feature quality tier)
    * while the batch path shuffle-joins them (at 100 TB the bigram-type
    * table can exceed broadcast thresholds). */
  final case class LmModel(cb: DataFrame, cp: DataFrame, u: DataFrame,
      vn: Long, nn: Long)

  /** Bigram pairs (a, b) of each row's token array — the shared
    * explode both LM training and scoring use. */
  private def bigramPairs(src: DataFrame, id: Column, toks: Column): DataFrame = src
    .select(id.as("__bid"), toks.as("__btoks"))
    .filter(size(col("__btoks")) >= 2)
    .select(col("__bid"), explode(expr(
      "transform(sequence(1, size(__btoks) - 1), i -> struct(element_at(__btoks, i) AS a, element_at(__btoks, i + 1) AS b))"))
      .as("p"))
    .select(col("__bid"), col("p.a").as("a"), col("p.b").as("b"))

  /** Train the bigram LM on `corpus` (the CLEAN reference text — junk
    * being classified must not pollute the language model). With
    * `materialize` (the STREAMING posture, default) the count tables
    * are checkpointed once (vocabulary-sized, MEMORY_AND_DISK) so a
    * deployment scoring every micro-batch re-reads small materialized
    * tables instead of re-running the corpus-sized training
    * aggregation per trigger; a single-use batch scoring pass
    * ([[features]]) passes `materialize = false` — there the eager
    * pass is pure overhead and the lazy plans fold into the one
    * scoring job. The two scalars are one bounded 1-row collect either
    * way. */
  def trainLm(corpus: DataFrame, idCol: String, textCol: String,
      materialize: Boolean = true,
      tok: Column => Column = TextOps.tokens): LmModel = {
    def mat(df: DataFrame): DataFrame =
      if (materialize) df.localCheckpoint(true) else df
    val ctoks = corpus.select(col(idCol), tok(col(textCol)).as("__ctoks"))
    val trainBig = bigramPairs(ctoks, col(idCol), col("__ctoks"))
    val cb = mat(trainBig.groupBy("a", "b").agg(count(lit(1)).as("c")))
    val cp = mat(trainBig.groupBy("a").agg(count(lit(1)).as("cpn")))
    val unis = ctoks.select(explode(col("__ctoks")).as("t"))
    val u = mat(unis.groupBy("t").agg(count(lit(1)).as("cu"))
      .withColumnRenamed("t", "b"))
    val vRow = unis.agg(countDistinct(col("t")).as("vn"), count(lit(1)).as("nn")).head()
    LmModel(cb, cp, u, vRow.getAs[Long]("vn"), vRow.getAs[Long]("nn"))
  }

  /** x5 (capped mean bigram surprise, e1 after the e5 downscale) for
    * every row of `sf` that has ≥ 2 tokens in `toksCol` — THE pinned
    * arithmetic both engines and both deployment shapes (batch
    * shuffle-join, streaming broadcast-join) share. `broadcastLm`
    * plants broadcast hints on the three count tables — correct when
    * they are vocabulary-sized (a micro-batch plan); leave false for
    * corpus-scale batch training passes and let AQE pick. */
  def withLmFeature(sf: DataFrame, idCol: String, toksCol: String,
      lm: LmModel, broadcastLm: Boolean = false): DataFrame = {
    def side(df: DataFrame): DataFrame = if (broadcastLm) broadcast(df) else df
    bigramPairs(sf, col(idCol), col(toksCol))
      .join(side(lm.cb), Seq("a", "b"), "left")
      .join(side(lm.cp), Seq("a"), "left")
      .join(side(lm.u), Seq("b"), "left")
      .withColumn("pb",
        when(col("c").isNotNull,
          col("c").cast("double") / col("cpn").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("pu",
        (coalesce(col("cu"), lit(0L)) + lit(1L)).cast("double")
          / lit(lm.nn + lm.vn).cast("double"))
      // the cap applies PER TERM before the long cast (ADVICE r13): an
      // OOV bigram's surprise is ~1e7·(nn+vn), which past ~1e12 corpus
      // tokens exceeds Long.MaxValue as a double — where Spark's cast
      // saturates but DuckDB's errors. Capping the double first keeps
      // the arithmetic exact-long on both engines at any corpus scale
      // (and makes the per-doc mean cap a no-op, kept for the pinned
      // oracle shape).
      .withColumn("term",
        least(
          round(lit(1000000.0) / (lit(0.9) * col("pb") + lit(0.1) * col("pu"))),
          lit(LmSurpriseCap.toDouble))
          .cast("long"))
      .groupBy("__bid")
      .agg(expr(s"least(sum(term) DIV count(1), ${LmSurpriseCap}L) DIV 100000").as("x5"))
      .withColumnRenamed("__bid", idCol)
  }

  /** Integer quality features for every `scored` doc, with the LM
    * trained on `corpus` (the CLEAN reference text — junk being
    * classified must not pollute the language model):
    *  - x1 = n_tokens
    *  - x2 = unique-token ratio (e4)
    *  - x3 = stopword-hit ratio (e4) — the language-id family signal
    *  - x4 = duplicate-shingle ratio (e4) — the repetition signal
    *  - x5 = capped mean bigram surprise (e1 after the e5 downscale;
    *    gibberish saturates at the cap, prose stays far below)
    * Docs with fewer than 3 tokens are excluded (no shingle/bigram
    * support — the pipeline drops them before this gate anyway).
    * Carries through every non-feature column of `scored` (label,
    * etc.). */
  def features(scored: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, stopWords: Seq[String],
      shingleN: Int = 3,
      tok: Column => Column = TextOps.tokens): DataFrame = {
    val sf = scored
      .withColumn("__toks", tok(col(textCol)))
      .filter(size(col("__toks")) >= shingleN)
    val f13 = sf
      .withColumn("x1", size(col("__toks")).cast("long"))
      .withColumn("x2",
        expr("(size(array_distinct(__toks)) * 10000L) div size(__toks)"))
      .withColumn("__hits", TextOps.wordListHits(col("__toks"), stopWords))
      .withColumn("x3", expr("(__hits * 10000L) div size(__toks)"))
      .drop("__hits")
    // x4: duplicate-shingle ratio (text_repetition's integer form)
    val sh = sf.select(col(idCol),
        explode(TextOps.shingles(col("__toks"), shingleN)).as("s"))
      .groupBy(idCol, "s").agg(count(lit(1)).as("c"))
      .groupBy(idCol)
      .agg(sum(col("c")).as("ns"), count(lit(1)).as("nd"))
      .select(col(idCol),
        expr("((ns - nd) * 10000) div ns").cast("long").as("x4"))
    // x5: mean bigram surprise under a Jelinek-Mercer bigram LM
    // trained on the clean corpus (text_lm_score's arithmetic) — the
    // shared trainLm/withLmFeature pieces, shuffle-join shape (the
    // (nn + vn) scalar sum is exact long arithmetic either way, so the
    // literal form produces the bit-identical double the old
    // crossJoin(v) column form did)
    val lm = withLmFeature(sf, idCol, "__toks",
      trainLm(corpus, idCol, textCol, materialize = false, tok = tok))
    f13.drop("__toks").join(sh, Seq(idCol)).join(lm, Seq(idCol))
  }

  /** Closed-form diagonal-LDA fit from ONE bounded aggregate: per
    * class, (count, Σx_j, Σx_j²) for each feature — exact longs — then
    * the pinned double expression tree per feature. `keepLabel` rows
    * are the positive class. */
  def fit(feats: DataFrame, labelCol: String,
      keepLabel: Long = 1L,
      cols: Seq[String] = FeatureCols): Seq[FeatureFit] = {
    val aggCols = cols.flatMap(c =>
      Seq(sum(col(c)).as(s"s_$c"), sum(col(c) * col(c)).as(s"q_$c")))
    val rows = feats.groupBy(col(labelCol))
      .agg(count(lit(1)).as("n"), aggCols: _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    require(rows.size == 2, s"fit needs exactly 2 classes, got ${rows.keySet}")
    val k = rows(keepLabel)
    val j = rows.collect { case (l, r) if l != keepLabel => r }.head
    val nK = k.getAs[Long]("n"); val nJ = j.getAs[Long]("n")
    cols.map { c =>
      val sK = k.getAs[Long](s"s_$c"); val qK = k.getAs[Long](s"q_$c")
      val sJ = j.getAs[Long](s"s_$c"); val qJ = j.getAs[Long](s"q_$c")
      // the PINNED expression tree — DuckDB mirrors it token for token
      val mK = sK.toDouble / nK
      val mJ = sJ.toDouble / nJ
      val vK = qK.toDouble / nK - mK * mK
      val vJ = qJ.toDouble / nJ - mJ * mJ
      val pooled = (vK * nK + vJ * nJ) / (nK + nJ)
      FeatureFit((mK - mJ) / (pooled + 1.0), (mK + mJ) / 2.0)
    }
  }

  /** Score with literal fitted weights — map-only:
    * `score_e6 = floor(Σ_j w_j · (x_j − mid_j) · 1e6)` (terms summed
    * left-associated in [[FeatureCols]] order), `keep = score ≥ 0`. */
  def score(feats: DataFrame, fits: Seq[FeatureFit],
      cols: Seq[String] = FeatureCols): DataFrame = {
    require(fits.size == cols.size, "one fit per feature")
    val terms = cols.zip(fits).map { case (c, f) =>
      (col(c).cast("double") - lit(f.mid)) * lit(f.w)
    }
    val s = terms.reduceLeft(_ + _)
    feats
      .withColumn("score_e6", floor(s * lit(1000000.0)).cast("long"))
      .withColumn("keep",
        when(col("score_e6") >= 0L, 1L).otherwise(0L))
  }

  /** PER-PARTITION [[fit]] (round 20, VERDICT r19 #2): one grouped
    * exact aggregate over (`keyCol`, `labelCol`), then the pinned
    * per-feature expression tree per key — the CCNet-style
    * per-language fit on the trained-verdict partition key. Keys
    * missing either class are ABSENT from the result (callers remap
    * those docs to their global-fallback key BEFORE fitting). Bounded:
    * 2 × key-cardinality rows collected. */
  def fitByKey(feats: DataFrame, keyCol: String, labelCol: String,
      keepLabel: Long = 1L,
      cols: Seq[String] = FeatureCols): Map[String, Seq[FeatureFit]] = {
    val aggCols = cols.flatMap(c =>
      Seq(sum(col(c)).as(s"s_$c"), sum(col(c) * col(c)).as(s"q_$c")))
    val rows = feats.groupBy(col(keyCol), col(labelCol))
      .agg(count(lit(1)).as("n"), aggCols: _*)
      .collect()
    rows.groupBy(_.getString(0)).collect {
      case (key, rs) if rs.map(_.getLong(1)).toSet.size == 2 =>
        val byLabel = rs.map(r => r.getLong(1) -> r).toMap
        val k = byLabel(keepLabel)
        val j = byLabel.collect { case (l, r) if l != keepLabel => r }.head
        val nK = k.getAs[Long]("n"); val nJ = j.getAs[Long]("n")
        key -> cols.map { c =>
          val sK = k.getAs[Long](s"s_$c"); val qK = k.getAs[Long](s"q_$c")
          val sJ = j.getAs[Long](s"s_$c"); val qJ = j.getAs[Long](s"q_$c")
          // the same pinned tree [[fit]] evaluates
          val mK = sK.toDouble / nK
          val mJ = sJ.toDouble / nJ
          val vK = qK.toDouble / nK - mK * mK
          val vJ = qJ.toDouble / nJ - mJ * mJ
          val pooled = (vK * nK + vJ * nJ) / (nK + nJ)
          FeatureFit((mK - mJ) / (pooled + 1.0), (mK + mJ) / 2.0)
        }
    }
  }

  /** [[score]] under per-key fits: the key column selects its
    * partition's literal weight tree through a when-chain (key
    * cardinality is language-bounded, so this stays MAP-ONLY — no
    * weights join). Every row's key must be present in `fits`. */
  def scoreByKey(feats: DataFrame, keyCol: String,
      fits: Map[String, Seq[FeatureFit]],
      cols: Seq[String] = FeatureCols): DataFrame = {
    require(fits.nonEmpty, "scoreByKey needs at least one fitted key")
    val branches = fits.toSeq.sortBy(_._1).map { case (k, fs) =>
      require(fs.size == cols.size, s"one fit per feature for key '$k'")
      val terms = cols.zip(fs).map { case (c, f) =>
        (col(c).cast("double") - lit(f.mid)) * lit(f.w)
      }
      k -> terms.reduceLeft(_ + _)
    }
    val s = branches.tail
      .foldLeft(when(col(keyCol) === branches.head._1, branches.head._2)) {
        case (acc, (k, e)) => acc.when(col(keyCol) === k, e)
      }
    feats
      .withColumn("score_e6", floor(s * lit(1000000.0)).cast("long"))
      .withColumn("keep",
        when(col("score_e6") >= 0L, 1L).otherwise(0L))
  }
}
