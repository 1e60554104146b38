package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TRAINED language identification (round 18, VERDICT r17 #5): a
  * char-bigram profile classifier in the Cavnar–Trenkle n-gram family,
  * replacing the stopword-marker `langGuess` heuristic as the
  * multilingual signal for the mixture/quality gates. The reference
  * framework has no language ID at all (its `SqlServer`/`Cdm`/`Rest`
  * sources move structured rows, not text — see
  * `src/Framework.Sources/` in SneaksAndData/arcane-framework); this is
  * engine-side extension surface for the 100 TB training-data pipeline,
  * where a crawl is full of non-Latin text the ASCII stopword heuristic
  * can only call `unk`.
  *
  * MODEL. Training corpora are PLANTED literals (one seed paragraph per
  * language, Latin and non-Latin scripts alike). For each language the
  * seed's char bigrams are counted with multiplicity; a bigram's
  * RELATIVE FREQUENCY in language L is the fixed-point integer
  *
  * {{{   r(L, g) = (count(L, g) * 1_000_000) / totalBigrams(L)   }}}
  *
  * (integer division — exact and identical in Spark, DuckDB, and plain
  * Scala). Each bigram is OWNED by the language maximizing r (ties go
  * to the earlier language in [[LangOrder]]), with weight r. A
  * document's score for L is the weight-sum of its bigram occurrences
  * owned by L; the verdict is the argmax (ties again by [[LangOrder]]),
  * or `unk` when no bigram is in the trained table. No `ln()` anywhere:
  * log-likelihoods would hash-diverge across libm implementations (the
  * same discipline as the LM-surprise feature, ExtQueries scaladoc at
  * the lm_score block), while the frequency-ratio profile is pure
  * integer arithmetic, so the DuckDB oracle re-derives training AND
  * scoring bit-for-bit from the same literals.
  *
  * SCALE. Training is a pure function of literal constants — computed
  * once on the driver in plain Scala ([[weights]]), no job. Scoring is
  * MAP-ONLY: the trained table (gram vocabulary of the seed paragraphs,
  * a few hundred entries, owner index and weight packed into a long)
  * rides into every task inside the native
  * [[graft.functions.LangBigramScores]] expression — one code-point
  * walk per document, one real HashMap probe per bigram, all language
  * accumulators filled in the same pass. Zero shuffles, zero joins; at
  * 100 TB the cost is one linear pass over the text, the same shape as
  * the text_stats family. */
object LangId {

  /** Deterministic language order: owner and argmax tie-breaks. */
  val LangOrder: Seq[String] = Seq("en", "es", "de", "fr", "ru", "zh")

  /** One seed paragraph per language — the planted training corpora.
    * Lowercase, apostrophe-free (they are embedded in SQL literals),
    * function-word-rich for the Latin languages, native script for the
    * non-Latin ones. */
  val Seeds: Seq[(String, String)] = Seq(
    "en" -> ("the quick brown fox jumps over the lazy dog and the small " +
      "house near the river is quiet in the morning light while the " +
      "children walk to school with their friends and talk about the day"),
    "es" -> ("el perro corre por la calle y los ninos juegan en el parque " +
      "mientras una senora compra pan caliente por la manana y habla con " +
      "sus amigas sobre las cosas que pasan en el pueblo cada semana"),
    "de" -> ("der hund lauft durch die strasse und die kinder spielen im " +
      "park wahrend eine frau frisches brot kauft und nicht mit dem zug " +
      "zur arbeit fahrt sondern zu fuss geht und die blumen betrachtet"),
    "fr" -> ("le chien court dans la rue et les enfants jouent dans le " +
      "parc pendant que une femme achete du pain frais pour le petit " +
      "dejeuner et parle avec ses amies des choses de la vie du village"),
    "ru" -> ("собака бежит по улице и дети играют в парке пока женщина " +
      "покупает свежий хлеб утром и разговаривает со своими подругами " +
      "возле реки о погоде и планах на следующую неделю в деревне"),
    "zh" -> ("狗在街上跑孩子们在公园里玩耍一位女士早上买新鲜的面包并且" +
      "在河边和朋友们聊天天气很好大家都很开心准备下个星期去乡村看望家人"))

  private val RScale = 1000000L
  /** Weights pack as ownerIdx * 2^20 + r; r < 2^20 by construction
    * (r <= RScale = 1e6 < 1_048_576). */
  private val Pack = 1048576L

  private def bigramsOf(s: String): Seq[String] = {
    // a surrogate pair is ONE character to Spark/DuckDB substring —
    // seeds stay in the BMP so JVM char-bigrams equal SQL char-bigrams.
    // `require`, not `.ensuring`: assertions are elided under
    // -Xdisable-assertions and this invariant must survive (ADVICE r18).
    require(!s.exists(Character.isSurrogate), "seed text must be BMP-only")
    (0 until s.length - 1).map(i => s.substring(i, i + 2))
  }

  /** The trained table: gram -> (ownerIdx, r), derived driver-side from
    * [[Seeds]] with integer arithmetic only. */
  lazy val weights: Map[String, (Int, Long)] = {
    val perLang = Seeds.map { case (lang, txt) =>
      val gs = bigramsOf(txt)
      val tot = gs.size.toLong
      lang -> gs.groupBy(identity).map { case (g, occ) =>
        g -> (occ.size.toLong * RScale) / tot
      }
    }.toMap
    val allGrams = perLang.valuesIterator.flatMap(_.keysIterator).toSet
    allGrams.iterator.map { g =>
      val best = LangOrder.zipWithIndex
        .map { case (l, i) => (perLang(l).getOrElse(g, 0L), i) }
        .maxBy { case (r, i) => (r, -i.toLong) } // max r, earliest lang wins ties
      g -> (best._2, best._1)
    }.toMap
  }

  /** The per-language score vector (aligned with [[LangOrder]]) over a
    * text column — ONE code-point walk, one HashMap probe per bigram,
    * via the native [[graft.functions.LangBigramScores]] expression
    * (a literal-map `element_at` probe is a linear table scan per
    * bigram; the native form is what lets the gate disappear into a
    * 100 TB scan). Null text coalesces to the zero vector (→ `unk`),
    * matching the declarative formulation's empty-gram behavior. */
  def scoresArrayCol(textCol: Column): Column = {
    val packed = weights.toSeq.map { case (g, (o, r)) => g -> (o * Pack + r) }
    coalesce(
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.functions.LangBigramScores(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(textCol),
          packed, LangOrder.size)),
      typedlit(Seq.fill(LangOrder.size)(0L)))
  }

  /** Argmax verdict over a MATERIALIZED score-vector column (ties to
    * the earlier language in [[LangOrder]]; all-zero → `unk`). Call
    * sites bind `arrCol` to a real column (withColumn) so the scoring
    * pass runs once however many times the verdict references it. */
  def verdictOf(arrCol: Column): Column = verdictOfOrder(arrCol, LangOrder)

  /** [[verdictOf]] generalized to any language order — shared by the
    * seed model and operator-trained [[LangModel]]s. */
  def verdictOfOrder(arrCol: Column, order: Seq[String]): Column = {
    val scores = order.indices.map(i => element_at(arrCol, i + 1))
    order.zipWithIndex.reverse
      .foldLeft(lit("unk")) { case (els, (lang, idx)) =>
        val later = scores.drop(idx + 1)
        val cond = later.foldLeft(scores(idx) > 0L)((c, o) => c && scores(idx) >= o)
        when(cond, lit(lang)).otherwise(els)
      }
  }

  /** doc_id, s_<lang>..., lang_id2 over (doc_id, text). */
  def classify(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("__lang_scores", scoresArrayCol(col(textCol)))
      .select(Seq(col(idCol)) ++
        LangOrder.zipWithIndex.map { case (l, i) =>
          element_at(col("__lang_scores"), i + 1).as(s"s_$l") } :+
        verdictOf(col("__lang_scores")).as("lang_id2"): _*)

  /** The DuckDB replay: re-derive training from the same seed literals
    * (counts, integer-division ratios, owner election) and score by
    * join + group + argmax — value-identical to the literal-map fold.
    * `docsRel` must expose (doc_id, text). */
  def oracleCtes(docsRel: String): String = {
    val seedRows = Seeds.zipWithIndex.map { case ((l, t), i) =>
      s"('$l', $i, '$t')"
    }.mkString(",\n    ")
    val scoreCols = LangOrder.map(l =>
      s"coalesce(sum(CASE WHEN w.lang = '$l' THEN w.r ELSE 0 END), 0)::BIGINT AS s_$l")
      .mkString(",\n    ")
    val caseArms = LangOrder.zipWithIndex.map { case (l, i) =>
      val conds = (s"s_$l > 0" +: LangOrder.drop(i + 1).map(o => s"s_$l >= s_$o"))
        .mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString("\n       ")
    s"""lid_seeds(lang, ord, txt) AS (VALUES
       |    $seedRows),
       |lid_grams AS (SELECT lang, ord,
       |    unnest(list_transform(generate_series(1, length(txt) - 1),
       |      i -> substring(txt, i, 2))) AS g
       |  FROM lid_seeds),
       |lid_counts AS (SELECT lang, ord, g, count(*)::BIGINT AS c
       |  FROM lid_grams GROUP BY lang, ord, g),
       |lid_tots AS (SELECT lang, (length(txt) - 1)::BIGINT AS tot FROM lid_seeds),
       |lid_r AS (SELECT c.lang, c.ord, c.g, (c.c * ${RScale}) // t.tot AS r
       |  FROM lid_counts c JOIN lid_tots t ON t.lang = c.lang),
       |lid_w AS (SELECT g, lang, r FROM (
       |    SELECT g, lang, r,
       |      row_number() OVER (PARTITION BY g ORDER BY r DESC, ord ASC) AS rn
       |    FROM lid_r) WHERE rn = 1),
       |lid_doc_grams AS (SELECT doc_id,
       |    unnest(list_transform(generate_series(1, length(text) - 1),
       |      i -> substring(text, i, 2))) AS g
       |  FROM $docsRel WHERE length(text) >= 2),
       |lid_scores AS (SELECT dg.doc_id,
       |    $scoreCols
       |  FROM lid_doc_grams dg LEFT JOIN lid_w w ON w.g = dg.g
       |  GROUP BY dg.doc_id),
       |lid_out AS (SELECT d.doc_id,
       |    ${LangOrder.map(l => s"coalesce(s.s_$l, 0)::BIGINT AS s_$l").mkString(", ")},
       |    CASE
       |       $caseArms
       |       ELSE 'unk' END AS lang_id2
       |  FROM $docsRel d LEFT JOIN lid_scores s ON s.doc_id = d.doc_id)""".stripMargin
  }

  // -------------------------------------------------------------------
  // OPERATOR-TRAINED MODELS (round 19, VERDICT r18 #5): profiles from
  // a labeled DataFrame instead of the in-repo seed literals — adding
  // a language is DATA, not a source edit. Same integer fixed-point
  // contract (count·1e6 // totalBigrams, owner = max-r with
  // earlier-language tie-break), plus a deterministic top-K gram cap
  // per language so a corpus-sized training set yields a bounded,
  // shippable table (Cavnar–Trenkle's profile truncation; rank =
  // count DESC, gram ASC — replayable in any engine).
  // -------------------------------------------------------------------

  /** A trained model: deterministic language order (lexicographic
    * over the training labels) + gram → (ownerIdx, r) weights. */
  final case class LangModel(order: Seq[String],
      weights: Map[String, (Int, Long)])

  /** Grams per language a trained profile keeps ([[train]] default). */
  val DefaultProfileGrams = 64

  /** Train a model from a labeled corpus — `labeled(langCol, textCol)`,
    * one row per labeled text (multi-row per language welcome).
    * Distributed: one explode+groupBy over the training text (linear,
    * the text_cooccurrence shape), a per-language top-K window over
    * gram counts, then a bounded collect (≤ languages × topK rows).
    * All arithmetic integer, so any engine replays training from the
    * same labeled table bit-for-bit. */
  def train(labeled: DataFrame, langCol: String, textCol: String,
      topK: Int = DefaultProfileGrams): LangModel = {
    import org.apache.spark.sql.expressions.Window
    // length >= 2 filter, not sequence(1, len-1) alone: Spark's
    // sequence(1, 0) DESCENDS ([1, 0]) where SQL generate_series is
    // empty — short rows must be excluded before the explode
    val grams = labeled.filter(length(col(textCol)) >= 2)
      .select(col(langCol).as("__lang"),
        explode(expr(
          s"transform(sequence(1, length($textCol) - 1), " +
            s"i -> substring($textCol, i, 2))")).as("g"))
    val counts = grams.groupBy("__lang", "g")
      .agg(count(lit(1)).cast("long").as("c"))
    val tots = labeled.groupBy(col(langCol).as("__lang"))
      .agg(sum(greatest(length(col(textCol)) - 1, lit(0)))
        .cast("long").as("tot"))
    val capped = counts
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__lang").orderBy(col("c").desc, col("g").asc)))
      .filter(col("__rn") <= topK)
      .join(tots, Seq("__lang"))
      .select(col("__lang"), col("g"),
        expr(s"(c * ${RScale}L) div tot").as("r"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val order = capped.map(_._1).distinct.sorted.toSeq
    val ordIdx = order.zipWithIndex.toMap
    val weights = capped.groupBy(_._2).map { case (g, rows) =>
      val best = rows.map { case (l, _, r) => (r, ordIdx(l)) }
        .maxBy { case (r, i) => (r, -i.toLong) }
      g -> (best._2, best._1)
    }
    require(weights.valuesIterator.forall(_._2 < Pack),
      "profile ratio exceeds the packing bound")
    LangModel(order, weights.toMap)
  }

  /** [[train]]'s arithmetic on driver-side literal rows (round 20):
    * the per-language quality gate's partition model trains on a few
    * PLANTED (lang, text) literals, so paying a Spark job for three
    * rows is waste — this computes the identical integer contract
    * (count·1e6 // totalBigrams, top-K cap by count DESC / gram ASC,
    * owner = max-r with earlier-language ties, order = sorted labels)
    * in plain Scala. Equality with [[train]] on the same rows is
    * spec-pinned (TextQualityMlSpec). */
  def trainLocal(rows: Seq[(String, String)],
      topK: Int = DefaultProfileGrams): LangModel = {
    val capped: Seq[(String, String, Long)] = rows.groupBy(_._1).toSeq
      .flatMap { case (lang, rs) =>
        val gs = rs.map(_._2).filter(_.length >= 2).flatMap(bigramsOf)
        val tot = rs.map(t => math.max(t._2.length - 1, 0).toLong).sum
        gs.groupBy(identity).toSeq
          .map { case (g, occ) => (g, occ.size.toLong) }
          .sortBy { case (g, c) => (-c, g) }
          .take(topK)
          .map { case (g, c) => (lang, g, (c * RScale) / tot) }
      }
    // order from languages that KEPT a gram — [[train]]'s exact
    // derivation (a label whose rows are all sub-bigram contributes
    // no profile and no order slot)
    val order = capped.map(_._1).distinct.sorted
    val ordIdx = order.zipWithIndex.toMap
    val weights = capped.groupBy(_._2).map { case (g, rs) =>
      val best = rs.map { case (l, _, r) => (r, ordIdx(l)) }
        .maxBy { case (r, i) => (r, -i.toLong) }
      g -> (best._2, best._1)
    }
    require(weights.valuesIterator.forall(_._2 < Pack),
      "profile ratio exceeds the packing bound")
    LangModel(order, weights.toMap)
  }

  /** ARGMAX language index in ONE native walk (round 19): 0-based
    * position in [[LangOrder]], -1 for `unk`/null text. Exists for
    * call sites whose downstream plan rewriting (filter pushdown,
    * project collapse) would clone an array-scored verdict into every
    * reference — the int form keeps the gate at one walk per row
    * however many copies the optimizer plants (each copy IS the whole
    * verdict). Value-identical to `verdictOf(scoresArrayCol(...))`
    * by the strictly-greater/earlier-ties argmax. */
  def bestIdxCol(textCol: Column): Column =
    bestIdxPacked(weights, LangOrder.size, textCol)

  /** [[bestIdxCol]] for a trained model. */
  def bestIdxColOf(model: LangModel, textCol: Column): Column =
    bestIdxPacked(model.weights, model.order.size, textCol)

  private def bestIdxPacked(w: Map[String, (Int, Long)], n: Int,
      textCol: Column): Column = {
    val packed = w.toSeq.map { case (g, (o, r)) => g -> (o * Pack + r) }
    coalesce(
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.functions.LangBigramBest(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(textCol),
          packed, n)),
      lit(-1))
  }

  /** [[scoresArrayCol]] for a trained model (same native expression,
    * the model's own language order). */
  def scoresArrayColOf(model: LangModel, textCol: Column): Column = {
    val packed = model.weights.toSeq.map { case (g, (o, r)) =>
      g -> (o * Pack + r) }
    coalesce(
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.functions.LangBigramScores(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(textCol),
          packed, model.order.size)),
      typedlit(Seq.fill(model.order.size)(0L)))
  }

  /** doc_id, s_<lang>..., verdict under a trained model. */
  def classifyWith(model: LangModel, df: DataFrame, idCol: String,
      textCol: String, verdictName: String = "lang_id3"): DataFrame =
    df.withColumn("__lang_scores", scoresArrayColOf(model, col(textCol)))
      .select(Seq(col(idCol)) ++
        model.order.zipWithIndex.map { case (l, i) =>
          element_at(col("__lang_scores"), i + 1).as(s"s_$l") } :+
        verdictOfOrder(col("__lang_scores"), model.order)
          .as(verdictName): _*)

  /** PERSISTED PROFILE STORE (round 19 follow-through): ship a trained
    * model like the tokenizer/quantizer artifacts — `profile/` parquet
    * (lang, ord, g, r: the capped owner table) + `langid.json`
    * (version, language order) under a leased root. The gates accept a
    * profile path, so a deployment's language policy runs on ITS
    * trained model, not the in-repo seeds. */
  def save(spark: SparkSession, model: LangModel, root: String): Unit = {
    import spark.implicits._
    // langid.json is emitted by interpolation and parsed by regex: a
    // label carrying a quote/backslash/comma/']' would write a corrupt
    // or mis-parsed store SILENTLY — refuse at save time (ADVICE r19)
    model.order.foreach(l => require(l.matches("[a-z0-9_-]+"),
      s"language label '$l' must match [a-z0-9_-]+ to persist safely"))
    StoreMeta.withWriterLease(spark, root, "langid-train") {
      model.weights.toSeq
        .map { case (g, (o, r)) => (model.order(o), o, g, r) }
        .sortBy { case (_, o, g, _) => (o, g) }
        .toDF("lang", "ord", "g", "r")
        .coalesce(1).write.mode("overwrite").parquet(s"$root/profile")
      StoreMeta.writeJson(spark, root, "langid.json",
        s"""{"version":1,"order":[${model.order
          .map(l => "\"" + l + "\"").mkString(",")}]}""",
        overwrite = true)
      ()
    }
  }

  /** Load a persisted profile store (see [[save]]). */
  def loadModel(spark: SparkSession, root: String): LangModel = {
    val txt = StoreMeta.readJson(spark, root, "langid.json").getOrElse(
      throw new IllegalArgumentException(
        s"$root is not a langid store (no langid.json)"))
    val order = """"order"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(txt)
      .map(_.group(1).split(',').toSeq
        .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty))
      .getOrElse(throw new IllegalArgumentException(
        s"$root/langid.json has no order array"))
    val weights = spark.read.parquet(s"$root/profile")
      .select("g", "ord", "r").collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
    require(weights.valuesIterator.forall { case (o, r) =>
      o >= 0 && o < order.size && r >= 0L && r < Pack },
      s"$root/profile carries owner/ratio values outside the packed contract")
    LangModel(order, weights)
  }

  /** The DuckDB replay of [[train]] + [[classifyWith]] over a planted
    * labeled VALUES relation: re-derives per-row grams, counts, the
    * top-K cap (count DESC, gram ASC), integer ratios, owner election,
    * and the per-doc argmax. `rows` are (lang, text) literals —
    * apostrophe-free; `docsRel` must expose (doc_id, text). CTE names
    * are `l3_`-prefixed so the block composes with [[oracleCtes]]. */
  def trainedOracleCtes(rows: Seq[(String, String)], docsRel: String,
      topK: Int = DefaultProfileGrams): String = {
    // gram-less labels (every row shorter than 2 chars) keep no profile
    // and no order slot in [[train]] — mirror that here (ADVICE r19) so
    // degenerate training sets replay instead of growing a phantom
    // s_<lang> column with shifted tie-break indices
    val order = rows.filter(_._2.length >= 2).map(_._1).distinct.sorted
    val seedRows = rows.map { case (l, t) => s"('$l', '$t')" }
      .mkString(",\n    ")
    val ordArms = order.zipWithIndex
      .map { case (l, i) => s"WHEN c.lang = '$l' THEN $i" }.mkString(" ")
    val scoreCols = order.map(l =>
      s"coalesce(sum(CASE WHEN w.lang = '$l' THEN w.r ELSE 0 END), 0)::BIGINT AS s_$l")
      .mkString(",\n    ")
    val caseArms = order.zipWithIndex.map { case (l, i) =>
      val conds = (s"s_$l > 0" +: order.drop(i + 1).map(o => s"s_$l >= s_$o"))
        .mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString("\n       ")
    s"""l3_seeds(lang, txt) AS (VALUES
       |    $seedRows),
       |l3_grams AS (SELECT lang,
       |    unnest(list_transform(generate_series(1, length(txt) - 1),
       |      i -> substring(txt, i, 2))) AS g
       |  FROM l3_seeds WHERE length(txt) >= 2),
       |l3_counts AS (SELECT lang, g, count(*)::BIGINT AS c
       |  FROM l3_grams GROUP BY lang, g),
       |l3_capped AS (SELECT lang, g, c FROM (
       |    SELECT lang, g, c,
       |      row_number() OVER (PARTITION BY lang ORDER BY c DESC, g ASC) AS rn
       |    FROM l3_counts) WHERE rn <= $topK),
       |l3_tots AS (SELECT lang,
       |    sum(greatest(length(txt) - 1, 0))::BIGINT AS tot
       |  FROM l3_seeds GROUP BY lang),
       |l3_r AS (SELECT c.lang AS lang,
       |    (CASE $ordArms END) AS ord, c.g AS g,
       |    (c.c * ${RScale}) // t.tot AS r
       |  FROM l3_capped c JOIN l3_tots t ON t.lang = c.lang),
       |l3_w AS (SELECT g, lang, r FROM (
       |    SELECT g, lang, r,
       |      row_number() OVER (PARTITION BY g ORDER BY r DESC, ord ASC) AS rn
       |    FROM l3_r) WHERE rn = 1),
       |l3_doc_grams AS (SELECT doc_id,
       |    unnest(list_transform(generate_series(1, length(text) - 1),
       |      i -> substring(text, i, 2))) AS g
       |  FROM $docsRel WHERE length(text) >= 2),
       |l3_scores AS (SELECT dg.doc_id,
       |    $scoreCols
       |  FROM l3_doc_grams dg LEFT JOIN l3_w w ON w.g = dg.g
       |  GROUP BY dg.doc_id),
       |l3_out AS (SELECT d.doc_id,
       |    ${order.map(l => s"coalesce(s.s_$l, 0)::BIGINT AS s_$l").mkString(", ")},
       |    CASE
       |       $caseArms
       |       ELSE 'unk' END AS lang_id3
       |  FROM $docsRel d LEFT JOIN l3_scores s ON s.doc_id = d.doc_id)""".stripMargin
  }
}
