package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reproducible drivers for the round-17 operational-scale records in
  * SCALE_LOCAL.json / BASELINE.md — the previously ad-hoc evidence
  * runs, kept in-tree so a future round re-records with one command.
  *
  * Modes:
  *  - `incremental <x100Dir> <workDir>` — the weekly-rebuild record:
  *    prior full build on the clean x100 corpus, edited corpus (src1
  *    text appended, src3 removed — the CorpusBuildJobSpec planted-edit
  *    shape at x100), full rebuild vs CORPUS_BUILD_INCREMENTAL with the
  *    round-17 dedup-state splice. Prints one JSON object: per-phase
  *    wall ms for all three builds, the incremental-vs-full
  *    exact/near-tier equality count, and the full-ledger equality
  *    against the same-quantizer reference (the DedupState contract).
  *  - `slice <x100Dir> <dstDir> [nFiles]` — split the x100 documents
  *    corpus into `nFiles` parquet files under `dstDir` (the
  *    arrival-sliced input the stream-build mode consumes);
  *  - `stream-build <docsDir> <benchDir> <workDir>
  *    [maxFilesPerTrigger]` — run the hosted `corpus-build-stream`
  *    kind over a sliced corpus to completion IN-PROCESS, print
  *    per-trigger progress. The kill/resume record forks this main
  *    twice from the shell (SIGKILL the first) — see ROUND17_NOTES.md
  *    for the exact procedure.
  *  - `drift-ab <x100Dir> <workDir>` — round 18 (VERDICT r17 #8): the
  *    drift-gate A/B at x100. Prior full build on the clean corpus; a
  *    MASS RE-EMBEDDING (vectors of ~2/3 of sources negated, text
  *    untouched) demotes those sources and strips the prior quantizer
  *    cells of a majority of their membership; the incremental rebuild
  *    under `CORPUS_BUILD_SEM_DRIFT=auto` must trip the gate, retrain,
  *    and land a ledger EQUAL to the plain full rebuild — while
  *    `off` (the pre-r18 encode-only reuse) is run alongside to
  *    measure the divergence the gate exists to heal.
  *  - `finalize <docsDir> <storeDir> <workDir>` — round 18 (VERDICT
  *    r17 #3): run [[graft.runtime.CorpusBuildJob.finalizeStream]]
  *    over a stream-build's accumulated `build_ledger/` at x100 and
  *    print per-phase wall ms + artifact consistency counts.
  *  - `encode <sfDir> <steps> <workDir>` — round 18 (VERDICT r17 #1):
  *    the production-merge-count encode SCALE row. Train a tokenizer
  *    at `steps` merges on the corpus (fast driver trainer), round-trip
  *    the store, encode EVERY document through the native
  *    [[graft.functions.BpeEncodeIds]] expression, print wall times
  *    and token totals. */
object ScaleEvidence {

  private def session(name: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = graft.runtime.GraftSession.local(name, cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "multilingual-pure" :: x100 :: work :: Nil =>
      multilingualPure(x100, work)
    case "incremental" :: x100 :: work :: Nil => incremental(x100, work)
    case "slice" :: x100 :: dst :: rest =>
      slice(x100, dst, rest.headOption.map(_.toInt).getOrElse(32))
    case "stream-build" :: docs :: bench :: work :: rest =>
      streamBuild(docs, bench, work, rest.headOption.map(_.toInt).getOrElse(4))
    case "drift-ab" :: x100 :: work :: Nil => driftAb(x100, work)
    case "finalize" :: docs :: store :: work :: Nil =>
      finalizeEv(docs, store, work)
    case "encode" :: sf :: steps :: work :: Nil => encodeEv(sf, steps.toInt, work)
    case "multilingual" :: x100 :: work :: Nil => multilingual(x100, work)
    case _ =>
      System.err.println(
        "usage: ScaleEvidence incremental <x100Dir> <workDir> | " +
          "slice <x100Dir> <dstDir> [nFiles] | " +
          "stream-build <docsDir> <benchDir> <workDir> [maxFilesPerTrigger] | " +
          "drift-ab <x100Dir> <workDir> | " +
          "finalize <docsDir> <storeDir> <workDir> | " +
          "encode <sfDir> <steps> <workDir> | " +
          "multilingual <x100Dir> <workDir>")
      sys.exit(2)
  }

  /** Prep for the stream-build record: the corpus as an nFiles-sliced
    * parquet dir (the file stream's trigger granularity) plus the
    * benchmark shingle artifact (ids < 20 — the fixture eval slice). */
  private def slice(x100: String, dst: String, nFiles: Int): Unit = {
    val spark = session("graft-slice")
    val d = spark.read.parquet(s"$x100/documents.parquet")
      .select("doc_id", "text", "source")
    d.filter(col("doc_id") >= 20)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(s"$dst/docs")
    graft.ext.Dedup.shingleRows(
        d.filter(col("doc_id") < 20), "doc_id", "text")
      .select("s").distinct()
      .coalesce(1).write.mode("overwrite").parquet(s"$dst/bench")
    System.err.println(s"[slice] wrote $dst/docs ($nFiles files) + $dst/bench")
    spark.stop()
  }

  private def editDocs(spark: SparkSession, src: String, dst: String): Unit = {
    val d = spark.read.parquet(s"$src/documents.parquet")
      .filter(col("source") =!= "src3")
      .withColumn("text",
        when(col("source") === "src1", concat(col("text"), lit(" edited")))
          .otherwise(col("text")))
    d.repartition(32).write.mode("overwrite").parquet(dst)
  }

  private def phasesJson(r: graft.runtime.CorpusBuildJob.Report): String =
    r.phases.map(p => s""""${p.name}":${p.millis}""").mkString("{", ",", "}")

  private def incremental(x100: String, work: String): Unit = {
    val spark = session("graft-scale-evidence")
    val edited = s"$work/docs_edited"
    editDocs(spark, x100, edited)
    def env(out: String, docs: String) = Map(
      "CORPUS_BUILD_DOCS_PATH" -> docs,
      "CORPUS_BUILD_EMBEDDINGS_PATH" -> s"$x100/embeddings.parquet",
      "CORPUS_BUILD_OUTPUT_PATH" -> out)
    val quiet: String => Unit = s => System.err.println(s"[evidence] $s")

    val prior = graft.runtime.CorpusBuildJob.execute(spark,
      env(s"$work/prior", s"$x100/documents.parquet"), quiet)
    val full = graft.runtime.CorpusBuildJob.execute(spark,
      env(s"$work/full", edited), quiet)
    val incr = graft.runtime.CorpusBuildJob.execute(spark,
      env(s"$work/incr", edited) ++ Map(
        "CORPUS_BUILD_INCREMENTAL" -> "true",
        "CORPUS_BUILD_PRIOR_PATH" -> s"$work/prior"), quiet)

    // exact/near tiers must be bit-identical to the plain full rebuild
    def exactNear(p: String): DataFrame = spark.read
      .parquet(s"$p/stages/dedup_decision")
      .filter(col("decision").isin("drop_exact", "drop_near"))
      .select("doc_id", "decision", "keeper_id")
    val enFull = exactNear(s"$work/full")
    val enIncr = exactNear(s"$work/incr")
    val enDiff = enFull.exceptAll(enIncr).count() + enIncr.exceptAll(enFull).count()

    // the full contract: incremental ledger ≡ the same-quantizer
    // reference recompute (DedupState scaladoc)
    val d0B = spark.read.parquet(edited)
      .select(col("doc_id").cast("long").as("doc_id"), col("source"), col("text"))
    val e = spark.read.parquet(s"$x100/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val ref = graft.ext.ExtQueries.corpusBuildLedger(d0B, e,
      semCents = Some(spark.read.parquet(s"$work/prior/dedup_state/centroids")))
      .drop("text")
    val incrLedger = spark.read.parquet(s"$work/incr/ledger")
      .select(ref.columns.map(col): _*)
    val ledgerDiff = ref.exceptAll(incrLedger).count() +
      incrLedger.exceptAll(ref).count()
    val nLedger = incrLedger.count()
    // and vs the PLAIN full rebuild (semantic geometry may differ)
    val fullLedger = spark.read.parquet(s"$work/full/ledger")
      .select(ref.columns.map(col): _*)
    val vsFullDiff = fullLedger.exceptAll(incrLedger).count() +
      incrLedger.exceptAll(fullLedger).count()

    println(s"""{"corpus":"$x100 edited: src1 appended, src3 removed",""" +
      s""""prior_phase_ms":${phasesJson(prior)},""" +
      s""""full_rebuild_phase_ms":${phasesJson(full)},""" +
      s""""incremental_phase_ms":${phasesJson(incr)},""" +
      s""""exact_near_diff_rows":$enDiff,""" +
      s""""ledger_rows":$nLedger,""" +
      s""""ledger_vs_same_quantizer_reference_diff":$ledgerDiff,""" +
      s""""ledger_vs_plain_full_diff":$vsFullDiff}""")
    spark.stop()
  }

  /** Stretch #8 (VERDICT r17): compose the incremental splice with the
    * round-18 drift gate at x100 — a mass re-embedding must TRIP the
    * gate, the escalated build must equal the plain full rebuild, and
    * the `off` policy alongside measures the divergence healed. */
  private def driftAb(x100: String, work: String): Unit = {
    val spark = session("graft-drift-ab")
    val quiet: String => Unit = s => System.err.println(s"[evidence] $s")
    def env(out: String, emb: String) = Map(
      "CORPUS_BUILD_DOCS_PATH" -> s"$x100/documents.parquet",
      "CORPUS_BUILD_EMBEDDINGS_PATH" -> emb,
      "CORPUS_BUILD_OUTPUT_PATH" -> out)

    val prior = graft.runtime.CorpusBuildJob.execute(spark,
      env(s"$work/prior", s"$x100/embeddings.parquet"), quiet)

    // MASS RE-EMBEDDING: negate the vectors of ~2/3 of sources (hash
    // bucket on the source name; text untouched). Negation flips every
    // cosine sign, so the re-embedded docs leave their trained coarse
    // cells wholesale — the "new embedding model" shape.
    val d = spark.read.parquet(s"$x100/documents.parquet")
      .select(col("doc_id").cast("long").as("vec_id"), col("source"))
    val eEdited = s"$work/emb_edited"
    spark.read.parquet(s"$x100/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      .join(d, Seq("vec_id"), "left")
      .select(col("vec_id"),
        when(pmod(xxhash64(col("source")), lit(3)) < 2,
          expr("transform(embedding, x -> -x)"))
          .otherwise(col("embedding")).as("embedding"))
      .repartition(32).write.mode("overwrite").parquet(eEdited)

    val full = graft.runtime.CorpusBuildJob.execute(spark,
      env(s"$work/full", eEdited), quiet)
    val statuses = scala.collection.mutable.ArrayBuffer.empty[String]
    val incrAuto = graft.runtime.CorpusBuildJob.execute(spark,
      env(s"$work/incr_auto", eEdited) ++ Map(
        "CORPUS_BUILD_INCREMENTAL" -> "true",
        "CORPUS_BUILD_PRIOR_PATH" -> s"$work/prior",
        "CORPUS_BUILD_SEM_DRIFT" -> "auto"),
      s => { statuses += s; quiet(s) })
    val escalated = statuses.exists(_.contains("quantizer drift"))
    val incrOff = graft.runtime.CorpusBuildJob.execute(spark,
      env(s"$work/incr_off", eEdited) ++ Map(
        "CORPUS_BUILD_INCREMENTAL" -> "true",
        "CORPUS_BUILD_PRIOR_PATH" -> s"$work/prior",
        "CORPUS_BUILD_SEM_DRIFT" -> "off"), quiet)

    def ledger(p: String): DataFrame = {
      val df = spark.read.parquet(s"$p/ledger")
      df.select(df.columns.sorted.map(col): _*)
    }
    val lFull = ledger(s"$work/full")
    val n = lFull.count()
    val dAuto = lFull.exceptAll(ledger(s"$work/incr_auto")).count() +
      ledger(s"$work/incr_auto").exceptAll(lFull).count()
    val dOff = lFull.exceptAll(ledger(s"$work/incr_off")).count() +
      ledger(s"$work/incr_off").exceptAll(lFull).count()

    println(s"""{"corpus":"$x100, ~2/3 of sources re-embedded (negated), text untouched",""" +
      s""""drift_gate_tripped":$escalated,""" +
      s""""ledger_rows":$n,""" +
      s""""escalated_vs_plain_full_diff":$dAuto,""" +
      s""""encode_only_off_vs_plain_full_diff":$dOff,""" +
      s""""prior_phase_ms":${phasesJson(prior)},""" +
      s""""full_rebuild_phase_ms":${phasesJson(full)},""" +
      s""""incr_auto_phase_ms":${phasesJson(incrAuto)},""" +
      s""""incr_off_phase_ms":${phasesJson(incrOff)}}""")
    spark.stop()
  }

  /** Round-18 finalize record: the streaming build's last mile at x100
    * (ledger consolidation + kept-corpus extraction + pack/shard/
    * manifest over the accumulated store). */
  private def finalizeEv(docs: String, store: String, work: String): Unit = {
    val spark = session("graft-finalize-evidence")
    val t0 = System.nanoTime()
    val rep = graft.runtime.CorpusBuildJob.finalizeStream(spark, Map(
      "CORPUS_FINALIZE_STORE_PATH" -> store,
      "CORPUS_FINALIZE_DOCS_PATH" -> docs,
      "CORPUS_FINALIZE_OUTPUT_PATH" -> s"$work/final"),
      s => System.err.println(s"[evidence] $s"))
    val wall = (System.nanoTime() - t0) / 1e9
    val corpusRows = spark.read.parquet(s"$work/final/corpus").count()
    val manSources = spark.read.parquet(s"$work/final/manifest").count()
    val shards = spark.read.parquet(s"$work/final/corpus")
      .select("shard").distinct().count()
    println(f"""{"docs":"$docs","ledger_docs":${rep.total},"kept":${rep.kept},""" +
      s""""corpus_rows":$corpusRows,"manifest_sources":$manSources,""" +
      s""""shards":$shards,"wall_s":${"%.1f".format(wall)},""" +
      s""""phase_ms":${phasesJson(rep)}}""")
    require(corpusRows == rep.kept,
      s"finalize consistency: corpus rows $corpusRows != kept ${rep.kept}")
    spark.stop()
  }

  /** Round-18 encode record: production merge counts through the native
    * BpeEncodeIds expression, over every document of the tier. */
  private def encodeEv(sf: String, steps: Int, work: String): Unit = {
    val spark = session("graft-encode-evidence")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val t0 = System.nanoTime()
    graft.ext.TokenizerStore.train(docs, "text", s"$work/tok", steps)
    val t1 = System.nanoTime()
    val tok = graft.ext.TokenizerStore.load(spark, s"$work/tok")
    val r = graft.ext.TokenizerStore.encodeIds(docs, "text", tok)
      .agg(count(lit(1)).cast("long"), sum(col("n_bpe_tokens"))).head()
    val t2 = System.nanoTime()
    println(s"""{"dir":"$sf","merges":${tok.merges.size},""" +
      s""""docs":${r.getLong(0)},"bpe_tokens":${r.getLong(1)},""" +
      s""""train_s":${"%.1f".format((t1 - t0) / 1e9)},""" +
      s""""encode_s":${"%.1f".format((t2 - t1) / 1e9)}}""")
    spark.stop()
  }

  private def streamBuild(docs: String, bench: String, work: String,
      mft: Int): Unit = {
    val spark = session("graft-stream-build-evidence")
    val t0 = System.nanoTime()
    val spec =
      s"""{
         |  "sourcePath": "$docs",
         |  "schemaDdl": "doc_id BIGINT, text STRING, source STRING",
         |  "storePath": "$work/store",
         |  "checkpointPath": "$work/ckpt",
         |  "benchmarkShinglesPath": "$bench",
         |  "mixRates": "src1:50,src5:20",
         |  "maxFilesPerTrigger": $mft,
         |  "stopAfterBackfill": true
         |}""".stripMargin
    val env = Map(
      "STREAMCONTEXT__STREAM_ID" -> "scale-evidence-build",
      "STREAMCONTEXT__STREAM_KIND" -> "corpus-build-stream",
      "STREAMCONTEXT__BACKFILL" -> "true",
      "STREAMCONTEXT__SPEC" -> spec)
    val code = graft.runtime.GraftMain.run(spark, env,
      statusReporter = s => System.err.println(s"[stream-build] $s"))
    System.err.println(f"[stream-build] exit=$code wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
    spark.stop()
    sys.exit(code)
  }

  /** Stretch #8 (VERDICT r18, round 19): the MULTILINGUAL build end to
    * end at x100, composing the round's three new components — the
    * batch LANGUAGE GATE, the `bytes` tokenizer, and the tokenizer
    * DRIFT GATE. The x100 corpus gets deterministic non-Latin suffixes
    * (Cyrillic on doc_id ≡ 0 mod 3, CJK on ≡ 1 mod 7 — ~40% of docs
    * carry non-Latin bytes); then:
    *  1. a `bytes` TokenizerStore trains on the mixed corpus (the
    *     artifact a multilingual deployment ships);
    *  2. the batch build runs with `CORPUS_BUILD_LANG_RATES`
    *     (ru/zh downweighted) + the bytes store + TOK_DRIFT=auto —
    *     the gate must stay QUIET (store trained on this corpus);
    *  3. the SAME build re-runs → ledger + bpe_sequences must be
    *     BIT-IDENTICAL (hash-stability of the whole composition);
    *  4. a STALE store (trained on the clean pre-shift corpus) runs
    *     under TOK_DRIFT=auto — the drift gate must TRIP and the
    *     retrained artifact's fertility for ru/zh must beat the stale
    *     one's (the regression the gate heals, measured).
    * Prints one JSON object with phase wall ms, verdict counts
    * (drop_lang included), gate decisions, equality counts, and the
    * per-language fertility A/B. */
  /** Stretch #8 (VERDICT r19, round 20): the PURE-non-Latin build at
    * x100 — the corpus class the round-19 record masked (every planted
    * doc kept a Latin core). ~43% of documents are REPLACED by
    * all-Cyrillic / all-CJK bodies (seed words interleaved with a
    * per-group transliterated-ordinal token, rotating tail — zero
    * Latin characters; same-group docs are exact/near duplicates,
    * cross-group docs share no shingles, so LSH bucket volume stays
    * bounded). Then:
    *  1. the ASCII-layer build (round-19 default) — every pure doc
    *     dies `drop_quality` (the blind spot, MEASURED at x100);
    *  2. the `CORPUS_BUILD_TOKENS=unicode` build with the language
    *     gate, a `bytes` tokenizer trained on the mixed corpus, and
    *     TOK_DRIFT=auto — pure docs flow to keep/drop_lang/
    *     drop_exact/drop_near; per-language keep rates recorded;
    *  3. the same build re-run — ledger + bpe_sequences BIT-IDENTICAL;
    *  4. the HOSTED STREAMING build (`tokens: unicode` spec field)
    *     over the sliced corpus — its ledger's pure docs must reach
    *     the same verdict CLASSES (arrival-order precedence differs
    *     by design; the class split is what transfers).
    * Prints one JSON object. */
  private def multilingualPure(x100: String, work: String): Unit = {
    val spark = session("graft-multilingual-pure")
    val quiet: String => Unit = s => System.err.println(s"[evidence] $s")
    val ruWords = "привет мир и собака бежит по улице утром".split(" ").toSeq
    val zhWords = "你好 世界 孩子们 在 公园 玩耍 天气 很好".split(" ").toSeq
    val ruTails = Seq("зима", "лето", "осень")
    val zhTails = Seq("春天", "夏天", "秋天")
    def pureBody(words: Seq[String], g: org.apache.spark.sql.Column,
        x: org.apache.spark.sql.Column) =
      concat_ws(" ", (words ++ words).flatMap(w => Seq(lit(w), g)) :+ x: _*)
    val gRu = translate(expr("cast(doc_id div 300 as string)"),
      "0123456789", "абвгдежзик")
    val gZh = translate(expr("cast(doc_id div 300 as string)"),
      "0123456789", "零一二三四五六七八九")
    val xRu = element_at(typedlit(ruTails),
      (pmod(expr("doc_id div 3"), lit(3)) + 1).cast("int"))
    val xZh = element_at(typedlit(zhTails),
      (pmod(expr("doc_id div 7"), lit(3)) + 1).cast("int"))
    val isRu = pmod(col("doc_id"), lit(3)) === 0
    val isZh = pmod(col("doc_id"), lit(7)) === 1
    val mixed = s"$work/docs_pure"
    spark.read.parquet(s"$x100/documents.parquet")
      .select(col("doc_id"), col("source"),
        when(isRu, pureBody(ruWords, gRu, xRu))
          .when(isZh, pureBody(zhWords, gZh, xZh))
          .otherwise(col("text")).as("text"))
      .repartition(32).write.mode("overwrite").parquet(mixed)
    val md = spark.read.parquet(mixed)
    val nRu = md.filter(isRu).count()
    val nZh = md.filter(isZh).count()

    val t0 = System.nanoTime()
    graft.ext.TokenizerStore.train(md.select("text"), "text",
      s"$work/tok_pure", steps = 300, alphabet = "bytes")
    val tokTrainMs = (System.nanoTime() - t0) / 1000000L

    val langRates = "ru:40,zh:40,en:100,es:80,fr:80,de:80"
    def env(out: String, tokens: String) = Map(
      "CORPUS_BUILD_DOCS_PATH" -> mixed,
      "CORPUS_BUILD_EMBEDDINGS_PATH" -> s"$x100/embeddings.parquet",
      "CORPUS_BUILD_OUTPUT_PATH" -> out,
      "CORPUS_BUILD_LANG_RATES" -> langRates,
      "CORPUS_BUILD_LANG_DEFAULT_PCT" -> "50",
      "CORPUS_BUILD_TOKENS" -> tokens,
      "CORPUS_BUILD_TOKENIZER_PATH" -> s"$work/tok_pure")

    def pureVerdicts(ledger: String): Map[String, Long] =
      spark.read.parquet(ledger)
        .filter(isRu || isZh)
        .groupBy("verdict").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    def vj(m: Map[String, Long]) = m.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")

    // 1: the ASCII blind spot, measured
    val rA = graft.runtime.CorpusBuildJob.execute(spark,
      env(s"$work/build_ascii", "ascii"), quiet)
    val pureAscii = pureVerdicts(s"$work/build_ascii/ledger")
    // 2+3: the unicode build, twice
    val rU = graft.runtime.CorpusBuildJob.execute(spark,
      env(s"$work/build_uni1", "unicode"), quiet)
    val rU2 = graft.runtime.CorpusBuildJob.execute(spark,
      env(s"$work/build_uni2", "unicode"), quiet)
    val pureUni = pureVerdicts(s"$work/build_uni1/ledger")
    def rows(p: String, cols: Seq[String]): DataFrame =
      spark.read.parquet(p).select(cols.map(col): _*)
    val ledCols = Seq("doc_id", "source", "verdict", "keeper_id", "n_hits",
      "n_chunks", "seq_first", "shard", "pos")
    val ledDiff =
      rows(s"$work/build_uni1/ledger", ledCols)
        .exceptAll(rows(s"$work/build_uni2/ledger", ledCols)).count() +
      rows(s"$work/build_uni2/ledger", ledCols)
        .exceptAll(rows(s"$work/build_uni1/ledger", ledCols)).count()
    val seqCols = Seq("source", "seq_id", "n_docs", "seq_tokens")
    val seqDiff =
      rows(s"$work/build_uni1/bpe_sequences", seqCols)
        .exceptAll(rows(s"$work/build_uni2/bpe_sequences", seqCols)).count() +
      rows(s"$work/build_uni2/bpe_sequences", seqCols)
        .exceptAll(rows(s"$work/build_uni1/bpe_sequences", seqCols)).count()
    // per-language keep rates over the trained verdict (kept / total)
    val keepRates = {
      val led = spark.read.parquet(s"$work/build_uni1/ledger")
      md.select(col("doc_id"),
          graft.ext.LangId.verdictOf(
            graft.ext.LangId.scoresArrayCol(col("text"))).as("lang"))
        .join(led.select("doc_id", "verdict"), Seq("doc_id"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum(when(col("verdict") === "keep", 1L).otherwise(0L)).as("k"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(2) * 10000L / math.max(r.getLong(1), 1L))).toMap
    }

    // 4: the hosted streaming build, unicode layer
    val sliced = s"$work/docs_sliced"
    md.repartition(16).write.mode("overwrite").parquet(sliced)
    val spec =
      s"""{
         |  "sourcePath": "$sliced",
         |  "schemaDdl": "doc_id BIGINT, source STRING, text STRING",
         |  "storePath": "$work/stream_store",
         |  "checkpointPath": "$work/stream_ckpt",
         |  "langRates": "$langRates",
         |  "langDefaultPct": 50,
         |  "tokens": "unicode",
         |  "maxFilesPerTrigger": 4,
         |  "stopAfterBackfill": true
         |}""".stripMargin
    val tS = System.nanoTime()
    val code = graft.runtime.GraftMain.run(spark, Map(
      "STREAMCONTEXT__STREAM_ID" -> "pure-x100-stream",
      "STREAMCONTEXT__STREAM_KIND" -> "corpus-build-stream",
      "STREAMCONTEXT__BACKFILL" -> "true",
      "STREAMCONTEXT__SPEC" -> spec), statusReporter = quiet)
    val streamWall = (System.nanoTime() - tS) / 1e9
    val pureStream = spark.read.parquet(s"$work/stream_store/build_ledger")
      .filter(isRu || isZh)
      .groupBy("verdict").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    println(s"""{"corpus":"$x100, pure ru body on id%3=0, pure zh on id%7=1",""" +
      s""""n_pure_ru":$nRu,"n_pure_zh":$nZh,""" +
      s""""tok_train_ms":$tokTrainMs,""" +
      s""""build_phase_ms":${phasesJson(rU)},""" +
      s""""ascii_pure_verdicts":${vj(pureAscii)},""" +
      s""""unicode_pure_verdicts":${vj(pureUni)},""" +
      s""""unicode_verdicts":${vj(rU.verdicts)},""" +
      s""""ascii_kept":${rA.kept},"unicode_kept":${rU.kept},""" +
      s""""rerun_ledger_diff_rows":$ledDiff,""" +
      s""""rerun_bpe_sequences_diff_rows":$seqDiff,""" +
      s""""rerun_kept_equal":${rU2.kept == rU.kept},""" +
      s""""keep_rate_e4_by_lang":${vj(keepRates)},""" +
      s""""stream_exit":$code,"stream_wall_s":${f"$streamWall%.1f"},""" +
      s""""stream_pure_verdicts":${vj(pureStream)}}""")
    spark.stop()
  }

  private def multilingual(x100: String, work: String): Unit = {
    val spark = session("graft-multilingual")
    val quiet: String => Unit = s => System.err.println(s"[evidence] $s")
    // suffixes sized to DOMINATE the ~300-char latin bodies (12×/8×
    // the seed sentence), so suffixed docs genuinely FLIP verdict to
    // ru/zh — a language-mix shift among KEPT docs, not just extra
    // bytes inside latin-verdict docs (the aggregate-fertility
    // dilution that left the gate quiet on the first x100 attempt)
    val ru = " " + Seq.fill(12)(
      "привет мир и собака бежит по улице утром возле реки").mkString(" ")
    val zh = " " + Seq.fill(8)(
      "你好 世界 孩子们 在 公园 玩耍 天气 很好 大家 开心").mkString(" ")
    val mixed = s"$work/docs_mixed"
    spark.read.parquet(s"$x100/documents.parquet")
      .select(col("doc_id"), col("source"),
        when(pmod(col("doc_id"), lit(3)) === 0, concat(col("text"), lit(ru)))
          .when(pmod(col("doc_id"), lit(7)) === 1, concat(col("text"), lit(zh)))
          .otherwise(col("text")).as("text"))
      .repartition(32).write.mode("overwrite").parquet(mixed)

    // 1: the shipped artifact — bytes alphabet, trained on the mixed
    // corpus (records the fertility baseline the drift gate compares)
    val t0 = System.nanoTime()
    graft.ext.TokenizerStore.train(
      spark.read.parquet(mixed).select("text"), "text",
      s"$work/tok_mixed", steps = 300, alphabet = "bytes")
    val tokTrainMs = (System.nanoTime() - t0) / 1000000L
    // the stale sibling: trained on the CLEAN corpus (pre-shift world)
    graft.ext.TokenizerStore.train(
      spark.read.parquet(s"$x100/documents.parquet").select("text"), "text",
      s"$work/tok_stale", steps = 300, alphabet = "bytes")

    val langRates = "ru:40,zh:40,en:100,es:80,fr:80,de:80"
    def env(out: String, tok: String) = Map(
      "CORPUS_BUILD_DOCS_PATH" -> mixed,
      "CORPUS_BUILD_EMBEDDINGS_PATH" -> s"$x100/embeddings.parquet",
      "CORPUS_BUILD_OUTPUT_PATH" -> out,
      "CORPUS_BUILD_LANG_RATES" -> langRates,
      "CORPUS_BUILD_LANG_DEFAULT_PCT" -> "50",
      "CORPUS_BUILD_TOKENIZER_PATH" -> tok)

    // 2+3: the gated build, twice — composition hash-stability
    val logs = scala.collection.mutable.ArrayBuffer.empty[String]
    val note: String => Unit = s => { logs += s; quiet(s) }
    val r1 = graft.runtime.CorpusBuildJob.execute(spark,
      env(s"$work/build1", s"$work/tok_mixed"), note)
    val gateQuiet = logs.exists(_.contains("tokenizer drift gate: stable"))
    val r2 = graft.runtime.CorpusBuildJob.execute(spark,
      env(s"$work/build2", s"$work/tok_mixed"), quiet)
    def rows(p: String, cols: Seq[String]): DataFrame =
      spark.read.parquet(p).select(cols.map(col): _*)
    val ledCols = Seq("doc_id", "source", "verdict", "keeper_id", "n_hits",
      "n_chunks", "seq_first", "shard", "pos")
    val ledDiff =
      rows(s"$work/build1/ledger", ledCols)
        .exceptAll(rows(s"$work/build2/ledger", ledCols)).count() +
      rows(s"$work/build2/ledger", ledCols)
        .exceptAll(rows(s"$work/build1/ledger", ledCols)).count()
    val seqCols = Seq("source", "seq_id", "n_docs", "seq_tokens")
    val seqDiff =
      rows(s"$work/build1/bpe_sequences", seqCols)
        .exceptAll(rows(s"$work/build2/bpe_sequences", seqCols)).count() +
      rows(s"$work/build2/bpe_sequences", seqCols)
        .exceptAll(rows(s"$work/build1/bpe_sequences", seqCols)).count()

    // 4: the stale store under auto — gate must TRIP and retrain
    logs.clear()
    val r3 = graft.runtime.CorpusBuildJob.execute(spark,
      env(s"$work/build3", s"$work/tok_stale"), note)
    val gateTripped = logs.exists(_.contains("tokenizer drift gate: RETRAIN"))
    // fertility A/B over the kept corpus: stale vs retrained artifact
    def fertility(tokRoot: String): Map[String, Long] = {
      val tok = graft.ext.TokenizerStore.load(spark, tokRoot)
      graft.ext.TokenizerStore.encodeIds(
          spark.read.parquet(s"$work/build3/corpus").select("text"),
          "text", tok)
        .withColumn("__ls", graft.ext.LangId.scoresArrayCol(col("text")))
        .withColumn("lang", graft.ext.LangId.verdictOf(col("__ls")))
        .groupBy("lang")
        .agg((sum(length(col("text"))) * 10000L /
          greatest(sum(col("n_bpe_tokens")), lit(1L))).cast("long").as("f"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val fertStale = fertility(s"$work/tok_stale")
    // present only when the gate tripped (the record still prints a
    // diagnosable JSON if it did not, rather than dying mid-evidence)
    val fertRetrained =
      if (gateTripped) fertility(s"$work/build3/tokenizer_store")
      else Map.empty[String, Long]
    def fj(m: Map[String, Long]) = m.toSeq.sorted
      .map { case (l, f) => s""""$l":$f""" }.mkString("{", ",", "}")

    println(s"""{"corpus":"$x100 + ru suffix on id%3=0, zh on id%7=1",""" +
      s""""tok_train_ms":$tokTrainMs,""" +
      s""""build_phase_ms":${phasesJson(r1)},""" +
      s""""verdicts":${r1.verdicts.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")},""" +
      s""""drift_gate_quiet_on_fresh_store":$gateQuiet,""" +
      s""""rerun_ledger_diff_rows":$ledDiff,""" +
      s""""rerun_bpe_sequences_diff_rows":$seqDiff,""" +
      s""""drift_gate_tripped_on_stale_store":$gateTripped,""" +
      s""""stale_retrain_verdicts_equal":${r3.verdicts == r1.verdicts},""" +
      s""""kept":${r2.kept},""" +
      s""""fertility_e4_stale":${fj(fertStale)},""" +
      s""""fertility_e4_retrained":${fj(fertRetrained)}}""")
    spark.stop()
  }
}
