package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-evidence harness: measures what actually MOVES when each query
  * runs — bytes scanned, shuffle bytes written/read — across data tiers,
  * so the 100 TB extrapolation is a measured slope instead of a claim.
  *
  * Two modes:
  *
  * `ScaleBench gen <srcSfDir> <dstDir> <factor>` — builds a corpus tier
  * `factor`× the source: documents get fresh doc_ids and a per-copy
  * `translate` of the letter inventory (token structure and lengths are
  * preserved, shingle/token hashes differ, so copies are NOT near-dups
  * of each other and the pair-space semantics stay realistic);
  * embeddings get fresh vec_ids and a deterministic per-dimension
  * perturbation (direction changes, so copies don't collapse into one
  * cosine bucket). All other tables are byte-copied.
  *
  * `ScaleBench run <outJson> <label>=<dir>[:corpus] ...` — runs each
  * declared query once per tier through the noop sink with a
  * task-metrics tally and records {input, shuffleRead, shuffleWrite,
  * sec}. The `:corpus` suffix restricts a tier to the document/embedding
  * pipeline (the blown-up tier has no blown-up TPC-H tables). Each tier
  * also records the MinHash LSH band-bucket occupancy histogram
  * (buckets, max, p99) — the quantity that decides candidate-join skew.
  *
  * Shuffle-bytes-per-input-byte is the number that must stay flat (or
  * fall, for aggregates with map-side combine) as the tier grows: a
  * superlinear slope means a pair-space or array-weight geometry that a
  * bigger cluster cannot absorb.
  */
object ScaleBench {

  /** Accumulates task metrics across all stages between reset() and
    * settled(). Listener events are delivered async — settled() polls
    * until the counters stop moving. */
  private final class ByteTally extends SparkListener {
    val input = new AtomicLong
    val shufW = new AtomicLong
    val shufR = new AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        input.addAndGet(m.inputMetrics.bytesRead)
        shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      }
    }
    def reset(): Unit = { input.set(0); shufW.set(0); shufR.set(0) }
    def settled(): (Long, Long, Long) = {
      var last = (input.get, shufW.get, shufR.get)
      var stableMs = 0
      while (stableMs < 300) {
        Thread.sleep(100)
        val now = (input.get, shufW.get, shufR.get)
        if (now == last) stableMs += 100 else { stableMs = 0; last = now }
      }
      last
    }
  }

  /** The document/embedding pipeline — the queries whose scale geometry
    * the blown-up tier exists to test. */
  private val CorpusQueries: Set[String] = Set(
    "dedup_exact", "dedup_minhash", "dedup_jaccard", "dedup_simhash",
    "dedup_simhash_pairs", "dedup_embed_cosine", "pipeline_corpus_clean",
    "pipeline_decontaminate", "pipeline_sample_mix", "sim_topk",
    "sim_ann_lsh", "sim_ivf", "source_similarity", "source_sketch",
    "text_fingerprint", "text_keywords", "text_repetition",
    // round 5
    "dedup_containment", "dedup_segments", "dedup_cluster",
    "pipeline_pack_sequences", "sim_pq", "text_heavy_hitters",
    "pipeline_quality_report", "pipeline_shard_shuffle",
    "pipeline_manifest", "multimodal_frames", "dedup_incremental",
    "text_cooccurrence",
    // round 6
    "sim_ivfpq", "pipeline_split_leakage",
    // round 7
    "dedup_incremental_store",
    // round 8
    "sim_ivfpq_rerank", "streaming_dedup_golden", "dedup_substring",
    "pipeline_dedup_apply", "sim_index_store",
    // round 9
    "streaming_exact_golden", "streaming_ttl_golden",
    "streaming_exact_ttl_golden", "dedup_semantic",
    // round 10
    "dedup_semantic_store", "streaming_semantic_golden",
    "streaming_semantic_ttl_golden",
    // round 11
    "dedup_cluster_incremental", "streaming_decision_golden",
    "streaming_decontam_golden", "sim_ivfpq_residual", "multimodal_decode",
    "streaming_decision_cluster", "text_bpe_train", "text_bpe_encode", "sim_hard_negatives",
    // round 12
    "dedup_retraction", "dedup_retraction_cluster", "text_bpe_train_fast",
    "text_html_extract", "multimodal_decode_jpeg", "sim_hard_negatives_store",
    "text_lm_score",
    // round 13
    "dedup_tombstone_ingest", "streaming_retraction_golden",
    "multimodal_decode_wav", "text_quality_classifier", "text_normalize",
    // rounds 14-15
    "multimodal_decode_mp4", "streaming_quality_golden",
    "streaming_quality_lm_golden", "pipeline_corpus_build",
    "pipeline_corpus_build_clf", "streaming_corpus_build_golden",
    "pipeline_decontaminate_attr", "pipeline_manifest_diff",
    // round 16
    "pipeline_sample_temperature", "pipeline_quality_buckets",
    "pipeline_token_budget",
    // round 17
    "pipeline_sample_epochs", "pipeline_pack_bpe",
    // round 18
    "pipeline_token_budget_bpe", "text_lang_id2", "pipeline_lang_mix",
    "text_tokenizer_fertility", "dedup_cluster_best_keeper",
    // round 19
    "pipeline_corpus_build_lang", "text_lang_id3", "pipeline_lang_mix3",
    "text_bpe_encode_bytes")

  /** Queries whose first call per corpus dir pays a one-time persisted
    * store/index build (cached thereafter) — warmed before measuring. */
  private val StoreBackedQueries: Set[String] =
    Set("dedup_incremental_store", "sim_index_store", "dedup_semantic_store",
      "streaming_dedup_golden", "streaming_exact_golden", "streaming_ttl_golden",
      "streaming_exact_ttl_golden", "streaming_semantic_golden",
      "streaming_semantic_ttl_golden", "dedup_cluster_incremental",
      "streaming_decision_golden", "streaming_decontam_golden",
      "streaming_decision_cluster", "text_bpe_train", "text_bpe_encode", "sim_hard_negatives",
      // round 12: retraction copies+heals a cached base store per call;
      // the store-backed warm pass keeps the one-time build out of the row
      "dedup_retraction", "dedup_retraction_cluster", "sim_hard_negatives_store",
      // round 13: tombstone-ingest builds+retracts its store once per
      // dir; the streaming retraction golden writes its stream dir once
      "dedup_tombstone_ingest", "streaming_retraction_golden",
      // rounds 14-15: the quality goldens write their stream dir once
      "streaming_quality_golden", "streaming_quality_lm_golden",
      "streaming_corpus_build_golden",
      // rounds 17-18: first call trains + persists the tokenizer store
      "pipeline_pack_bpe", "pipeline_token_budget_bpe",
      "text_tokenizer_fertility")

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("gen") => gen(args(1), args(2), args(3).toInt)
    case Some("run") =>
      // optional --only=q1,q2 restricts the per-query rows (the
      // tier-wide special rows — lsh occupancy, embed/semantic/decision
      // steady-state, ivfpq pruning, store layout — always run):
      // targeted re-records for new operators without paying the full
      // suite per tier
      val (onlyArgs, rest) = args.drop(2).partition(_.startsWith("--only="))
      val only = onlyArgs.lastOption
        .map(_.stripPrefix("--only=").split(',').toSet)
      run(args(1), rest, only)
    case _ =>
      System.err.println("usage: ScaleBench gen <srcSfDir> <dstDir> <factor> | run <outJson> [--only=q1,q2] <label>=<dir>[:corpus] ...")
      System.err.println("note: run WRITES outJson FRESH with only what it measured - record a targeted " +
        "--only run to a scratch file and fold it into the committed record with tools/merge_scale.py")
      sys.exit(2)
  }

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = graft.runtime.GraftSession.local("graft-scale", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def gen(src: String, dst: String, factor: Int): Unit = {
    val spark = session()
    Files.createDirectories(Paths.get(dst))

    // rotate the letter inventory per copy: tokens keep their shape and
    // length (quality stats comparable) but hash differently per copy.
    val alpha = "etaoinshrd"
    def rot(i: Int) = alpha.drop(i % alpha.length) + alpha.take(i % alpha.length)

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val idStride = docs.agg(max("doc_id")).head.getLong(0) + 1
    (0 until factor).map { i =>
      docs.select(
        (col("doc_id") + lit(i.toLong * idStride)).as("doc_id"),
        (if (i == 0) col("text")
         else translate(col("text"), alpha + alpha.toUpperCase, rot(i) + rot(i).toUpperCase)).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val vecStride = emb.agg(max("vec_id")).head.getLong(0) + 1
    (0 until factor).map { i =>
      emb.select(
        (col("vec_id") + lit(i.toLong * vecStride)).as("vec_id"),
        // per-vector AND per-dimension offset: a copy-constant offset
        // would correlate every vector in the copy with the offset
        // direction and flood the tier with artificial near-dup pairs
        (if (i == 0) col("embedding")
         else transform(col("embedding"),
           (x, j) => x + (pmod(j * (i + 3) + col("vec_id") * 7, lit(11)) - lit(5)).cast("float") * lit(0.03f))).as("embedding"),
        col("label"))
    }.reduce(_ unionAll _)
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events"))
      Files.copy(Paths.get(s"$src/$t.parquet"), Paths.get(s"$dst/$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)

    System.err.println(s"[scale] wrote ${factor}x tier at $dst")
    spark.stop()
  }

  private def run(outJson: String, tierArgs: Array[String],
      only: Option[Set[String]] = None): Unit = {
    val spark = session()
    val tally = new ByteTally
    spark.sparkContext.addSparkListener(tally)

    val tiers = tierArgs.map { a =>
      val Array(label, spec) = a.split("=", 2)
      val corpusOnly = spec.endsWith(":corpus")
      (label, spec.stripSuffix(":corpus"), corpusOnly)
    }

    val sb = new StringBuilder("{")
    tiers.zipWithIndex.foreach { case ((label, dir, corpusOnly), ti) =>
      val queries = SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (n, _) => !corpusOnly || CorpusQueries(n) }
        .filter { case (n, _) => only.forall(_(n)) }
      // store-backed queries build their persisted store/index ONCE per
      // corpus dir (cached); run them unmeasured first so their
      // recorded rows are the steady-state query — otherwise the
      // tier's first call conflates the one-time ingestion/build with
      // the scan/shuffle slope being measured
      queries.filter { case (n, _) => StoreBackedQueries(n) }
        .foreach { case (n, fn) =>
          try fn(spark, dir).write.format("noop").mode("overwrite").save()
          catch { case e: Throwable =>
            System.err.println(s"[scale] $label/$n warm-up failed: ${e.getClass.getSimpleName}")
          }
        }
      if (ti > 0) sb.append(',')
      sb.append(s""""$label":{"dir":"$dir","queries":{""")
      queries.zipWithIndex.foreach { case ((name, fn), qi) =>
        tally.reset()
        val t0 = System.nanoTime()
        val entry =
          try {
            fn(spark, dir).write.format("noop").mode("overwrite").save()
            val sec = (System.nanoTime() - t0) / 1e9
            val (in, sw, sr) = tally.settled()
            System.err.println(f"[scale] $label/$name in=$in sw=$sw sr=$sr ${sec}%.2fs")
            s""""$name":{"input":$in,"shuffleWrite":$sw,"shuffleRead":$sr,"sec":${f"$sec%.3f"}}"""
          } catch { case e: Throwable =>
            System.err.println(s"[scale] $label/$name FAILED ${e.getClass.getSimpleName}: ${e.getMessage}")
            s""""$name":{"error":"${e.getClass.getSimpleName}"}"""
          }
        if (qi > 0) sb.append(',')
        sb.append(entry)
      }
      // LSH band-bucket occupancy on this tier's documents — the join-skew
      // driver for the candidate self-join.
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val occ = graft.ext.Dedup.minhashProject(docs, "doc_id", "text")
        .select(explode(col("bands")).as("bk"))
        .groupBy("bk").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("buckets"), max("n").as("max_n"),
          expr("percentile(n, 0.99)").as("p99_n"), avg("n").as("avg_n"))
        .head
      sb.append(s"""},"lsh_buckets":{"buckets":${occ.getLong(0)},"max":${occ.getLong(1)},"p99":${f"${occ.getDouble(2)}%.1f"},"avg":${f"${occ.getDouble(3)}%.2f"}}""")
      // production-geometry embedding near-dup: bits derived from the
      // corpus size (the dedup_embed_cosine ORACLE query pins bits so
      // DuckDB can mirror the buckets — this is the path a deployment
      // uses, and the slope that must stay linear)
      val embDf = spark.read.parquet(s"$dir/embeddings.parquet")
      val nVec = embDf.count()
      val bits = graft.ext.Similarity.bitsFor(nVec, targetOccupancy = 64L)
      tally.reset()
      val t0e = System.nanoTime()
      graft.ext.Similarity.embedNearDupPairs(embDf, "vec_id", "embedding",
          minScoreE4 = 9000L, bits = bits)
        .write.format("noop").mode("overwrite").save()
      val secE = (System.nanoTime() - t0e) / 1e9
      val (_, swE, _) = tally.settled()
      sb.append(s""","embed_neardup_scaled":{"n":$nVec,"bits":$bits,"shuffleWrite":$swE,"sec":${f"$secE%.3f"}}""")
      // production-geometry SemDeDup: cluster count derived from the
      // corpus (target ~250 vectors/cell), so pairs-per-cell — the
      // Σ|cell|² in-cell cosine term — stays FLAT as the corpus grows
      // and total pair work is linear in n. The dedup_semantic ORACLE
      // query pins k=8 so DuckDB replays the seeded training; THIS row
      // is the slope a deployment's k ∝ n configuration follows
      // (SemDeDup's 50 K-cluster LAION geometry). Training (eager,
      // metadata-sized output) runs before the tally so the row
      // isolates the dedup stage.
      val e1 = embDf.select(col("vec_id"), col("embedding"))
      val kSem = math.max(8L, nVec / 250L).toInt
      val semCents = graft.ext.Similarity.trainCentroids(
        e1, "vec_id", "embedding", k = kSem, iters = 1)
      tally.reset()
      val t0s = System.nanoTime()
      graft.ext.Similarity.semanticDedup(e1, "vec_id", "embedding",
          semCents, minScoreE4 = 3000L)
        .write.format("noop").mode("overwrite").save()
      val secS = (System.nanoTime() - t0s) / 1e9
      val (_, swS, _) = tally.settled()
      sb.append(s""","semantic_scaled":{"n":$nVec,"k":$kSem,"shuffleWrite":$swS,"sec":${f"$secS%.3f"}}""")
      // store-backed SemDeDup steady state (VERDICT r9 #2): the
      // quantizer is a PERSISTED VectorIndex artifact — trainSec is
      // the once-per-lifetime build (coarse k ∝ n + PQ books), and
      // dedupSec is what EVERY later run pays: encode-side assignment
      // + capped in-cell pairs, no Lloyd pass. The gap between the two
      // is the amortization the store form exists for; the cap (2× the
      // ~250/cell target) only fires on degenerate cells.
      val semIdxDir = Files.createTempDirectory("graft-semidx").toString
      val tTr = System.nanoTime()
      graft.ext.VectorIndex.build(e1, "vec_id", "embedding", semIdxDir,
        dim = 64, m = 8, codebookK = 16, coarseK = kSem)
      val trSec = (System.nanoTime() - tTr) / 1e9
      tally.reset()
      val t0ss = System.nanoTime()
      graft.ext.VectorIndex.semanticDedup(e1, "vec_id", "embedding", semIdxDir,
          minScoreE4 = 3000L, maxCellSize = 512)
        .write.format("noop").mode("overwrite").save()
      val secSS = (System.nanoTime() - t0ss) / 1e9
      val (_, swSS, _) = tally.settled()
      System.err.println(f"[scale] $label/semantic_store train=${trSec}%.2fs dedup=${secSS}%.2fs")
      sb.append(s""","semantic_store_scaled":{"n":$nVec,"k":$kSem,""" +
        s""""trainSec":${f"$trSec%.3f"},"dedupSec":${f"$secSS%.3f"},"shuffleWrite":$swSS}""")
      // Hard-negative mining through the SAME persisted index (VERDICT
      // r11 #5): probe-cells → label-filter → exact-rerank. With k ∝ n
      // cells the probed membership per query is ~flat, so the row's
      // slope must stay flat in corpus size — the composed form's
      // at-scale claim, measured.
      val embLbl = embDf.select(col("vec_id"), col("embedding"), col("label"))
      tally.reset()
      val t0hn = System.nanoTime()
      graft.ext.VectorIndex.hardNegatives(
          embLbl.filter(col("vec_id") < 10), embLbl, semIdxDir,
          "vec_id", "embedding", "label", k = 5, nProbe = 2)
        .write.format("noop").mode("overwrite").save()
      val secHN = (System.nanoTime() - t0hn) / 1e9
      val (_, swHN, _) = tally.settled()
      System.err.println(f"[scale] $label/hard_negatives sec=$secHN%.2f")
      sb.append(s""","hard_negatives_scaled":{"n":$nVec,"k":$kSem,""" +
        s""""shuffleWrite":$swHN,"sec":${f"$secHN%.3f"}}""")
      graft.ext.SignatureStore.deleteStore(java.nio.file.Paths.get(semIdxDir))
      // Steady-state decision surface (VERDICT r10 #6): the stores are
      // seeded with 3 of the 5 corpus slices (decisionSteadyPrepare
      // seeds GoldenBatches-2 slices, untimed — the accumulated-corpus
      // state), then ONE batch's arrival-time keep/drop verdict is
      // measured (the first of the two unseeded slices; the fifth
      // stays unused here). The slope that must stay linear
      // in BATCH size (not corpus size) as the tier grows: admission
      // and matching read only the touched store partitions.
      val (decStore, decCents, decLasts) =
        graft.ext.ExtQueries.decisionSteadyPrepare(spark, dir)
      tally.reset()
      val t0d = System.nanoTime()
      graft.ext.ExtQueries.decisionSteadyBatch(decStore, decCents, decLasts.head, "scale-1")
      val secD = (System.nanoTime() - t0d) / 1e9
      val (_, swD, _) = tally.settled()
      val nBatch = decLasts.head.count()
      System.err.println(f"[scale] $label/decision_steady n=$nBatch sw=$swD ${secD}%.2fs")
      sb.append(s""","decision_steady_scaled":{"n":$nBatch,"shuffleWrite":$swD,"sec":${f"$secD%.3f"}}""")
      graft.ext.SignatureStore.deleteStore(java.nio.file.Paths.get(decStore))
      // IVF+PQ pruning evidence: score the SAME pre-built (checkpointed)
      // PQ structures full-scan vs cell-pruned, so the tally isolates
      // the search stage (training shuffles are identical in both
      // operators and would otherwise swamp the comparison).
      val e2 = embDf.select("vec_id", "embedding")
      val qset = e2.filter(col("vec_id") < 10)
      val cents = graft.ext.Similarity
        .trainCentroids(e2, "vec_id", "embedding", k = 8, iters = 1)
        .localCheckpoint(true)
      val (codesRaw, dtabRaw) = graft.ext.Similarity.pqStructures(
        qset, e2, "vec_id", "embedding", dim = 64, m = 8, codebookK = 16, iters = 2)
      val codes = codesRaw.localCheckpoint(true)
      val dtab = dtabRaw.localCheckpoint(true)
      val cand = graft.ext.Similarity.assignCellsN(qset, cents, "vec_id", "embedding", 2)
        .select(col("vec_id").as("query_id"), col("cell").as("qcell"))
        .join(graft.ext.Similarity.assignCells(e2, cents, "vec_id", "embedding")
          .select(col("vec_id").as("neighbor_id"), col("cell").as("ncell")),
          col("qcell") === col("ncell") && col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"), col("ncell").as("cell_ivf"))
        .localCheckpoint(true)
      val nCand = cand.count()
      def scoreSw(df: org.apache.spark.sql.DataFrame): (Long, Double) = {
        tally.reset()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        (tally.settled()._2, sec)
      }
      val (swFull, secFull) = scoreSw(graft.ext.Similarity.adcScoreAll(codes, dtab))
      val (swPruned, secPruned) = scoreSw(graft.ext.Similarity.adcScoreCandidates(codes, dtab, cand))
      System.err.println(f"[scale] $label/ivfpq_scoring full=$swFull pruned=$swPruned cand=$nCand")
      sb.append(s""","ivfpq_scoring":{"n":$nVec,"candidates":$nCand,""" +
        s""""fullScanShuffleWrite":$swFull,"fullScanSec":${f"$secFull%.3f"},""" +
        s""""prunedShuffleWrite":$swPruned,"prunedSec":${f"$secPruned%.3f"}}""")
      // Cell-partitioned code LAYOUT evidence (VERDICT r6 missing #2):
      // the same codes written hive-partitioned by coarse cell, then
      // scanned full vs probed-cells-only — the input-bytes drop is the
      // file-level pruning ivfPqTopK's scaladoc promises at scale.
      val idxDir = Files.createTempDirectory("graft-pqidx").toString
      val coarse = graft.ext.Similarity.assignCells(e2, cents, "vec_id", "embedding")
        .select(col("vec_id").as("neighbor_id"), col("cell"))
      graft.ext.Similarity.writeCellPartitionedCodes(codes, coarse, idxDir)
      // ONE query's probe set (nProbe=2 of coarseK cells) — the
      // per-query scan cost the layout exists to bound; the 10-query
      // batch's union covers most cells and would mask the pruning
      val probed = graft.ext.Similarity
        .assignCellsN(qset.orderBy("vec_id").limit(1), cents, "vec_id", "embedding", 2)
        .select("cell").distinct().collect().map(_.getLong(0)).toSeq.sorted
      val allCells = spark.read.parquet(s"$idxDir/data")
        .select("cell").distinct().count()
      def scanBytes(df: org.apache.spark.sql.DataFrame): Long = {
        tally.reset()
        df.write.format("noop").mode("overwrite").save()
        tally.settled()._1
      }
      val fullBytes = scanBytes(spark.read.parquet(s"$idxDir/data"))
      val prunedBytes = scanBytes(
        graft.ext.Similarity.readCellPartitionedCodes(spark, idxDir, probed))
      System.err.println(s"[scale] $label/ivfpq_partition_pruning " +
        s"full=$fullBytes pruned=$prunedBytes probe=${probed.size}/$allCells")
      sb.append(s""","ivfpq_partition_pruning":{"cells":$allCells,""" +
        s""""probedCells":${probed.size},"fullScanBytes":$fullBytes,""" +
        s""""prunedScanBytes":$prunedBytes}""")
      // SignatureStore size evidence (VERDICT r7 #1): the store's keyed
      // shingles table (8-byte md5-prefix longs) vs the round-7 STRING
      // form on the same corpus half — the byte ratio is the "scales
      // with 8 bytes per distinct n-gram, not corpus text bytes" claim,
      // measured. Ingest wall time doubles as the store_ingest slope.
      val half = docs.select(col("doc_id"), col("text"))
        .filter(pmod(col("doc_id"), lit(2)) === 0)
      val storeDir = Files.createTempDirectory("graft-store-size").toString
      val tIng = System.nanoTime()
      graft.ext.SignatureStore.append(half, "doc_id", "text", storeDir)
      val ingSec = (System.nanoTime() - tIng) / 1e9
      val strDir = Files.createTempDirectory("graft-store-str").toString
      graft.ext.Dedup.shingleRows(half, "doc_id", "text")
        .write.parquet(s"$strDir/shingles")
      def dirBytes(p: String): Long = {
        val root = new java.io.File(p)
        def walk(f: java.io.File): Long =
          if (f.isDirectory) f.listFiles().map(walk).sum
          else if (f.getName.endsWith(".parquet")) f.length() else 0L
        if (root.exists) walk(root) else 0L
      }
      val keyedB = dirBytes(s"$storeDir/shingles")
      val strB = dirBytes(s"$strDir/shingles")
      System.err.println(f"[scale] $label/signature_store keyed=$keyedB string=$strB " +
        f"ratio=${strB.toDouble / math.max(1L, keyedB)}%.1f ingest=${ingSec}%.2fs")
      sb.append(s""","signature_store":{"ingestSec":${f"$ingSec%.3f"},""" +
        s""""signaturesBytes":${dirBytes(s"$storeDir/signatures")},""" +
        s""""shinglesKeyedBytes":$keyedB,"shinglesStringBytes":$strB,""" +
        s""""hashesBytes":${dirBytes(s"$storeDir/hashes")}}}""")
      graft.ext.SignatureStore.deleteStore(java.nio.file.Paths.get(storeDir))
      graft.ext.SignatureStore.deleteStore(java.nio.file.Paths.get(strDir))
    }
    sb.append('}')
    java.nio.file.Files.writeString(Paths.get(outJson), sb.toString)
    println(sb.toString)
    spark.stop()
  }
}
