package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** Two consecutive ingestion batches against the persisted signature
  * store (VERDICT r6 next-round #1): batch 2 must flag duplicates of
  * batch-1 documents WITHOUT re-reading any batch-1 text — the corpus
  * side of every join is the store's parquet (signatures / n-grams /
  * hashes), so a run's text work is O(batch). */
class SignatureStoreSpec extends AnyFlatSpec with Matchers with SparkFixture {

  private def docsDf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val base =
    "the quick brown fox jumps over the lazy dog and runs far away into the green forest tonight"
  private val other =
    "completely different content about databases indexes storage engines and query optimizers at scale"

  behavior of "SignatureStore"

  it should "flag exact and near duplicates across consecutive batches, O(batch) per run" in {
    val store = tempDir("sigstore")
    val batch1 = docsDf(1L -> base, 2L -> other)
    SignatureStore.append(batch1, "doc_id", "text", store)

    // batch 2: 10 = exact copy of doc 1, 11 = near copy (one word
    // changed), 12 = fresh content
    val batch2 = docsDf(
      10L -> base,
      11L -> base.replace("tonight", "tomorrow"),
      12L -> "unrelated corpus entry mentioning compilers type systems and effect tracking research")
    val out = SignatureStore.dedupBatch(batch2, "doc_id", "text", store)
      .orderBy("doc_id").collect()

    out.map(_.getLong(0)) shouldBe Array(10L, 11L, 12L)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    byId(10L).getLong(1) shouldBe 1L // exact_dup
    byId(10L).getLong(3) shouldBe 1L // near_dup (an exact copy is also near)
    byId(11L).getLong(1) shouldBe 0L
    byId(11L).getLong(3) shouldBe 1L // near-dup of stored doc 1
    byId(12L).getLong(1) shouldBe 0L
    byId(12L).getLong(3) shouldBe 0L

    // admit batch 2, then batch 3 must match against batch-2 members
    SignatureStore.append(batch2, "doc_id", "text", store)
    val batch3 = docsDf(20L -> base.replace("tonight", "tomorrow"))
    val r3 = SignatureStore.dedupBatch(batch3, "doc_id", "text", store)
      .collect().head
    r3.getLong(1) shouldBe 1L // exact copy of doc 11 (stored in batch 2)
    r3.getLong(3) shouldBe 1L

    // O(batch) evidence: the dedup plan reads document TEXT only from
    // the incoming in-memory batch — every parquet scan is a store
    // table (signatures / shingles / hashes), none carries a text column
    val p = SignatureStore.dedupBatch(batch3, "doc_id", "text", store)
      .queryExecution.executedPlan.toString
    val parquetScans = p.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    parquetScans should not be empty
    all(parquetScans) should include regex "sigstore"
    no(parquetScans) should include("text")
  }

  it should "never enumerate same-side pairs in crossCandidates (two-frame band join)" in {
    val left = Dedup.minhashFromShingles(
      Dedup.shingleRows(docsDf(1L -> base, 3L -> base), "doc_id", "text"), "doc_id")
    val right = Dedup.minhashFromShingles(
      Dedup.shingleRows(docsDf(2L -> base, 4L -> base), "doc_id", "text"), "doc_id")
    val cand = Dedup.crossCandidates(left, right, "doc_id").collect()
    // 1 and 3 are identical (same side) — must NOT pair; every pair is
    // (left id, right id)
    cand.map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe
      Set((1L, 2L), (1L, 4L), (3L, 2L), (3L, 4L))
  }

  it should "tolerate an at-least-once re-append of the same batch" in {
    // a replayed epoch appends the identical batch twice; the verify
    // must not double n_common (which would inflate Jaccard) and the
    // candidate/exact tiers must not double-count
    val store = tempDir("sigstore-replay")
    val batch1 = docsDf(1L -> base, 2L -> other)
    SignatureStore.append(batch1, "doc_id", "text", store)
    SignatureStore.append(batch1, "doc_id", "text", store) // replay
    val out = SignatureStore.dedupBatch(
        docsDf(10L -> base.replace("tonight", "tomorrow")), "doc_id", "text", store)
      .collect().head
    out.getLong(1) shouldBe 0L // not an exact dup
    out.getLong(2) shouldBe 1L // ONE candidate pair, not two
    out.getLong(3) shouldBe 1L // near-dup verified with correct Jaccard
  }

  it should "reproduce the first run's output when the store already contains the batch" in {
    // the crash-after-append replay of the foreachBatch loop: the
    // epoch re-runs dedupBatch with its OWN batch already stored — the
    // batch ids are anti-joined off the store side, so no doc is
    // flagged as a duplicate of its own stored copy and n_common
    // cannot double through duplicated shingle rows
    val store = tempDir("sigstore-selfstore")
    val batch1 = docsDf(1L -> base, 2L -> other)
    SignatureStore.append(batch1, "doc_id", "text", store)
    val firstRun = Array((1L, 0L, 0L, 0L), (2L, 0L, 0L, 0L))
    SignatureStore.dedupBatch(batch1, "doc_id", "text", store)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))) shouldBe firstRun
    // and with a REAL prior corpus plus the batch self-stored, the
    // batch still matches the prior corpus exactly as on first run
    val batch2 = docsDf(10L -> base)
    SignatureStore.append(batch2, "doc_id", "text", store)
    val replay = SignatureStore.dedupBatch(batch2, "doc_id", "text", store)
      .collect().head
    replay.getLong(1) shouldBe 1L // exact dup of stored doc 1 (not of itself)
    replay.getLong(2) shouldBe 1L // one candidate: doc 1, never doc 10
    replay.getLong(3) shouldBe 1L
  }

  it should "drive an ingestion loop from foreachBatch: dedup each micro-batch, then admit it" in {
    // the production wiring: a stream's foreachBatch checks every
    // micro-batch against the store and appends it — batch N+1 sees
    // batch N's signatures, text work stays O(micro-batch)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = tempDir("sigstore-stream")
    val src = MemoryStream[(Long, String)]
    val flagged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = src.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val hasStore = new java.io.File(s"$store/signatures").exists()
        if (hasStore)
          flagged ++= SignatureStore.dedupBatch(batch, "doc_id", "text", store)
            .orderBy("doc_id")
            .select("doc_id", "exact_dup", "near_dup")
            .as[(Long, Long, Long)].collect()
        else
          flagged ++= batch.select(col("doc_id")).as[Long].collect()
            .sorted.map(id => (id, 0L, 0L))
        SignatureStore.append(batch, "doc_id", "text", store)
        ()
      }
      .option("checkpointLocation", tempDir("sigstore-ckpt"))
      .start()
    src.addData(1L -> base, 2L -> other)
    q.processAllAvailable()
    src.addData(10L -> base, 11L -> "entirely new material with plenty of distinct tokens to shingle and sign")
    q.processAllAvailable()
    q.stop()
    flagged.toList shouldBe List(
      (1L, 0L, 0L), (2L, 0L, 0L), // first batch: empty store
      (10L, 1L, 1L), (11L, 0L, 0L)) // 10 duplicates stored doc 1
  }

  it should "store shingle KEYS (8-byte longs), never n-gram strings" in {
    // VERDICT r7 #1: the string form made the shingles table a multiple
    // of the corpus text bytes; the keyed form is 8 bytes per
    // (doc, distinct n-gram) row — and the dedup_incremental_store
    // oracle hash-verifies the keyed path against DuckDB's true-string
    // Jaccard, so a key collision at test scale would surface there
    val store = tempDir("sigstore-keys")
    SignatureStore.append(docsDf(1L -> base, 2L -> other), "doc_id", "text", store)
    val sh = SignatureStore.shingles(spark, store)
    sh.schema("x").dataType shouldBe org.apache.spark.sql.types.LongType
    sh.schema.fields.map(_.dataType).collect {
      case org.apache.spark.sql.types.StringType => ()
    } shouldBe empty
    // bucket partition column rides the directory name, not file bytes
    sh.columns.toSet shouldBe Set("doc_id", "x", "bkt")
  }

  it should "record a commit marker per append, written last" in {
    val store = tempDir("sigstore-commit")
    SignatureStore.committedBatches(spark, store) shouldBe empty
    val id1 = SignatureStore.append(docsDf(1L -> base), "doc_id", "text", store)
    val id2 = SignatureStore.append(docsDf(2L -> other), "doc_id", "text", store)
    SignatureStore.committedBatches(spark, store).toSet shouldBe Set(id1, id2)
  }

  it should "compact N appends into a bounded file count with identical results" in {
    // every append adds one file per table per touched bucket — the
    // maintenance pass must rewrite each (bucket, schema) group in
    // place without changing any query result
    val store = tempDir("sigstore-compact")
    // 2 buckets (recorded in store metadata at creation; later appends
    // reuse the recorded count) so the 6 appends pile files into the
    // same bucket directories and the compactor has groups to merge
    SignatureStore.append(docsDf(1L -> s"$base unique suffix token number 1"),
      "doc_id", "text", store, nBuckets = 2)
    (2L to 6L).foreach { i =>
      SignatureStore.append(
        docsDf(i -> s"$base unique suffix token number $i"), "doc_id", "text", store)
    }
    val batch = docsDf(100L -> base.replace("tonight", "tomorrow"))
    val before = SignatureStore.dedupBatch(batch, "doc_id", "text", store)
      .orderBy("doc_id").collect().map(_.toSeq)

    def dataFiles(table: String): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$store/$table/data")).filter(_.getName.endsWith(".parquet"))
    }
    val filesBefore = dataFiles("shingles").size
    filesBefore should be >= 6 // one per append at minimum

    SignatureStore.compact(spark, store)
    // per (bucket, schema-hash) group: everything merged to one file
    val byDir = dataFiles("shingles").groupBy(_.getParentFile.getName)
    all(byDir.values.map(_.size)) shouldBe 1
    dataFiles("shingles").size should be < filesBefore

    val after = SignatureStore.dedupBatch(batch, "doc_id", "text", store)
      .orderBy("doc_id").collect().map(_.toSeq)
    after shouldBe before
  }

  it should "run scheduled compaction from the ingestion loop without changing results" in {
    // the maintenance policy a foreachBatch driver wires after append:
    // every 2 committed batches, compact — file growth stays bounded
    // while dedup results are byte-identical before/after
    val store = tempDir("sigstore-maybecompact")
    SignatureStore.append(docsDf(1L -> s"$base one"), "doc_id", "text", store, nBuckets = 2)
    SignatureStore.maybeCompact(spark, store, every = 2) shouldBe empty // 1 commit: not due
    (2L to 4L).foreach { i =>
      SignatureStore.append(docsDf(i -> s"$base $i"), "doc_id", "text", store)
      SignatureStore.maybeCompact(spark, store, every = 2)
    }
    // 4 commits → compactions ran at 2 and 4; shingles files are one
    // per (bucket, schema) group, not one per append
    def shingleFiles: Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$store/shingles/data")).filter(_.getName.endsWith(".parquet"))
    }
    shingleFiles.groupBy(_.getParentFile.getName).values.foreach(_.size shouldBe 1)
    val out = SignatureStore.dedupBatch(docsDf(100L -> s"$base one"), "doc_id", "text", store)
      .collect().head
    out.getLong(1) shouldBe 1L // exact copy of stored doc 1, found post-compaction
    out.getLong(3) shouldBe 1L // and a near-dup via the compacted signature/shingle tables
  }

  it should "prune store buckets and avoid a store-side shuffle in the capped verify read" in {
    // design-for-scale audit: with a positive maxBucket (the
    // production setting — candidate count is then bounded by LSH
    // occupancy caps) the candidate-restricted shingle read must
    // (a) broadcast the candidate id set (no shuffle of the store
    // side), and (b) carry a dynamic-partition-pruning filter on bkt so
    // only the candidates' bucket directories are read at all
    val store = tempDir("sigstore-prune")
    SignatureStore.append(docsDf((1L to 20L).map(i =>
      i -> s"$base distinct tail marker $i"): _*), "doc_id", "text", store)
    val df = SignatureStore.dedupBatch(
      docsDf(100L -> base.replace("tonight", "tomorrow")), "doc_id", "text", store,
      maxBucket = 64)
    val plan = df.queryExecution.executedPlan.toString
    val shingleScanLines = plan.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains("shingles/data")).toSeq
    shingleScanLines should not be empty
    atLeast(1, shingleScanLines) should include("dynamicpruningexpression(bkt")
  }

  it should "NOT force a broadcast of the candidate set when buckets are uncapped" in {
    // ADVICE r8 #1: with maxBucket = 0 nothing bounds the candidate
    // set (a boilerplate-heavy corpus makes it O(batch × bucket
    // size)) — the verify read must leave join strategy to AQE instead
    // of statically hinting a broadcast that could OOM at scale. The
    // static plan for the store-side semi-join therefore starts as a
    // non-broadcast join (AQE may still flip it at runtime from
    // observed sizes — that fallback is the point).
    val store = tempDir("sigstore-nocap")
    SignatureStore.append(docsDf((1L to 20L).map(i =>
      i -> s"$base distinct tail marker $i"): _*), "doc_id", "text", store)
    // model the at-scale statistics (estimates over the broadcast
    // threshold) by disabling size-based auto-broadcast: a forced HINT
    // would still plan BroadcastHashJoin here — the gate must not
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SignatureStore.dedupBatch(
        docsDf(100L -> base.replace("tonight", "tomorrow")), "doc_id", "text", store)
      val initial = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val semiLines = initial.linesIterator
        .filter(l => l.contains("LeftSemi")).toSeq
      semiLines should not be empty
      val bktSemi = semiLines.filter(_.contains("bkt"))
      bktSemi should not be empty
      // the shingle-store semi-join must not be a statically-forced
      // broadcast (the batch-id anti-joins keep their explicit hints —
      // they are O(batch) by construction)
      no(bktSemi) should include("Broadcast")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  it should "cap degenerate corpus-side band buckets in crossCandidates (skew guard)" in {
    // 40 identical corpus docs hash to the same band buckets — without
    // the cap, one incoming near-dup doc yields 40 pairs in ONE join
    // partition; with maxBucket the hot bucket is dropped wholesale
    val corpus = Dedup.minhashFromShingles(
      Dedup.shingleRows(docsDf((1L to 40L).map(i => i -> base): _*), "doc_id", "text"),
      "doc_id")
    val incoming = Dedup.minhashFromShingles(
      Dedup.shingleRows(docsDf(100L -> base), "doc_id", "text"), "doc_id")
    Dedup.crossCandidates(incoming, corpus, "doc_id").count() shouldBe 40L
    Dedup.crossCandidates(incoming, corpus, "doc_id", maxBucket = 8).count() shouldBe 0L
  }

  it should "cap degenerate BATCH-side band buckets in crossCandidates too" in {
    // VERDICT r7 #6: an adversarial batch full of one boilerplate band
    // used to slip past the right-only cap and produce
    // |batch∩bucket|·m pairs in one partition — both sides are capped
    // now, bounding any bucket's contribution at maxBucket²
    val corpus = Dedup.minhashFromShingles(
      Dedup.shingleRows(docsDf(1L -> base, 2L -> other), "doc_id", "text"), "doc_id")
    val hotBatch = Dedup.minhashFromShingles(
      Dedup.shingleRows(docsDf((100L to 139L).map(i => i -> base): _*), "doc_id", "text"),
      "doc_id")
    Dedup.crossCandidates(hotBatch, corpus, "doc_id").count() shouldBe 40L
    Dedup.crossCandidates(hotBatch, corpus, "doc_id", maxBucket = 8).count() shouldBe 0L
  }

  it should "count bucket occupancy by distinct ids, not raw rows (replay-proof caps)" in {
    // ADVICE r7 #3: duplicate store rows from an at-least-once
    // re-append must not inflate a bucket past the cap — occupancy is
    // countDistinct(id), so a corpus of 5 docs appended twice still
    // fits under maxBucket=8 and candidates survive
    val corpusDocs = docsDf((1L to 5L).map(i => i -> base): _*)
    val once = Dedup.minhashFromShingles(
      Dedup.shingleRows(corpusDocs, "doc_id", "text"), "doc_id")
    val replayed = once.unionAll(once) // duplicate rows, same 5 ids
    val incoming = Dedup.minhashFromShingles(
      Dedup.shingleRows(docsDf(100L -> base), "doc_id", "text"), "doc_id")
    Dedup.crossCandidates(incoming, replayed, "doc_id", maxBucket = 8)
      .count() shouldBe 5L // raw-row counting would see 10 > 8 and drop the bucket
  }

  it should "cap degenerate band buckets in sidedCandidates (skew guard)" in {
    val rows = (1L to 40L).map(i => i -> base) :+ (100L -> base)
    val proj = Dedup.minhashFromShingles(
      Dedup.shingleRows(docsDf(rows: _*), "doc_id", "text"), "doc_id")
      .withColumn("side", org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("doc_id") === 100L, 1).otherwise(0))
    Dedup.sidedCandidates(proj, "doc_id", "side").count() shouldBe 40L
    Dedup.sidedCandidates(proj, "doc_id", "side", maxBucket = 8).count() shouldBe 0L
  }

  it should "agree with the one-table sided emulation on the dedup_incremental contract" in {
    // parity emulation (odd = incoming, even = corpus) run through the
    // STORE path must reproduce the oracle-checked query's output shape
    val corpus = docsDf(2L -> base, 4L -> other)
    val incoming = docsDf(1L -> base, 3L -> "novel text with enough words to pass the shingle threshold easily for this test")
    val store = tempDir("sigstore-parity")
    SignatureStore.append(corpus, "doc_id", "text", store)
    val out = SignatureStore.dedupBatch(incoming, "doc_id", "text", store)
      .orderBy("doc_id").collect()
    out.map(r => (r.getLong(0), r.getLong(1), r.getLong(3))) shouldBe
      Array((1L, 1L, 1L), (3L, 0L, 0L))
  }

  it should "refuse to open a store whose hash format predates the engine's (ADVICE r9)" in {
    // a v1 store (md5-of-raw-text hashes, store.json without a format
    // field) must fail LOUDLY: its hashes never equal contentHash's
    // sha-256, so proceeding would silently report exact_dup=0 forever
    val store = tempDir("sigstore-v1")
    val metaDir = java.nio.file.Paths.get(store, "metadata", "v0")
    java.nio.file.Files.createDirectories(metaDir)
    java.nio.file.Files.write(metaDir.resolve("store.json"),
      """{"buckets":16}""".getBytes("UTF-8"))
    val ex = intercept[IllegalStateException] {
      SignatureStore.dedupBatch(docsDf(1L -> base), "doc_id", "text", store)
    }
    ex.getMessage should include("format")
    // current-format stores carry the version and open normally
    val fresh = tempDir("sigstore-v2")
    SignatureStore.append(docsDf(1L -> base), "doc_id", "text", fresh)
    SignatureStore.buckets(spark, fresh) shouldBe SignatureStore.DefaultBuckets
  }

  it should "delete a doc so the store is row-identical to one that never saw it (VERDICT r11 #1)" in {
    import spark.implicits._
    // two stores, same appends except doc 2 — after delete(2) every
    // table must match the never-admitted store EXACTLY (per-doc rows
    // are independent, so retraction here is lossless)
    val store = tempDir("sigstore-del")
    val ghost = tempDir("sigstore-ghost")
    val b1 = docsDf(1L -> base, 2L -> other)
    val b2 = docsDf(3L -> base.replace("tonight", "tomorrow"))
    SignatureStore.append(b1, "doc_id", "text", store)
    SignatureStore.append(b2, "doc_id", "text", store)
    SignatureStore.append(docsDf(1L -> base), "doc_id", "text", ghost)
    SignatureStore.append(b2, "doc_id", "text", ghost)
    SignatureStore.delete(Seq(2L).toDF("doc_id"), "doc_id", store) shouldBe 1L

    def rows(path: String, table: String): Set[String] =
      spark.read.parquet(s"$path/$table/data").collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    Seq("hashes", "shingles", "signatures").foreach { t =>
      withClue(s"table $t: ") { rows(store, t) shouldBe rows(ghost, t) }
    }
    SignatureStore.tombstones(spark, store)
      .collect().map(_.getLong(0)).toSet shouldBe Set(2L)

    // a clone of the deleted doc is no longer flagged...
    val probe = SignatureStore.dedupBatch(docsDf(50L -> other), "doc_id", "text", store)
      .collect().head
    probe.getLong(1) shouldBe 0L // exact_dup gone
    probe.getLong(3) shouldBe 0L // near_dup gone
    // ...while duplicates of surviving docs still are
    val keep = SignatureStore.dedupBatch(docsDf(51L -> base), "doc_id", "text", store)
      .collect().head
    keep.getLong(1) shouldBe 1L
  }

  it should "reject a re-arriving tombstoned doc at ingest by default (VERDICT r12 #1)" in {
    import spark.implicits._
    val store = tempDir("sigstore-tomb")
    val ghost = tempDir("sigstore-tomb-ghost")
    val fresh = base.replace("tonight", "tomorrow")
    SignatureStore.append(docsDf(1L -> base, 2L -> other), "doc_id", "text", store)
    SignatureStore.delete(Seq(2L).toDF("doc_id"), "doc_id", store) shouldBe 1L
    // the tombstoned doc RE-ARRIVES in a later batch mixed with a new
    // doc: the new doc is admitted, the retracted one silently dropped
    SignatureStore.append(docsDf(2L -> other, 3L -> fresh), "doc_id", "text", store)
    // ghost store: never saw doc 2 at all — every table must match
    SignatureStore.append(docsDf(1L -> base), "doc_id", "text", ghost)
    SignatureStore.append(docsDf(3L -> fresh), "doc_id", "text", ghost)
    def rows(path: String, table: String): Set[String] =
      spark.read.parquet(s"$path/$table/data").collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    Seq("hashes", "shingles", "signatures").foreach { t =>
      withClue(s"table $t: ") { rows(store, t) shouldBe rows(ghost, t) }
    }
    // a clone of the tombstoned doc still matches nothing
    val probe = SignatureStore.dedupBatch(docsDf(50L -> other), "doc_id", "text", store)
      .collect().head
    probe.getLong(1) shouldBe 0L
    probe.getLong(3) shouldBe 0L
    // explicit opt-out re-admits (a takedown later reversed)
    SignatureStore.append(docsDf(2L -> other), "doc_id", "text", store,
      admitTombstoned = true)
    val readmitted = SignatureStore.dedupBatch(docsDf(50L -> other), "doc_id", "text", store)
      .collect().head
    readmitted.getLong(1) shouldBe 1L
  }
}
