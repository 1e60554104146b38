package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** VERDICT r8 #1/#4/#7: the persisted vector index must carry the
  * store family's durability discipline — a replayed append is a
  * no-op (commit markers), a crash-before-marker re-append cannot
  * corrupt ADC sums (read-side code dedupe), appends compact to
  * bounded file counts — and the lifecycle drift metric must flag a
  * distribution-shifted batch. */
class VectorIndexSpec extends AnyFlatSpec with Matchers with SparkFixture {

  private def corpus = graft.queries.QueryKit
    .table(spark, "/root/testdata/sf0.001", "embeddings")
    .select("vec_id", "embedding")

  private def tempIndex(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"vindex-$tag").toString

  private def cleanup(path: String): Unit =
    SignatureStore.deleteStore(java.nio.file.Paths.get(path))

  private def topKRows(path: String, queries: DataFrame): Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    VectorIndex.topK(queries, path, "vec_id", "embedding", k = 5, nProbe = 2)
      .select("query_id", "neighbor_id", "adist_e6", "rnk")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
  }

  private def codeFiles(path: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val data = java.nio.file.Paths.get(s"$path/codes/data")
    java.nio.file.Files.walk(data).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet"))
      .map(_.toString).toSeq
  }

  behavior of "VectorIndex commit discipline"

  it should "treat a replayed append (marker landed) as a no-op with identical topK" in {
    val path = tempIndex("replay")
    val e = corpus
    val half1 = e.filter(col("vec_id") < 250)
    val half2 = e.filter(col("vec_id") >= 250)
    VectorIndex.build(half1, "vec_id", "embedding", path,
      dim = 64, m = 8, codebookK = 16, coarseK = 4)
    val r1 = VectorIndex.append(half2, "vec_id", "embedding", path, Some("epoch-7"))
    r1.replayed shouldBe false
    val queries = e.filter(col("vec_id") < 5)
    val once = topKRows(path, queries)
    val filesAfterFirst = codeFiles(path).toSet
    // the foreachBatch replay: same checkpointed epoch id re-appended
    val r2 = VectorIndex.append(half2, "vec_id", "embedding", path, Some("epoch-7"))
    r2.replayed shouldBe true
    r2.batchId shouldBe "epoch-7"
    codeFiles(path).toSet shouldBe filesAfterFirst // nothing written
    topKRows(path, queries) shouldBe once
    VectorIndex.committedBatches(spark, path).count(_ == "epoch-7") shouldBe 1
    cleanup(path)
  }

  it should "survive a crash-before-marker re-append without doubling ADC distances" in {
    // the marker protocol's uncovered window: code files written, crash
    // before _commits/<id> lands, driver replays with a FRESH id (it
    // cannot know the old one committed — it didn't). Duplicate code
    // rows now exist; topK must collapse them so adist_e6 cannot double.
    val path = tempIndex("crashdup")
    val e = corpus
    val half1 = e.filter(col("vec_id") < 250)
    val half2 = e.filter(col("vec_id") >= 250)
    VectorIndex.build(half1, "vec_id", "embedding", path,
      dim = 64, m = 8, codebookK = 16, coarseK = 4)
    val queries = e.filter(col("vec_id") < 5)
    VectorIndex.append(half2, "vec_id", "embedding", path)
    val clean = topKRows(path, queries)
    VectorIndex.append(half2, "vec_id", "embedding", path) // duplicate rows land
    topKRows(path, queries) shouldBe clean
    cleanup(path)
  }

  it should "compact per-append small files to a bounded count with identical topK" in {
    val path = tempIndex("compact")
    val e = corpus
    VectorIndex.build(e.filter(col("vec_id") < 200), "vec_id", "embedding", path,
      dim = 64, m = 8, codebookK = 16, coarseK = 4)
    // five narrow appends — each adds one file per touched cell
    (0 until 5).foreach { i =>
      VectorIndex.append(
        e.filter(col("vec_id") >= 200 + i * 50 && col("vec_id") < 250 + i * 50),
        "vec_id", "embedding", path)
    }
    val queries = e.filter(col("vec_id") < 5)
    val before = topKRows(path, queries)
    val nBefore = codeFiles(path).size
    // maybeCompact triggers on the committed-batch cadence (6 commits,
    // every=3) and rewrites each cell partition to ~one file
    VectorIndex.maybeCompact(spark, path, every = 3) should not be empty
    val nAfter = codeFiles(path).size
    nAfter should be < nBefore
    val cells = codeFiles(path).flatMap(f =>
      "cell=(\\d+)".r.findFirstMatchIn(f).map(_.group(1))).toSet
    nAfter shouldBe cells.size // one file per cell partition
    topKRows(path, queries) shouldBe before
    cleanup(path)
  }

  behavior of "VectorIndex drift metric"

  it should "report ~1.0 for in-distribution appends and trip the rebuild threshold on a shifted batch" in {
    val path = tempIndex("drift")
    val e = corpus
    val built = VectorIndex.build(e.filter(col("vec_id") < 300), "vec_id", "embedding", path,
      dim = 64, m = 8, codebookK = 16, coarseK = 4)
    built.driftRatio shouldBe 1.0 // the build batch IS the baseline
    VectorIndex.buildQerrE6(spark, path) shouldBe Some(built.qerrE6)
    // in-distribution: more rows from the same table
    val same = VectorIndex.append(
      e.filter(col("vec_id") >= 300 && col("vec_id") < 400), "vec_id", "embedding", path)
    same.driftRatio should be < VectorIndex.DriftRebuildThreshold
    VectorIndex.needsRebuild(spark, path) shouldBe false
    // shifted distribution: the same vectors scaled far outside the
    // trained codebooks' range — quantization error explodes
    val shifted = e.filter(col("vec_id") >= 400 && col("vec_id") < 500)
      .select((col("vec_id") + 1000000).as("vec_id"),
        expr("transform(embedding, x -> x * CAST(25.0 AS FLOAT) + CAST(40.0 AS FLOAT))").as("embedding"))
    val drifted = VectorIndex.append(shifted, "vec_id", "embedding", path)
    drifted.driftRatio should be > VectorIndex.DriftRebuildThreshold
    VectorIndex.needsRebuild(spark, path) shouldBe true
    // the metric is persisted per append, not just returned
    val hist = VectorIndex.driftHistory(spark, path)
    hist.size shouldBe 3
    hist.map(_._1) should contain allOf (built.batchId, same.batchId, drifted.batchId)
    hist.find(_._1 == drifted.batchId).get._3 shouldBe drifted.driftRatio +- 1e-9
    cleanup(path)
  }

  it should "order driftHistory by persisted epoch, not file mtime" in {
    // two same-second appends whose batch ids sort OPPOSITE to append
    // order: an mtime-with-name-tiebreak ordering would interleave
    // them; the persisted epoch counter keeps exact append order
    val path = tempIndex("epoch")
    val e = corpus
    val built = VectorIndex.build(e.filter(col("vec_id") < 300), "vec_id", "embedding", path,
      dim = 64, m = 8, codebookK = 16, coarseK = 4)
    val r1 = VectorIndex.append(
      e.filter(col("vec_id") >= 300 && col("vec_id") < 400),
      "vec_id", "embedding", path, Some("zz-first"))
    val r2 = VectorIndex.append(
      e.filter(col("vec_id") >= 400), "vec_id", "embedding", path, Some("aa-second"))
    VectorIndex.driftHistory(spark, path).map(_._1) shouldBe
      Seq(built.batchId, r1.batchId, r2.batchId)
    cleanup(path)
  }

  behavior of "VectorIndex rebuild"

  it should "purge stale codes on rebuild so topK never mixes codebook generations" in {
    // ADVICE r9 (medium): build() retrains centroids/codebooks in
    // place, so any code rows encoded against the OLD books must die
    // with them — otherwise topK's replay-dedup arbitrarily picks
    // stale vs fresh codes and cells double-list moved vectors.
    val path = tempIndex("rebuild")
    val e = corpus
    val half1 = e.filter(col("vec_id") < 250)
    val half2 = e.filter(col("vec_id") >= 250)
    VectorIndex.build(half1, "vec_id", "embedding", path,
      dim = 64, m = 8, codebookK = 16, coarseK = 4)
    VectorIndex.append(half2, "vec_id", "embedding", path, Some("epoch-1"))
    // rebuild over the accumulated corpus, in place
    val rebuilt = VectorIndex.build(e, "vec_id", "embedding", path,
      dim = 64, m = 8, codebookK = 16, coarseK = 4)
    rebuilt.driftRatio shouldBe 1.0 // the rebuild batch IS the new baseline
    // drift metadata and commit markers restart with the rebuild
    VectorIndex.committedBatches(spark, path) shouldBe Seq(rebuilt.batchId)
    val hist = VectorIndex.driftHistory(spark, path)
    hist.map(_._1) shouldBe Seq(rebuilt.batchId)
    VectorIndex.needsRebuild(spark, path) shouldBe false
    // the rebuilt store is bit-identical to a FRESH build of the same
    // corpus — the only way that holds is if no stale generation survived
    val fresh = tempIndex("rebuild-fresh")
    VectorIndex.build(e, "vec_id", "embedding", fresh,
      dim = 64, m = 8, codebookK = 16, coarseK = 4)
    val queries = e.filter(col("vec_id") < 5)
    topKRows(path, queries) shouldBe topKRows(fresh, queries)
    cleanup(path); cleanup(fresh)
  }

  it should "recover recall on the shifted distribution after the drift-triggered rebuild" in {
    // VERDICT r9 #4: needsRebuild is a proxy; this closes the loop —
    // the documented operator response (build() over the accumulated
    // corpus) must RESTORE recall on the distribution that tripped it.
    import spark.implicits._
    val path = tempIndex("recall")
    val e = corpus
    // interleaved id spaces (A = even, B = odd) so the rebuild's
    // deterministic min-id seeds SPAN both distributions — the corpus
    // shape a drifted deployment has (new docs arrive under ids mixed
    // with old ones), and the documented requirement for seeded
    // retraining to represent the new mass
    val distA = e.filter(col("vec_id") % 2 === 0)
    // distribution B: scaled+offset — far outside A-trained codebooks
    val distB = e.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"),
        expr("transform(embedding, x -> x * CAST(25.0 AS FLOAT) + CAST(40.0 AS FLOAT))")
          .as("embedding"))
    VectorIndex.build(distA, "vec_id", "embedding", path,
      dim = 64, m = 8, codebookK = 16, coarseK = 4)
    VectorIndex.append(distB, "vec_id", "embedding", path, Some("b-batch"))
    VectorIndex.needsRebuild(spark, path) shouldBe true
    val accumulated = distA.unionByName(distB)
    val queriesB = distB.filter(col("vec_id") < 20L) // 10 shifted queries
    val exact = exactTopK(queriesB, accumulated, k = 5)
    def recallAt(p: String): Double = {
      val approx = VectorIndex.topK(queriesB, p, "vec_id", "embedding", k = 5, nProbe = 2)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rs = exact.map { case (q, ex) =>
        approx.get(q).fold(0.0)(a => a.intersect(ex).size.toDouble / ex.size)
      }
      rs.sum / rs.size
    }
    val stale = recallAt(path)
    VectorIndex.build(accumulated, "vec_id", "embedding", path,
      dim = 64, m = 8, codebookK = 16, coarseK = 4)
    VectorIndex.needsRebuild(spark, path) shouldBe false
    val recovered = recallAt(path)
    info(f"recall@5 on shifted distribution: stale $stale%.3f -> rebuilt $recovered%.3f")
    recovered should be > stale
    // the family's ADC-only recall floor (TrainingRobustnessSpec pins
    // 0.20 for half-sample training at this config); measured here:
    // stale 0.000 -> rebuilt 0.260. BASELINE.md records the pair.
    recovered should be >= 0.20
    cleanup(path)
  }

  behavior of "store-backed semantic dedup"

  it should "cap degenerate-cell pair work by splitting into deterministic subcells" in {
    // VERDICT r9 #2: a boilerplate corpus (near-identical embeddings)
    // collapses into ONE coarse cell — uncapped, that cell alone owns
    // |cell|²/2 pairs in one partition; the cap must bound it while
    // still dropping boilerplate members within each subcell.
    import spark.implicits._
    val boiler = Seq.tabulate(64)(i => if (i == 5) 1f else 0f)
    val e = (0L until 120L).map(i => (i, boiler)).toDF("vec_id", "embedding")
    val path = tempIndex("degen")
    VectorIndex.build(e, "vec_id", "embedding", path,
      dim = 64, m = 8, codebookK = 16, coarseK = 4)
    val cents = VectorIndex.coarse(spark, path, "embedding")
      .select(col("vi_cid").as("vec_id"), col("embedding"))
    // uncapped: the degenerate cell enumerates every pair
    Similarity.semanticPairs(e, "vec_id", "embedding", cents, 3000L)
      .count() shouldBe 120L * 119L / 2L
    // capped at 10: ceil(120/10) = 12 subcells of 10 -> 12 * 45 pairs
    Similarity.semanticPairs(e, "vec_id", "embedding", cents, 3000L, maxCellSize = 10)
      .count() shouldBe 12L * 45L
    // the capped decision still drops boilerplate: one keeper (the
    // subcell minimum) survives per subcell, everything else drops
    val dec = VectorIndex.semanticDedup(e, "vec_id", "embedding", path,
      minScoreE4 = 3000L, maxCellSize = 10)
    dec.filter(col("decision") === "keep").count() shouldBe 12L
    dec.filter(col("decision") === "drop").count() shouldBe 108L
    cleanup(path)
  }

  /** Exact L2 top-k ground truth per query id (the recall probe). */
  private def exactTopK(queries: DataFrame, e: DataFrame, k: Int): Map[Long, Set[Long]] = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    queries.alias("q").join(e.alias("n"), col("q.vec_id") =!= col("n.vec_id"))
      .withColumn("d", Similarity.sqDist("q.embedding", "n.embedding"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("q.vec_id")).orderBy(col("d").asc, col("n.vec_id").asc)))
      .filter(col("rnk") <= k)
      .select(col("q.vec_id"), col("n.vec_id")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  behavior of "VectorIndex streaming ingest"

  it should "ingest streamed batches exactly-once via batch-id commit markers" in {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = tempIndex("ingest")
    try {
      // the quantizer trains on the even half; the odd half arrives
      // as a stream afterwards — encode-only admission
      VectorIndex.build(corpus.filter(pmod(col("vec_id"), lit(2)) === 0),
        "vec_id", "embedding", path, dim = 64, m = 8, codebookK = 16, coarseK = 8)
      val odd = corpus.filter(pmod(col("vec_id"), lit(2)) === 1)
        .as[(Long, Seq[Float])].collect()
      val results = scala.collection.mutable.ArrayBuffer.empty[VectorIndex.AppendResult]
      val in = MemoryStream[(Long, Seq[Float])]
      val q = VectorIndex.appendStream(
          in.toDF().toDF("vec_id", "embedding"), path, "vec_id", "embedding") {
        r => results.synchronized { results += r }
      }
      try {
        val (b0, b1) = odd.splitAt(odd.length / 2)
        in.addData(b0: _*); q.processAllAvailable()
        in.addData(b1: _*); q.processAllAvailable()
      } finally q.stop()
      val ids = results.map(_.batchId).sorted.toSeq
      // markers are namespaced per stream instance (stream-<ns>-<n>)
      ids.map(_.split("-").last) shouldBe Seq("0", "1")
      ids.map(_.split("-").dropRight(1).mkString("-")).distinct.size shouldBe 1
      results.count(_.replayed) shouldBe 0
      // a crash re-delivery of batch 0 (foreachBatch replays the SAME
      // id within the SAME stream namespace) hits the marker and no-ops
      val replay = VectorIndex.append(
        odd.take(odd.length / 2).toSeq.toDF("vec_id", "embedding"),
        "vec_id", "embedding", path, batchId = Some(ids.head))
      replay.replayed shouldBe true
      // every vector is admitted exactly once
      spark.read.parquet(s"$path/codes/data")
        .select("neighbor_id").distinct().count() shouldBe corpus.count()
    } finally cleanup(path)
  }

  it should "not mistake a second checkpoint-less stream's batches for replays" in {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = tempIndex("ingest2")
    try {
      VectorIndex.build(corpus.filter(pmod(col("vec_id"), lit(2)) === 0),
        "vec_id", "embedding", path, dim = 64, m = 8, codebookK = 16, coarseK = 8)
      val odd = corpus.filter(pmod(col("vec_id"), lit(2)) === 1)
        .as[(Long, Seq[Float])].collect()
      val (b0, b1) = odd.splitAt(odd.length / 2)
      // two independent streams (no checkpoint) ingest into the SAME
      // index path; both start at batchId 0 — before namespacing, the
      // second stream's batch 0 collided with the first's marker and
      // was silently dropped (ADVICE r10, medium)
      val results = scala.collection.mutable.ArrayBuffer.empty[VectorIndex.AppendResult]
      def runOne(data: Seq[(Long, Seq[Float])]): Unit = {
        val in = MemoryStream[(Long, Seq[Float])]
        val q = VectorIndex.appendStream(
            in.toDF().toDF("vec_id", "embedding"), path, "vec_id", "embedding") {
          r => results.synchronized { results += r }
        }
        try { in.addData(data: _*); q.processAllAvailable() } finally q.stop()
      }
      runOne(b0); runOne(b1)
      results.map(_.batchId).forall(_.endsWith("-0")) shouldBe true
      results.map(_.batchId).distinct.size shouldBe 2
      results.count(_.replayed) shouldBe 0
      spark.read.parquet(s"$path/codes/data")
        .select("neighbor_id").distinct().count() shouldBe corpus.count()
    } finally cleanup(path)
  }

  behavior of "VectorIndex online serving"

  it should "serve streamed query batches bit-identically to the batch topK" in {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = tempIndex("serve")
    try {
      VectorIndex.build(corpus, "vec_id", "embedding", path,
        dim = 64, m = 8, codebookK = 16, coarseK = 8)
      val qSets = Seq(0L until 3L, 3L until 6L) // two micro-batches
      val expected = qSets.map { ids =>
        topKRows(path, corpus.filter(col("vec_id").isin(ids: _*)))
      }
      val got = scala.collection.mutable.Map.empty[Long, Seq[(Long, Long, Long, Long)]]
      val in = MemoryStream[(Long, Seq[Float])]
      val q = VectorIndex.topKStream(
          in.toDF().toDF("vec_id", "embedding"), path,
          "vec_id", "embedding", k = 5, nProbe = 2) { (res, batchId) =>
        got.synchronized {
          got(batchId) = res.select("query_id", "neighbor_id", "adist_e6", "rnk")
            .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
        }
      }
      try {
        val vecs = corpus.as[(Long, Seq[Float])].collect().toMap
        qSets.zipWithIndex.foreach { case (ids, _) =>
          in.addData(ids.map(i => (i, vecs(i))): _*)
          q.processAllAvailable()
        }
      } finally q.stop()
      // each micro-batch's served ranking equals the batch-path call
      // on the same queries — same assignment, pruning, ADC, ranks
      got.keySet.toSeq.sorted.map(got) shouldBe expected
    } finally cleanup(path)
  }

  it should "delete vectors so the code store matches one that never admitted them (VERDICT r11 #1)" in {
    import spark.implicits._
    val path = tempIndex("delete")
    val ghost = tempIndex("delete-ghost")
    try {
      val e = corpus
      // the retraction target: whatever the store ranks first for query 3
      VectorIndex.build(e, "vec_id", "embedding", path,
        dim = 64, m = 8, codebookK = 16, coarseK = 4)
      val q3 = e.filter(col("vec_id") === 3)
      val victim = VectorIndex.topK(q3, path, "vec_id", "embedding", k = 1, nProbe = 2)
        .head().getAs[Long]("neighbor_id")
      VectorIndex.delete(Seq(victim).toDF("vec_id"), "vec_id", path) shouldBe 1L
      // unfindable and unmatchable now…
      val after = VectorIndex.topK(q3, path, "vec_id", "embedding", k = 5, nProbe = 2)
        .select("neighbor_id").as[Long].collect()
      after should not contain victim
      VectorIndex.tombstones(spark, path)
        .collect().map(_.getLong(0)).toSet shouldBe Set(victim)
      // …and the surviving code rows are EXACTLY an index that never
      // admitted the victim (same build artifacts: copy coarse/books
      // so the ghost encodes against identical codebooks)
      Seq("coarse", "books", "metadata").foreach { d =>
        org.apache.commons.io.FileUtils.copyDirectory(
          new java.io.File(s"$path/$d"), new java.io.File(s"$ghost/$d"))
      }
      VectorIndex.append(e.filter(col("vec_id") =!= victim),
        "vec_id", "embedding", ghost)
      def codeRows(p: String): Set[String] =
        spark.read.parquet(s"$p/codes/data").collect()
          .map(_.toSeq.map(String.valueOf).mkString("|")).toSet
      codeRows(path) shouldBe codeRows(ghost)
      // ranked results over the survivors agree with the ghost too
      val got = VectorIndex.topK(q3, path, "vec_id", "embedding", k = 5, nProbe = 2)
        .select("query_id", "neighbor_id", "adist_e6", "rnk")
        .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
      val want = VectorIndex.topK(q3, ghost, "vec_id", "embedding", k = 5, nProbe = 2)
        .select("query_id", "neighbor_id", "adist_e6", "rnk")
        .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
      got shouldBe want
    } finally { cleanup(path); cleanup(ghost) }
  }

  it should "count deletions toward drift: a mass takedown trips needsRebuild, the rebuild excludes tombstoned ids (VERDICT r12 #5)" in {
    import spark.implicits._
    val path = tempIndex("massdel")
    try {
      val e = corpus.filter(col("vec_id") < 60)
      VectorIndex.build(e, "vec_id", "embedding", path,
        dim = 64, m = 8, codebookK = 16, coarseK = 2)
      VectorIndex.needsRebuild(spark, path) shouldBe false
      // the most populated cell and its members
      val byCell = spark.read.parquet(s"$path/codes/data")
        .select("neighbor_id", "cell").distinct()
        .collect().map(r => (r.getLong(0), r.getInt(1)))
        .groupBy(_._2).view.mapValues(_.map(_._1).sorted.toSeq).toMap
      val (_, members) = byCell.maxBy(_._2.size)
      // a sub-majority deletion does NOT flag…
      VectorIndex.delete(Seq(members.head).toDF("vec_id"), "vec_id", path)
      VectorIndex.needsRebuild(spark, path) shouldBe false
      // …but pushing the cell past the majority threshold does — with
      // no quantization-error movement at all (surviving codes are
      // untouched), the deleted-mass signal alone must trip
      val more = members.tail.take(members.size / 2 + 1 - 1)
      VectorIndex.delete(more.toDF("vec_id"), "vec_id", path)
      VectorIndex.needsRebuild(spark, path) shouldBe true
      // rebuild over the ORIGINAL corpus: tombstoned ids are excluded
      // from training and from the fresh code store, and both drift
      // signals reset
      VectorIndex.build(e, "vec_id", "embedding", path,
        dim = 64, m = 8, codebookK = 16, coarseK = 2)
      val victims = (members.head +: more).map(java.lang.Long.valueOf)
      spark.read.parquet(s"$path/codes/data")
        .filter(col("neighbor_id").isin(victims: _*)).count() shouldBe 0L
      VectorIndex.needsRebuild(spark, path) shouldBe false
    } finally cleanup(path)
  }

  it should "survive a rebuild whose corpus is entirely tombstoned" in {
    import spark.implicits._
    val path = tempIndex("empty-rebuild")
    try {
      val e = corpus.filter(col("vec_id") < 20)
      VectorIndex.build(e, "vec_id", "embedding", path,
        dim = 64, m = 8, codebookK = 8, coarseK = 2)
      VectorIndex.delete(e.select("vec_id"), "vec_id", path) shouldBe 20L
      // the total takedown: every accumulated id is tombstoned, so the
      // rebuild trains and encodes NOTHING — it must complete (not
      // crash on a missing code path) and leave a clean empty index
      VectorIndex.build(e, "vec_id", "embedding", path,
        dim = 64, m = 8, codebookK = 8, coarseK = 2)
      val probe = e.filter(col("vec_id") === 3)
      VectorIndex.topK(probe, path, "vec_id", "embedding", k = 5, nProbe = 2)
        .count() shouldBe 0L
      VectorIndex.needsRebuild(spark, path) shouldBe false
    } finally cleanup(path)
  }

  it should "serve and re-delete a codeless index whose takedown left a fileless code dir (ADVICE r13)" in {
    import spark.implicits._
    val path = tempIndex("codeless")
    try {
      val e = corpus.filter(col("vec_id") < 20)
      VectorIndex.build(e, "vec_id", "embedding", path,
        dim = 64, m = 8, codebookK = 8, coarseK = 2)
      // TOTAL takedown WITHOUT a rebuild: every cell= partition is
      // rewritten empty, but codes/data stays on disk as a directory
      // skeleton — bare schema inference would die on it
      VectorIndex.delete(e.select("vec_id"), "vec_id", path) shouldBe 20L
      // topK must serve the empty contract, not crash
      val probe = e.filter(col("vec_id") === 3)
      val got = VectorIndex.topK(probe, path, "vec_id", "embedding", k = 5, nProbe = 2)
      got.count() shouldBe 0L
      got.columns.toSeq shouldBe Seq("query_id", "neighbor_id", "cell", "adist_e6", "rnk")
      // a SECOND delete (late takedown arriving after the store is
      // already empty) must append its tombstones, not crash
      VectorIndex.delete(Seq(3L).toDF("vec_id"), "vec_id", path) shouldBe 1L
      VectorIndex.tombstones(spark, path).count() shouldBe 21L
      // the hard-negative composition over the codeless index serves
      // empty with the corpus-typed label column
      val lab = e.withColumn("label", (col("vec_id") % 3).cast("long"))
      val hn = VectorIndex.hardNegatives(lab.filter(col("vec_id") === 3), lab,
        path, "vec_id", "embedding", "label", k = 3, nProbe = 2)
      hn.count() shouldBe 0L
      hn.columns.toSeq shouldBe
        Seq("query_id", "neighbor_id", "neighbor_label", "score_e4", "rnk")
    } finally cleanup(path)
  }

  it should "reject a re-arriving tombstoned vector at append by default (VERDICT r12 #1)" in {
    import spark.implicits._
    val path = tempIndex("tomb")
    try {
      val e = corpus
      VectorIndex.build(e.filter(col("vec_id") < 40), "vec_id", "embedding", path,
        dim = 64, m = 8, codebookK = 16, coarseK = 4)
      VectorIndex.delete(Seq(7L).toDF("vec_id"), "vec_id", path) shouldBe 1L
      val before = spark.read.parquet(s"$path/codes/data").collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).toSet
      // re-arrival batch mixing the tombstoned vector with a new one:
      // only the new vector's codes may land
      VectorIndex.append(e.filter(col("vec_id") === 7 || col("vec_id") === 45),
        "vec_id", "embedding", path)
      val after = spark.read.parquet(s"$path/codes/data")
      after.filter(col("neighbor_id") === 7L).count() shouldBe 0L
      after.filter(col("neighbor_id") === 45L).count() should be > 0L
      // explicit opt-out re-admits
      VectorIndex.append(e.filter(col("vec_id") === 7), "vec_id", "embedding", path,
        admitTombstoned = true)
      spark.read.parquet(s"$path/codes/data")
        .filter(col("neighbor_id") === 7L).count() should be > 0L
      before should not be empty // sanity: the delete left survivors
    } finally cleanup(path)
  }
}
