package graft.ext

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** The persisted tokenizer artifact (round 17): train→store→load
  * round trip, deterministic id assignment, and exact id-level
  * encoding under the stored merges. */
class TokenizerStoreSpec extends AnyFlatSpec with Matchers with SparkFixture {

  behavior of "TokenizerStore"

  // hand corpus: tokens [xy, xy, xz]. Pair counts (x,y)=2, (y,_)=2,
  // (x,z)=1, (z,_)=1 → merge 1 = (x,y) (tie to lexicographic), then
  // (xy,_)=2 dominates → merge 2 = (xy,_).
  private def handDocs = {
    import spark.implicits._
    Seq((1L, "xy xy xz")).toDF("doc_id", "text")
  }

  it should "round-trip merges and assign deterministic vocab ids" in {
    val root = tempDir("tokstore-rt")
    val trained = TokenizerStore.train(handDocs, "text", root, steps = 2)
    trained.merges shouldBe Seq(("x", "y"), ("xy", "_"))

    val loaded = TokenizerStore.load(spark, root)
    loaded.merges shouldBe trained.merges
    loaded.version shouldBe 1L
    val v = loaded.vocab.toMap
    // fixed base alphabet: '_' then 0-9 then a-z (ids 0..36)
    v("_") shouldBe 0L
    v("0") shouldBe 1L
    v("a") shouldBe 11L
    v("x") shouldBe 34L
    v("z") shouldBe 36L
    // merged symbols follow in step order
    v("xy") shouldBe 37L
    v("xy_") shouldBe 38L
    loaded.vocabSize shouldBe 39

    // retraining over the same root is an idempotent overwrite
    TokenizerStore.train(handDocs, "text", root, steps = 2)
      .merges shouldBe trained.merges
  }

  it should "encode documents to exact BPE ids under the stored merges" in {
    import spark.implicits._
    val root = tempDir("tokstore-enc")
    TokenizerStore.train(handDocs, "text", root, steps = 2)
    val tok = TokenizerStore.load(spark, root)
    // "xy xz" → <x><y><_><x><z><_> → merge(x,y) → <xy><_>… →
    // merge(xy,_) → <xy_><x><z><_> → ids [xy_=38, x=34, z=36, _=0]
    val out = TokenizerStore.encodeIds(
        Seq((7L, "xy xz")).toDF("doc_id", "text"), "text", tok)
      .select("doc_id", "token_ids", "n_bpe_tokens")
      .as[(Long, Seq[Long], Long)].collect()
    out shouldBe Array((7L, Seq(38L, 34L, 36L, 0L), 4L))
  }

  // ----------------------------------------------------------------
  // round 18 (VERDICT r17 #1): the production encode path — the
  // native BpeEncodeIds expression — against the replace-chain
  // reference the oracles replay, at production merge counts
  // ----------------------------------------------------------------

  it should "match the replace-chain reference at 1,200 merges (production encode)" in {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // the BpeTrainSpec realistic-vocab corpus: 2,000 distinct
    // pseudo-words, Zipf-ish weights — trains 1,200 real merges
    val docs = (0 until 2000).map { i =>
      val w = f"${(i * 2654435761L) & 0xffffffffL}%08x"
      (i.toLong, (w + " ") * (i % 7 + 1) + f"${i % 97}%02d shared tail")
    }.toDF("doc_id", "text")
    val root = tempDir("tokstore-1k")
    val tok = TokenizerStore.train(docs, "text", root, steps = 1200)
    tok.merges.size shouldBe 1200

    val sample = docs.filter(col("doc_id") % 40 === 0)
    val fast = TokenizerStore.encodeIds(sample, "text", tok)
      .select("doc_id", "token_ids").as[(Long, Seq[Long])]
      .collect().sortBy(_._1)
    fast.length shouldBe 50
    all(fast.map(_._2.size)) should be > 0
    // the reference: 1,200 chained literal replaces + literal vocab
    // map — the exact arithmetic the pipeline_pack_bpe oracle replays
    val ref = TokenizerStore.encodeIdsReplay(sample, "text", tok)
      .select("doc_id", "token_ids").as[(Long, Seq[Long])]
      .collect().sortBy(_._1)
    fast shouldBe ref

    // plan shape: ONE expression node at 1,200 merges, inside
    // whole-stage codegen — no replace chain, no interpreted fallback
    // (parquet-backed frame: a local relation constant-folds the
    // projection away before the plan can be inspected)
    val parquetDocs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = TokenizerStore.encodeIds(parquetDocs, "text", tok)
      .select("token_ids").queryExecution.executedPlan
    val planStr = plan.toString
    planStr should include("graft_bpe_encode")
    planStr should not include "replace("
    // the "*(1)" star on the Project marks the whole-stage-codegen
    // stage — the expression generates code, no interpreted fallback
    planStr should include("*(1) Project [graft_bpe_encode")
  }

  it should "pin the replace chain's SEQUENTIAL semantics on a colliding merge list" in {
    import spark.implicits._
    // hand-built list where a later merge re-creates a surface that
    // participates in an EARLIER-rank pair: 1:(a,a) 2:(aab,d) 3:(aa,b).
    // On "aabd": r1 → [aa,b,d], r2 finds nothing, r3 → [aab,d] — and
    // rank 2's pass is OVER, so (aab,d) must NOT merge. The common
    // "always merge lowest rank present" encoder yields [aabd] here.
    val base = TokenizerStore.BaseAlphabet.zipWithIndex
      .map { case (t, i) => (t, i.toLong) }
    val vocab = base ++ Seq(("aa", 37L), ("aabd", 38L), ("aab", 39L))
    val tok = TokenizerStore.Tokenizer(
      Seq(("a", "a"), ("aab", "d"), ("aa", "b")), vocab, 1L)
    val df = Seq((1L, "aabd")).toDF("doc_id", "text")
    val got = TokenizerStore.encodeIds(df, "text", tok)
      .select("token_ids").as[Seq[Long]].head()
    got shouldBe Seq(39L, 14L, 0L) // [aab, d, _]
    // ground truth: the replace chain itself
    TokenizerStore.encodeIdsReplay(df, "text", tok)
      .select("token_ids").as[Seq[Long]].head() shouldBe got
  }

  it should "dedupe colliding vocab surfaces to the first id and fail on unknown symbols" in {
    import spark.implicits._
    // duplicate surface 'ab' at two ids — the encoder must take the
    // FIRST (ADVICE r17; the old literal map() threw at runtime under
    // mapKeyDedupPolicy=EXCEPTION)
    val base = TokenizerStore.BaseAlphabet.zipWithIndex
      .map { case (t, i) => (t, i.toLong) }
    val collided = base ++ Seq(("ab", 37L), ("ab", 40L))
    val tok = TokenizerStore.Tokenizer(Seq(("a", "b")), collided, 1L)
    val df = Seq((1L, "ab")).toDF("doc_id", "text")
    TokenizerStore.encodeIds(df, "text", tok)
      .select("token_ids").as[Seq[Long]].head() shouldBe Seq(37L, 0L)

    // load() applies the same first-id rule to stores written before
    // the dedupe
    val root = tempDir("tokstore-dupvocab")
    TokenizerStore.train(Seq((1L, "ab ab")).toDF("doc_id", "text"),
      "text", root, steps = 1)
    (base ++ Seq(("ab", 37L), ("ab", 40L)))
      .toDF("token", "token_id")
      .write.mode("overwrite").parquet(s"$root/vocab")
    val loaded = TokenizerStore.load(spark, root)
    loaded.vocab.count(_._1 == "ab") shouldBe 1
    loaded.vocab.find(_._1 == "ab").map(_._2) shouldBe Some(37L)

    // out-of-vocabulary symbol: loud failure, not null ids (ADVICE r17)
    val missingZ = TokenizerStore.Tokenizer(Seq.empty,
      base.filterNot(_._1 == "z"), 1L)
    val err = intercept[Exception] {
      TokenizerStore.encodeIds(Seq((1L, "z")).toDF("doc_id", "text"),
        "text", missingZ).select("token_ids").collect()
    }
    val causes = Iterator.iterate(err: Throwable)(_.getCause)
      .takeWhile(_ != null).toSeq
    causes.exists(c => Option(c.getMessage)
      .exists(_.contains("not in the tokenizer vocabulary"))) shouldBe true
  }

  it should "encode non-Latin text through the byte alphabet (round 18, Unicode base)" in {
    import spark.implicits._
    val docs = Seq(
      (1L, "Привет мир Привет"),
      (2L, "日本語のテスト 日本語"),
      (3L, "hello Привет wörld"),
      (4L, "naïve café naïve café")).toDF("doc_id", "text")
    val root = tempDir("tokstore-bytes")
    val tok = TokenizerStore.train(docs, "text", root, steps = 12,
      alphabet = "bytes")
    val loaded = TokenizerStore.load(spark, root)
    loaded.alphabet shouldBe "bytes"
    loaded.merges shouldBe tok.merges
    // fixed byte base: '_' = 0, byte 0x00 = 1, byte 0xff = 256,
    // merged symbols from 257
    val v = loaded.vocab.toMap
    v("_") shouldBe 0L
    v("00") shouldBe 1L
    v("ff") shouldBe 256L
    loaded.merges.headOption.foreach { case (a, b) =>
      v(a + b) shouldBe 257L
    }

    // every doc encodes (the chars alphabet dissolves docs 1-2 into
    // nothing); expression ≡ replace-chain replay byte for byte
    val fast = TokenizerStore.encodeIds(docs, "text", loaded)
      .select("doc_id", "token_ids").as[(Long, Seq[Long])]
      .collect().sortBy(_._1)
    all(fast.map(_._2.size)) should be > 0
    val ref = TokenizerStore.encodeIdsReplay(docs, "text", loaded)
      .select("doc_id", "token_ids").as[(Long, Seq[Long])]
      .collect().sortBy(_._1)
    fast shouldBe ref

    // engine-form trainer agrees with the fast trainer in byte mode
    val engine = BpeTrain.trainMerges(docs.select("text"), "text", 12, "bytes")
      .orderBy("step").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    engine shouldBe tok.merges
  }

  it should "agree with the engine trainer and refuse a non-store root" in {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("text")
    val root = tempDir("tokstore-real")
    val trained = TokenizerStore.train(docs, "text", root, steps = 8)
    // the fast trainer behind the store is step-for-step the engine
    // trainer (BpeTrainSpec pins it); the STORE path must carry the
    // same table through parquet
    val engine = BpeTrain.trainMerges(docs, "text", 8)
      .orderBy("step").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    trained.merges shouldBe engine
    TokenizerStore.load(spark, root).merges shouldBe engine

    val e = intercept[IllegalArgumentException] {
      TokenizerStore.load(spark, tempDir("tokstore-notastore"))
    }
    e.getMessage should include("tokenizer.json")
  }

  // -------------------------------------------------------------------
  // TOKENIZER DRIFT GATE (round 19, VERDICT r18 #4)
  // -------------------------------------------------------------------

  behavior of "the tokenizer drift gate"

  private def enDocs(n: Int) = {
    import spark.implicits._
    // function-word-rich English prose: classifies `en`, encodes well
    (1 to n).map(i =>
      (i.toLong, "the house and the river are quiet in the morning " +
        s"while the children walk to school with their friends $i"))
      .toSeq.toDF("doc_id", "text")
  }

  it should "record a fertility baseline at train and stay quiet on a stable corpus" in {
    val docs = enDocs(12)
    val root = tempDir("tokdrift-stable")
    TokenizerStore.train(docs, "text", root, steps = 10)
    val base = spark.read.parquet(s"$root/fertility")
    base.columns.sorted shouldBe Array("fertility_e4", "lang", "mass_e4",
      "n_bpe_tokens", "n_chars", "n_docs")
    base.filter(org.apache.spark.sql.functions.col("lang") === "en").count() shouldBe 1L
    // the same corpus (and any subset of it) stays quiet
    val v = TokenizerStore.needsRetrain(spark, root, docs, "text")
    v.hasBaseline shouldBe true
    v.trip shouldBe false
    val sub = TokenizerStore.needsRetrain(spark, root,
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0), "text")
    sub.trip shouldBe false
  }

  it should "trip on a language-mix shift past the mass floor" in {
    import spark.implicits._
    val root = tempDir("tokdrift-shift")
    TokenizerStore.train(enDocs(12), "text", root, steps = 10)
    // the corpus the store never saw: majority Russian (seed
    // vocabulary — classifies `ru`; the chars splitter yields no
    // tokens for it, exactly the silent-shredding case the gate exists
    // to catch)
    val shifted = enDocs(4).unionByName((100 to 111).map(i =>
        (i.toLong, "собака бежит по улице и дети играют в парке пока " +
          s"женщина покупает свежий хлеб утром $i"))
      .toSeq.toDF("doc_id", "text"))
    val v = TokenizerStore.needsRetrain(spark, root, shifted, "text")
    v.hasBaseline shouldBe true
    v.trip shouldBe true
    v.reasons.exists(r => r.contains("'ru'") &&
      (r.contains("absent at train") || r.contains("mass floor"))) shouldBe true
  }

  it should "trip on a within-language fertility regression" in {
    import spark.implicits._
    // baseline: 'the'-dominated text — 10 merges learn to compress it
    val baseline = (1 to 10).map(i =>
      (i.toLong, "the the the the the the the the the the"))
      .toSeq.toDF("doc_id", "text")
    val root = tempDir("tokdrift-regress")
    TokenizerStore.train(baseline, "text", root, steps = 10)
    val quiet = TokenizerStore.needsRetrain(spark, root, baseline, "text")
    quiet.trip shouldBe false
    // current: still verdict-en (th/he/at bigrams) but the merge table
    // compresses none of it — chars per token collapses past the 20%
    // tolerance
    val regressed = (1 to 10).map(i =>
      (i.toLong, "that bath than hath lath math path wrath swath heath"))
      .toSeq.toDF("doc_id", "text")
    val v = TokenizerStore.needsRetrain(spark, root, regressed, "text")
    v.trip shouldBe true
    v.reasons.exists(r => r.contains("'en'") &&
      r.contains("fertility regressed")) shouldBe true
  }

  it should "trip on the sampled check and honor the recordFertility opt-out" in {
    import spark.implicits._
    val root = tempDir("tokdrift-sampled")
    TokenizerStore.train(enDocs(12), "text", root, steps = 10)
    // the planted ru shift still trips through a 50% deterministic
    // text sample (masses are ratios; the sample is md5-bucketed on
    // the text so the same docs are checked every run)
    val shifted = enDocs(4).unionByName((100 to 111).map(i =>
        (i.toLong, "собака бежит по улице и дети играют в парке пока " +
          s"женщина покупает свежий хлеб утром $i"))
      .toSeq.toDF("doc_id", "text"))
    val v = TokenizerStore.needsRetrain(spark, root, shifted, "text",
      samplePct = 50L)
    v.trip shouldBe true

    // recordFertility = false: no baseline, gate inactive
    val root2 = tempDir("tokdrift-optout")
    TokenizerStore.train(enDocs(6), "text", root2, steps = 6,
      recordFertility = false)
    val v2 = TokenizerStore.needsRetrain(spark, root2, enDocs(6), "text")
    v2.hasBaseline shouldBe false
  }

  it should "be inactive for a store without a recorded baseline" in {
    val docs = enDocs(6)
    val root = tempDir("tokdrift-prer19")
    TokenizerStore.train(docs, "text", root, steps = 6)
    // simulate a pre-round-19 store: no fertility/ recorded
    val fdir = new java.io.File(s"$root/fertility")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(fdir)
    val v = TokenizerStore.needsRetrain(spark, root, docs, "text")
    v.hasBaseline shouldBe false
    v.trip shouldBe false
  }
}
