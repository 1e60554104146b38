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
}
