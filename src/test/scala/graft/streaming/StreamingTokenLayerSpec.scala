package graft.streaming

import org.apache.spark.sql.DataFrame
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture
import graft.ext.TextOps

/** Round 20 (VERDICT r19 #1c): the streaming decision surface gated
  * under the UNICODE token layer — arrival-time verdicts over pure
  * non-Latin documents must match the batch build's `tok` semantics.
  *
  * The ASCII layer's streaming failure mode is pinned as contrast, and
  * it is WORSE than invisibility: `contentHash` normalizes to the
  * token join, so every pure-Cyrillic document normalizes to the SAME
  * empty string — the exact tier collapses distinct documents into one
  * hash group and verdicts real content `drop_exact` against an
  * unrelated keeper (silent data loss, not just missed dedup). */
class StreamingTokenLayerSpec extends AnyFlatSpec with Matchers with SparkFixture {

  // ~20-word Cyrillic sentences: enough shingle support for the near
  // tier, zero Latin characters anywhere
  private val ruA =
    "медленная река течёт через старый лес где высокие деревья держат " +
      "тихий свет утра и птицы собирают семена возле каменной стены " +
      "пока деревня спит"
  private val ruANear = ruA.replace("семена", "зёрна")
  private val ruB =
    "горные тропы требуют внимания потому что погода меняется быстро " +
      "над линией деревьев и усталый путник проверяет верёвки перед " +
      "каждым подъёмом к вершине плато"

  private def df(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def decide(store: String, batchKey: String,
      rows: Seq[(Long, String)],
      tok: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : Map[Long, (String, Long)] =
    StreamingDecision.processBatch(df(rows), "doc_id", "text",
        None, store, Seq.empty, batchKey, tok = tok)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

  behavior of "processBatch under the unicode token layer"

  it should "judge pure-Cyrillic arrivals exactly like Latin ones" in {
    val store = tempDir("tok-uni")
    val b0 = decide(store, "0", Seq((10L, ruA)), TextOps.tokensU)
    b0(10L) shouldBe ("keep", 10L)
    val b1 = decide(store, "1", Seq(
      (11L, ruA),      // exact clone → the stored owner claims it
      (21L, ruANear),  // one word changed → near tier
      (31L, ruB)),     // unrelated Cyrillic content → keep
      TextOps.tokensU)
    b1(11L) shouldBe ("drop_exact", 10L)
    b1(21L) shouldBe ("drop_near", 10L)
    b1(31L) shouldBe ("keep", 31L)
  }

  it should "collapse distinct pure-Cyrillic docs into one hash group under the ASCII layer (the r19 blind spot, kept as contrast)" in {
    val store = tempDir("tok-ascii")
    decide(store, "0", Seq((10L, ruA)), TextOps.tokens)(10L) shouldBe ("keep", 10L)
    val b1 = decide(store, "1", Seq((31L, ruB)), TextOps.tokens)
    // UNRELATED content verdicts drop_exact against an unrelated
    // keeper: both texts tokenize to [] and hash the empty join —
    // the data-loss mode the unicode layer exists to close
    b1(31L) shouldBe ("drop_exact", 10L)
  }
}
