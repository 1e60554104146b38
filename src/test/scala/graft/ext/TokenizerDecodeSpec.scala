package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** Round 20 (VERDICT r19 #5): the tokenizer DECODE surface —
  * decode(encode(x)) must reproduce the alphabet's normalized form of
  * x exactly (lowercase word join), for both alphabets, mixed scripts
  * included; unknown ids must null the row, never emit silent
  * garbage. The hash-pinned oracle (`text_tokenizer_decode`) proves
  * the same equality against DuckDB's independent normalization. */
class TokenizerDecodeSpec extends AnyFlatSpec with Matchers with SparkFixture {

  private val texts = Seq(
    1L -> "The quick brown fox jumps over the lazy dog 42 times",
    2L -> "привет мир и собака бежит по улице утром каждый день",
    3L -> "你好 世界 孩子们 在 公园 玩耍 天气 很好",
    4L -> "Mixed script: привет world 你好 dog 7",
    5L -> "")

  private def corpus = {
    import spark.implicits._
    texts.toDF("doc_id", "text")
  }

  behavior of "TokenizerStore.decodeIds"

  it should "round-trip mixed-script text under the bytes alphabet" in {
    val root = tempDir("tok-decode-bytes")
    val tok = TokenizerStore.train(corpus, "text", root, steps = 12,
      alphabet = "bytes")
    val out = TokenizerStore.decodeIds(
        TokenizerStore.encodeIds(corpus, "text", tok), "token_ids", tok)
      .withColumn("expected", concat_ws(" ", TextOps.tokensU(col("text"))))
      .select("doc_id", "decoded", "expected")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    out.length shouldBe texts.length
    out.foreach { case (id, dec, exp) =>
      withClue(s"doc $id: ") { dec shouldBe exp }
    }
  }

  it should "round-trip under the chars alphabet" in {
    val ascii = {
      import spark.implicits._
      texts.take(1).toDF("doc_id", "text")
    }
    val root = tempDir("tok-decode-chars")
    val tok = TokenizerStore.train(ascii, "text", root, steps = 8,
      alphabet = "chars")
    val row = TokenizerStore.decodeIds(
        TokenizerStore.encodeIds(ascii, "text", tok), "token_ids", tok)
      .select("decoded").head()
    row.getString(0) shouldBe "the quick brown fox jumps over the lazy dog 42 times"
  }

  it should "null the row on an unknown id instead of emitting garbage" in {
    import spark.implicits._
    val root = tempDir("tok-decode-bad")
    val tok = TokenizerStore.train(corpus, "text", root, steps = 4,
      alphabet = "bytes")
    val badId = tok.vocab.map(_._2).max + 1000L
    val df = Seq((1L, Seq(1L, badId))).toDF("doc_id", "token_ids")
    TokenizerStore.decodeIds(df, "token_ids", tok)
      .select("decoded").head().isNullAt(0) shouldBe true
  }
}
