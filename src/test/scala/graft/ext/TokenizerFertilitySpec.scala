package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** Per-language tokenizer fertility (round 18): the metric that shows
  * WHY the byte-level alphabet exists — under the ASCII `chars` base a
  * non-Latin language tokenizes to nothing (fertility undefined, the
  * language is invisible to a token budget), under `bytes` it gets a
  * real chars-per-token figure a mixture policy can act on. */
class TokenizerFertilitySpec extends AnyFlatSpec with Matchers with SparkFixture {

  behavior of "per-language tokenizer fertility"

  it should "give non-Latin text a real fertility under the byte alphabet and none under chars" in {
    import spark.implicits._
    val en = "the children walk to the quiet river in the morning and the " +
      "dog runs over the field near the house with their friends"
    val ru = "дети играют на улице утром и собака бежит по парку пока " +
      "женщина покупает свежий хлеб возле реки утром и говорит о погоде"
    val docs = Seq((1L, en), (2L, ru), (3L, en + " " + en)).toDF("doc_id", "text")

    def fertility(alphabet: String): Map[String, (Long, Option[Long])] = {
      val root = tempDir(s"fert-$alphabet")
      val tok = TokenizerStore.train(docs, "text", root, steps = 50,
        alphabet = alphabet)
      TokenizerStore.encodeIds(docs, "text", tok)
        .withColumn("__ls", LangId.scoresArrayCol(col("text")))
        .withColumn("lang_id2", LangId.verdictOf(col("__ls")))
        .groupBy("lang_id2")
        .agg(sum(org.apache.spark.sql.functions.length(col("text")))
            .cast("long").as("n_chars"),
          sum(col("n_bpe_tokens")).cast("long").as("n_bpe"))
        .select(col("lang_id2"), col("n_bpe"),
          when(col("n_bpe") > 0L, col("n_chars") * 10000L / col("n_bpe"))
            .cast("long").as("f"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .toMap
    }

    val chars = fertility("chars")
    chars("ru")._1 shouldBe 0L          // ASCII wall: zero tokens
    chars("ru")._2 shouldBe None        // fertility undefined
    chars("en")._2.get should be > 0L

    val bytes = fertility("bytes")
    bytes("ru")._1 should be > 0L       // byte base: the language exists
    val ruF = bytes("ru")._2.get
    val enF = bytes("en")._2.get
    ruF should be > 0L
    enF should be > 0L
    // Cyrillic costs ~2 UTF-8 bytes/char and this tiny corpus trains few
    // ru merges, so ru fertility (chars per token) sits BELOW en's —
    // exactly the under-served-language signal the metric exists to show
    ruF should be < enF
  }
}
