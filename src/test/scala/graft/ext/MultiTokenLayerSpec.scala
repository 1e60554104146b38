package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** Round 20 (VERDICT r19 #1): the Unicode token layer through the FULL
  * corpus build. The r18/r19 multilingual stack (bytes tokenizer,
  * trained langID, language gates) sat on an ASCII `tokens()` layer
  * that silently discarded the very documents it exists for: a pure
  * Cyrillic/CJK doc tokenized to `[]`, failed `n_tokens >= 10`, and
  * died as `drop_quality` before the language gate or any near-dup
  * tier ever saw it. These specs pin the fix from both sides on the
  * planted pure-script corpus ([[ExtQueries.pureScriptDocs]]):
  * under `tokensU` the planted docs carry real token counts and full
  * dedup/language semantics; under the ASCII layer they remain
  * invisible — the exact blind spot the oracle-checked
  * pipeline_corpus_build_multi / dedup_near_multi entries close. */
class MultiTokenLayerSpec extends AnyFlatSpec with Matchers with SparkFixture {

  private val SF = "/root/testdata/sf0.001"

  private lazy val planted = ExtQueries.pureScriptDocs(spark, SF)
    .filter(pmod(col("doc_id"), lit(17)) === 0 ||
      pmod(col("doc_id"), lit(23)) === 0)

  behavior of "the pure-script corpus under the unicode build"

  it should "carry pure non-Latin docs past the quality gate into the full verdict spectrum" in {
    val led = ExtQueries.pipelineCorpusBuildMulti(spark, SF)
      .withColumn("plant",
        when(pmod(col("doc_id"), lit(17)) === 0, lit("ru"))
          .when(pmod(col("doc_id"), lit(23)) === 0, lit("zh")))
      .filter(col("plant").isNotNull)
      .select("doc_id", "plant", "verdict")
      .collect()
    led.length should be > 40
    // the r19 failure mode: every planted doc died here
    led.count(_.getString(2) == "drop_quality") shouldBe 0
    val verdicts = led.map(_.getString(2)).toSet
    // dedup tiers SEE the planted clones (shingles exist)
    verdicts should contain("drop_exact")
    verdicts should contain("drop_near")
    // the language gate SEES the planted languages (40% keep pct)
    verdicts should contain("drop_lang")
    // and survivors reach the built corpus
    verdicts should contain("keep")
  }

  it should "classify planted extracted text as ru/zh (the gate's input signal)" in {
    val v = ExtQueries.extractStageOf(planted)
      .withColumn("lang", LangId.verdictOf(LangId.scoresArrayCol(col("text"))))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every planted doc scores as its planted language — the Latin
    // page furniture ("fish chips tasty") never outweighs the body
    v.keySet shouldBe Set("ru", "zh")
  }

  behavior of "the ASCII layer on the same corpus (the r19 blind spot, kept as contrast)"

  it should "tokenize planted docs below the rule gate and shingle them to nothing" in {
    val ext = ExtQueries.extractStageOf(planted)
    // ascii token count never reaches the n_tokens >= 10 rule floor:
    // only the synthetic page's Latin furniture survives the splitter
    val mx = ext
      .agg(max(org.apache.spark.sql.functions.size(TextOps.tokens(col("text")))))
      .head().getInt(0)
    mx should be < 10
    // and the near-dup tiers get ZERO shingle rows — planted clones
    // are invisible to MinHash/SimHash/segment dedup entirely
    Dedup.shingleRows(planted, "doc_id", "text", 3).count() shouldBe 0L
  }

  behavior of "dedup_near_multi"

  it should "catch planted non-Latin near-dup clones as verified pairs" in {
    val pairs = ExtQueries.dedupNearMulti(spark, SF)
      .filter(col("is_dup") === 1L)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // same-group ru clones and zh clones both surface
    pairs.count { case (a, b) => a % 17 == 0 && b % 17 == 0 } should be > 0
    pairs.count { case (a, b) => a % 23 == 0 && b % 23 == 0 } should be > 0
    // the group token fences clone clusters: no cross-group pair ever
    // verifies (candidate volume stays bounded at corpus scale)
    pairs.filter { case (a, b) => a % 17 == 0 && b % 17 == 0 }
      .foreach { case (a, b) => a / 170 shouldBe b / 170 }
  }
}
