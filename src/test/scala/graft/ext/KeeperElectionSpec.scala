package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** Round 20 (VERDICT r19 #3): quality-aware keeper election in the
  * decision surface — `keeperMode = "best"` keeps each near/semantic
  * cluster's information-richest member (distinct-token count,
  * id-ascending ties — the dedup_cluster_best_keeper election) instead
  * of the min id, while `min` stays byte-identical to the historical
  * arithmetic. Planted pairs put the RICHER copy on the HIGHER id so
  * the two modes observably diverge. */
class KeeperElectionSpec extends AnyFlatSpec with Matchers with SparkFixture {

  private val textA =
    "the quick brown fox jumps over the lazy dog and runs far away into the green forest " +
      "while morning light spreads slowly across quiet hills where small birds gather seeds " +
      "beside the old stone wall near the river tonight"
  private val textB =
    "database engines schedule compaction tasks during idle windows so storage segments stay " +
      "balanced and query latency remains predictable even when ingestion bursts arrive from " +
      "many concurrent producers writing append only logs across partitioned durable volumes overnight"
  // the POORER near variant: a distinct word replaced by a REPEAT of a
  // word already present — one fewer unique token, same shingle overlap
  // class as the ordinary near-copy plants (3 of ~38 shingles change)
  private val textBPoor = textB.replace("overnight", "balanced")
  private val textF =
    "telescope arrays scan the southern sky every clear night recording faint pulsar timing " +
      "signals that drift slowly as interstellar plasma disperses each pulse differently across " +
      "receiver bands calibrated against atomic clocks in the observatory basement"
  private val textShort = "seven plain words sit right here now"

  private def oneHot(pos: Int): Seq[Float] =
    Seq.tabulate(64)(i => if (i == pos) 1f else 0f)

  private val docRows = Seq[(Long, String)](
    // near cluster where the RICHER copy has the HIGHER id
    100L -> textBPoor,
    101L -> textB,
    // exact group: byte-identical members — min-id owner in BOTH modes
    102L -> textA,
    103L -> textA,
    // semantic pair: unrelated text, identical embedding; 105 richer
    104L -> textShort,
    105L -> textF)
  private val embRows = Seq[(Long, Seq[Float])](
    100L -> oneHot(0), 101L -> oneHot(1), 102L -> oneHot(2),
    103L -> oneHot(3), 104L -> oneHot(50), 105L -> oneHot(50))

  private def decide(mode: String): Map[Long, (String, Long)] = {
    import spark.implicits._
    val d: DataFrame = docRows.toDF("doc_id", "text")
    val e: DataFrame = embRows.toDF("vec_id", "embedding")
    ExtQueries.dedupDecision(d, e, keeperMode = mode).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
  }

  behavior of "dedupDecision keeper election"

  it should "keep the richest near/semantic member under best and the min id under min" in {
    val best = decide("best")
    // near cluster: 101 is richer → elected keeper despite higher id
    best(101L) shouldBe ("keep", 101L)
    best(100L) shouldBe ("drop_near", 101L)
    // exact group: byte-identical copies tie on richness → min id
    best(102L) shouldBe ("keep", 102L)
    best(103L) shouldBe ("drop_exact", 102L)
    // semantic pair: textF carries far more unique tokens
    best(105L) shouldBe ("keep", 105L)
    best(104L) shouldBe ("drop_semantic", 105L)

    val min = decide("min")
    min(100L) shouldBe ("keep", 100L)
    min(101L) shouldBe ("drop_near", 100L)
    min(104L) shouldBe ("keep", 104L)
    min(105L) shouldBe ("drop_semantic", 104L)
  }

  it should "leave keeperMode=min byte-identical to the default surface" in {
    import spark.implicits._
    val d = docRows.toDF("doc_id", "text")
    val e = embRows.toDF("vec_id", "embedding")
    ExtQueries.dedupDecision(d, e, keeperMode = "min")
      .collect().map(_.toString).sorted shouldBe
      ExtQueries.dedupDecision(d, e).collect().map(_.toString).sorted
  }

  it should "reject an unknown mode" in {
    import spark.implicits._
    an[IllegalArgumentException] should be thrownBy
      ExtQueries.dedupDecision(docRows.toDF("doc_id", "text"),
        embRows.toDF("vec_id", "embedding"), keeperMode = "richest")
  }

  behavior of "DedupState under keeper election"

  it should "decide bit-identically to the in-plan best-keeper composition" in {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") >= 20)
      .select("doc_id", "source", "text")
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
      .join(d.select(col("doc_id").as("vec_id")), Seq("vec_id"))
    val expected = ExtQueries
      .dedupDecision(d.select("doc_id", "text"), e, keeperMode = "best")
      .collect().map(_.toString).sorted
    val got = DedupState.full(spark, d, e, tempDir("dedupstate-best"),
        keeperMode = "best")
      .collect().map(_.toString).sorted
    got shouldBe expected
  }
}
