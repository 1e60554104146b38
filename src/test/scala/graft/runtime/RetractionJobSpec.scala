package graft.runtime

import org.apache.spark.sql.functions.col
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture
import graft.model.ExitCodes

/** The hosted takedown job (round 12): env-configured retraction sweep
  * across the decision surface, cluster state, and the batch stores —
  * the operational form of the dedup_retraction oracle flow. */
class RetractionJobSpec extends AnyFlatSpec with Matchers with SparkFixture {

  private val textA =
    "the quick brown fox jumps over the lazy dog and runs far away into the green forest " +
      "while morning light spreads slowly across quiet hills where small birds gather seeds " +
      "beside the old stone wall near the river tonight"
  private val textB =
    "database engines schedule compaction tasks during idle windows so storage segments stay " +
      "balanced and query latency remains predictable even when ingestion bursts arrive from " +
      "many concurrent producers writing append only logs across partitioned durable volumes overnight"

  behavior of "RetractionJob"

  it should "purge, re-adjudicate, and heal the cluster from env config" in {
    import spark.implicits._
    val root = tempDir("retract-job")
    val store = s"$root/decision"; val cluster = s"$root/clusters"
    // arrival history (text-only two-tier surface): 10 owns, 11 and 12
    // drop against it; cluster {10,11,12}
    def decide(key: String, rows: Seq[(Long, String)]) =
      graft.streaming.StreamingDecision.processBatch(
        rows.toDF("doc_id", "text"), "doc_id", "text", None, store,
        Seq.empty, key, clusterPath = Some(cluster))
    decide("b0", Seq((10L, textA), (20L, textB)))
    decide("b1", Seq((11L, textA)))
    decide("b2", Seq((12L, textA)))
    // the takedown request + the corpus the job re-feeds content from
    Seq(10L).toDF("doc_id").write.parquet(s"$root/ids")
    Seq((10L, textA), (11L, textA), (12L, textA), (20L, textB))
      .toDF("doc_id", "text").write.parquet(s"$root/corpus")
    // a batch signature store to purge too
    val sigStore = s"$root/sig"
    graft.ext.SignatureStore.append(
      Seq((10L, textA), (20L, textB)).toDF("doc_id", "text"),
      "doc_id", "text", sigStore)

    val statuses = scala.collection.mutable.ArrayBuffer.empty[String]
    val code = RetractionJob.run(spark, Map(
      "RETRACT_IDS_PATH" -> s"$root/ids",
      "RETRACT_STORE_PATH" -> store,
      "RETRACT_CORPUS_PATH" -> s"$root/corpus",
      "RETRACT_CLUSTER_PATH" -> cluster,
      "RETRACT_SIGNATURE_STORE_PATH" -> sigStore), statuses += _)
    code shouldBe ExitCodes.Success
    statuses.exists(_.contains("retracting 1 ids")) shouldBe true

    // decision surface healed: earliest survivor owns, later one drops to it
    val dec = graft.streaming.StreamingDecision.decisions(spark, store)
      .select("doc_id", "decision", "keeper_id")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    dec(11L) shouldBe ("keep", 11L)
    dec(12L) shouldBe ("drop_exact", 11L)
    dec(20L) shouldBe ("keep", 20L)
    dec.contains(10L) shouldBe false
    // cluster rebuilt without the deleted id
    graft.ext.ComponentStore.components(spark, cluster)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
      Map(11L -> 11L, 12L -> 11L)
    // signature store purged: a clone of the deleted doc's content is
    // judged fresh there now (its only prior owner is gone)
    graft.ext.SignatureStore.tombstones(spark, sigStore)
      .collect().map(_.getLong(0)).toSet shouldBe Set(10L)
    // and the decision surface rejects the retracted id on re-arrival
    val b3 = graft.streaming.StreamingDecision.processBatch(
        Seq((10L, textB)).toDF("doc_id", "text"), "doc_id", "text", None,
        store, Seq.empty, "b3")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    b3(10L) shouldBe "drop_tombstone"
  }

  it should "exit Fatal on misconfiguration instead of corrupting" in {
    import spark.implicits._
    val root = tempDir("retract-bad")
    Seq(1L).toDF("doc_id").write.parquet(s"$root/ids")
    // missing required ids path
    RetractionJob.run(spark, Map.empty, _ => ()) shouldBe ExitCodes.Fatal
    // a lone embedding column without its quantizer (operator typo)
    RetractionJob.run(spark, Map(
      "RETRACT_IDS_PATH" -> s"$root/ids",
      "RETRACT_STORE_PATH" -> s"$root/store",
      "RETRACT_CORPUS_PATH" -> s"$root/corpus",
      "RETRACT_EMBEDDING_COLUMN" -> "embedding"), _ => ()) shouldBe ExitCodes.Fatal
  }
}
