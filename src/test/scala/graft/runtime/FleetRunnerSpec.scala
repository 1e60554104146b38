package graft.runtime

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture
import graft.model._

/** The multi-stream fleet contract (VERDICT r5 #7): N streams in ONE
  * Spark app, per-stream checkpoints, independent failure surfaces —
  * one stream's schema mismatch or fatal error never stops its
  * siblings, statuses arrive per stream id, and the process exit code
  * is the worst stream's. */
class FleetRunnerSpec extends AnyFlatSpec with Matchers with SparkFixture {

  /** Real-streaming builder: lands the declared frame in a memory
    * sink under its own checkpoint. */
  private final class MemSinkBuilder(mk: SparkSession => DataFrame,
      name: String, ckpt: String) extends StreamGraphBuilder {
    override def build(ctx: StreamContext, spark: SparkSession): DataFrame = mk(spark)
    override def start(ctx: StreamContext, df: DataFrame, trigger: Trigger): StreamingQuery =
      df.writeStream.outputMode("append").format("memory").queryName(name)
        .option("checkpointLocation", ckpt).trigger(trigger).start()
    var completed = 0
    override def onCompleted(ctx: StreamContext): Unit = completed += 1
  }

  private final class ThrowingBuilder(e: => Throwable) extends StreamGraphBuilder {
    override def build(ctx: StreamContext, spark: SparkSession): DataFrame = throw e
    override def start(ctx: StreamContext, df: DataFrame, trigger: Trigger): StreamingQuery =
      fail("start must not be reached")
  }

  private def backfillCtx(id: String) =
    StreamContext(id, "test", isBackfilling = true, spec = "{}")

  behavior of "FleetRunner"

  it should "complete the healthy stream while a sibling hits schema mismatch" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    in.addData((1L, "a"), (2L, "b"))
    val healthy = new MemSinkBuilder(_ => in.toDF().toDF("id", "v"),
      "fleet_healthy_out", tempDir("fleet-h-ckpt"))
    val broken = new ThrowingBuilder(new SchemaMismatchException("upstream added a column"))
    val statuses = new ConcurrentLinkedQueue[(String, String)]()

    val result = new FleetRunner(spark, (id, s) => statuses.add(id -> s)).run(Seq(
      StreamDecl(backfillCtx("healthy"), healthy, stopAfterBackfill = true),
      StreamDecl(backfillCtx("drifted"), broken, stopAfterBackfill = true)))

    // the healthy stream drained its backfill and published completion
    spark.table("fleet_healthy_out").count() shouldBe 2
    healthy.completed shouldBe 1
    // per-stream codes: schema mismatch follows the single-stream
    // contract (SUCCESS — the operator restarts it in backfill mode)
    result.statuses shouldBe Map(
      "healthy" -> ExitCodes.Success, "drifted" -> ExitCodes.Success)
    result.exitCode shouldBe ExitCodes.Success
    // statuses are tagged with the right stream id
    val byId = statuses.asScala.groupBy(_._1)
    byId("drifted").map(_._2).exists(_.startsWith("schema-mismatch")) shouldBe true
    byId("healthy").map(_._2) should contain("exit-code: 0")
  }

  it should "let the worst stream decide the process exit code" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Long]
    in.addData(1L)
    val healthy = new MemSinkBuilder(_ => in.toDF().toDF("id"),
      "fleet_sev_out", tempDir("fleet-sev-ckpt"))
    val transient = new ThrowingBuilder(new SchemaInconsistentException("mid-read drift"))
    val fatal = new ThrowingBuilder(new IllegalStateException("boom"))

    val result = new FleetRunner(spark, (_, _) => ()).run(Seq(
      StreamDecl(backfillCtx("ok"), healthy, stopAfterBackfill = true),
      StreamDecl(backfillCtx("transient"), transient, stopAfterBackfill = true),
      StreamDecl(backfillCtx("broken"), fatal, stopAfterBackfill = true)))

    result.statuses shouldBe Map("ok" -> ExitCodes.Success,
      "transient" -> ExitCodes.Restart, "broken" -> ExitCodes.Fatal)
    result.exitCode shouldBe ExitCodes.Fatal
    // without the fatal stream, the transient one decides
    FleetResult(result.statuses - "broken").exitCode shouldBe ExitCodes.Restart
    FleetResult(Map("ok" -> ExitCodes.Success)).exitCode shouldBe ExitCodes.Success
  }

  it should "reject duplicate stream ids" in {
    val b = new ThrowingBuilder(new IllegalStateException("unreached"))
    an[IllegalArgumentException] should be thrownBy
      new FleetRunner(spark).run(Seq(
        StreamDecl(backfillCtx("dup"), b), StreamDecl(backfillCtx("dup"), b)))
  }

  behavior of "GraftFleetMain"

  it should "parse the fleet env contract and flag unknown kinds per-stream" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Long]
    in.addData(7L)
    val healthy = new MemSinkBuilder(_ => in.toDF().toDF("id"),
      "fleet_env_out", tempDir("fleet-env-ckpt"))
    val statuses = new ConcurrentLinkedQueue[(String, String)]()
    val specs =
      """[{"streamId": "m1", "streamKind": "mem", "backfill": true,
        |  "spec": {"stopAfterBackfill": true}},
        | {"streamId": "bad", "streamKind": "no-such-kind", "spec": {}}]""".stripMargin
    val code = GraftFleetMain.run(spark,
      Map(GraftFleetMain.SpecsVar -> specs),
      extraKinds = Map("mem" -> healthy),
      statusReporter = (id, s) => statuses.add(id -> s))
    // the unknown kind is this fleet's worst stream (FATAL), but the
    // known stream still ran to completion
    code shouldBe ExitCodes.Fatal
    spark.table("fleet_env_out").count() shouldBe 1
    statuses.asScala.toSeq should contain(
      "bad" -> "fatal: unknown stream kind 'no-such-kind'")
  }

  it should "parse contexts faithfully" in {
    val ctxs = GraftFleetMain.parseFleet(
      """[{"streamId":"a","streamKind":"ct","backfill":true,"spec":{"x":1}},
        | {"streamId":"b","streamKind":"cdm"}]""".stripMargin)
    ctxs.map(_.streamId) shouldBe Seq("a", "b")
    ctxs.head.isBackfilling shouldBe true
    ctxs.head.spec shouldBe """{"x":1}"""
    ctxs(1).isBackfilling shouldBe false
    ctxs(1).spec shouldBe "{}"
  }
}
