package graft.runtime

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture
import graft.model.{ExitCodes, StreamContext}
import graft.sinks.ArcaneLayoutReader

/** The composition root driven exactly the way the operator drives a
  * stream pod: STREAMCONTEXT__* environment → kind dispatch →
  * backfill lifecycle → arcane layout + exit code. */
class GraftMainSpec extends AnyFlatSpec with Matchers with SparkFixture {

  behavior of "GraftMain (env-contract hosting program)"

  private def env(kind: String, spec: String, backfill: Boolean = true) = Map(
    StreamContext.StreamIdVar -> "it-stream",
    StreamContext.StreamKindVar -> kind,
    StreamContext.BackfillVar -> backfill.toString,
    StreamContext.SpecVar -> spec)

  it should "run a REST backfill end-to-end from the env contract" in {
    graft.sources.dsv2.FakePagedApi.calls.clear()
    val target = tempDir("graftmain-rest-sink")
    val spec =
      s"""{
         |  "uriTemplate": "http://api/items?page=@page",
         |  "fetcherClass": "${classOf[graft.sources.dsv2.FakePagedApi].getName}",
         |  "totalPagesKeyChain": "meta.totalPages",
         |  "recordKeyChain": "items",
         |  "maxSweeps": "1",
         |  "sinkPath": "$target",
         |  "checkpointPath": "${tempDir("graftmain-rest-ckpt")}",
         |  "stopAfterBackfill": true
         |}""".stripMargin
    GraftMain.run(spark, env("rest", spec)) shouldBe ExitCodes.Success
    // the full layout contract landed: parts + schema + COMPLETED token
    ArcaneLayoutReader.isComplete(spark, target) shouldBe true
    ArcaneLayoutReader.readRaw(spark, target).count() shouldBe 10
  }

  it should "run a CT backfill end-to-end from the env contract" in {
    import graft.sources.dsv2.FakeCtServer
    FakeCtServer.reset()
    FakeCtServer.commit(1L, 10.0)
    FakeCtServer.commit(2L, 20.0)
    val target = tempDir("graftmain-ct-sink")
    val spec =
      s"""{
         |  "gatewayClass": "${classOf[FakeCtServer].getName}",
         |  "schemaName": "dbo", "tableName": "orders",
         |  "pkColumns": "id", "schemaDdl": "id BIGINT, total DOUBLE",
         |  "startVersion": "0",
         |  "sinkPath": "$target",
         |  "checkpointPath": "${tempDir("graftmain-ct-ckpt")}",
         |  "stopAfterBackfill": true
         |}""".stripMargin
    GraftMain.run(spark, env("ct", spec)) shouldBe ExitCodes.Success
    ArcaneLayoutReader.isComplete(spark, target) shouldBe true
    val rows = ArcaneLayoutReader.readRaw(spark, target)
    rows.count() shouldBe 2
    rows.columns should contain allOf ("id", "total", "SYS_CHANGE_VERSION",
      "SYS_CHANGE_OPERATION", "ChangeTrackingVersion", "ARCANE_MERGE_KEY")
  }

  it should "exit FATAL for an unknown stream kind" in {
    GraftMain.run(spark, env("mystery", "{}")) shouldBe ExitCodes.Fatal
  }

  it should "exit FATAL when required spec fields are missing" in {
    // misconfiguration surfaces through the operator contract (the
    // runner's supervision maps the build failure to FATAL), not as an
    // unhandled crash
    val reports = scala.collection.mutable.ArrayBuffer.empty[String]
    GraftMain.run(spark, env("rest", """{"uriTemplate": "http://x?page=@page"}"""),
      statusReporter = reports += _) shouldBe ExitCodes.Fatal
    reports.mkString should include("is required")
  }
}
