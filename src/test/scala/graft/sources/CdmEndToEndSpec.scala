package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture
import graft.model._
import graft.runtime.{CdmStreamGraphBuilder, StreamRunner}
import graft.sinks.{ArcaneParquetSink, SinkConfig}

/** End-to-end CDM pipeline over a generated SampleData-style layout —
  * the Scala analogue of the reference's CdmChangeFeedSourceTests
  * (backfill/incremental/total row counts 11/8/19, the shape of
  * CdmChangeFeedSourceTests.cs:33-35) plus the full sink-layout and
  * COMPLETED-token matrix (ParquetSinkTests.cs:174-310) through a real
  * Structured Streaming query.
  */
class CdmEndToEndSpec extends AnyFlatSpec with Matchers with SparkFixture {

  private val entity = "Widget"

  /** CDM entity document: change-feed shape (5 CDC columns + payload). */
  private val feedCdmJson =
    """{
      |  "jsonSchemaSemanticVersion": "1.4.0",
      |  "definitions": [
      |    {
      |      "entityName": "Widget",
      |      "hasAttributes": [
      |        {"name": "Start_LSN", "dataFormat": "String"},
      |        {"name": "End_LSN", "dataFormat": "String"},
      |        {"name": "DML_Action", "dataFormat": "String"},
      |        {"name": "Seq_Val", "dataFormat": "String"},
      |        {"name": "Update_Mask", "dataFormat": "String"},
      |        {"name": "RECID", "dataFormat": "Int64"},
      |        {"name": "NAME", "dataFormat": "String"},
      |        {"name": "QTY", "dataFormat": "Int32"}
      |      ]
      |    }
      |  ]
      |}""".stripMargin

  /** Base-entity document: _SysRowId/LSN instead of the CDC columns. */
  private val baseCdmJson =
    """{
      |  "jsonSchemaSemanticVersion": "1.4.0",
      |  "definitions": [
      |    {
      |      "entityName": "Widget",
      |      "hasAttributes": [
      |        {"name": "_SysRowId", "dataFormat": "String"},
      |        {"name": "LSN", "dataFormat": "String"},
      |        {"name": "RECID", "dataFormat": "Int64"},
      |        {"name": "NAME", "dataFormat": "String"},
      |        {"name": "QTY", "dataFormat": "Int32"}
      |      ]
      |    }
      |  ]
      |}""".stripMargin

  /** Feed document with an added column — the drift fixture (the
    * reference's SchemaChangeTests.cdm.json role). */
  private val driftedFeedCdmJson = feedCdmJson.replace(
    """{"name": "QTY", "dataFormat": "Int32"}""",
    """{"name": "QTY", "dataFormat": "Int32"},
      |        {"name": "ADDED", "dataFormat": "String"}""".stripMargin)

  /** Base document for the partition subfolder: NAME/QTY order swapped
    * — folder-local schema resolution must honor it
    * (CdmChangeFeedSource.cs:222-241). */
  private val baseSwappedCdmJson = baseCdmJson.replace(
    """{"name": "NAME", "dataFormat": "String"},
      |        {"name": "QTY", "dataFormat": "Int32"}""".stripMargin,
    """{"name": "QTY", "dataFormat": "Int32"},
      |        {"name": "NAME", "dataFormat": "String"}""".stripMargin)

  /** Write the SampleData-style layout: 11 base rows (6 at the entity
    * root + 5 in a partition subfolder with a swapped-column local
    * schema), 8 change-feed rows — the reference's counts. */
  private def writeFixture(): String = {
    val root = tempDir("cdm-e2e")
    Files.createDirectories(Paths.get(s"$root/Tables/$entity/2024"))
    Files.createDirectories(Paths.get(s"$root/ChangeFeed/$entity"))
    Files.writeString(Paths.get(s"$root/Tables/$entity/$entity.cdm.json"), baseCdmJson)
    Files.writeString(Paths.get(s"$root/Tables/$entity/2024/$entity.cdm.json"),
      baseSwappedCdmJson)
    Files.writeString(Paths.get(s"$root/ChangeFeed/$entity.cdm.json"), feedCdmJson)
    def baseRow(i: Int) = s"row$i,0X0$i,$i,name$i,${i * 10}"
    def swappedRow(i: Int) = s"row$i,0X0$i,$i,${i * 10},name$i" // QTY before NAME
    Files.writeString(Paths.get(s"$root/Tables/$entity/WIDGET_00001.csv"),
      (1 to 6).map(baseRow).mkString("\n"))
    Files.writeString(Paths.get(s"$root/Tables/$entity/2024/WIDGET_00002.csv"),
      (7 to 11).map(swappedRow).mkString("\n"))
    def feedRow(i: Int, action: String) =
      s""""0XA$i",,"$action","0XS$i","0XFF",${100 + i},feed$i,${i * 7}"""
    Files.writeString(Paths.get(s"$root/ChangeFeed/$entity/batch1.csv"),
      ((1 to 5).map(feedRow(_, "INSERT")) ++
        (6 to 8).map(feedRow(_, "AFTER_UPDATE"))).mkString("\n"))
    root
  }

  behavior of "CdmSource backfill + incremental (reference counts 11/8/19)"

  it should "read 11 backfill rows normalized to feed shape" in {
    val cdm = CdmSource(spark, writeFixture(), entity)
    val bf = cdm.backfill()
    bf.count() shouldBe 11
    // normalize: injected constants + rename + merge key from RECID
    bf.columns.toSeq shouldBe (cdm.feedSchema().fieldNames.toSeq :+ Constants.MergeKeyColumn)
    bf.select(countDistinct(col("DML_Action"))).head().getLong(0) shouldBe 1
    bf.select("DML_Action").head().getString(0) shouldBe "INSERT"
    bf.filter(col(Constants.MergeKeyColumn) === "5").count() shouldBe 1
    // folder-local schema honored: the swapped-column subfolder rows
    // still land QTY in QTY (sum over i*10 for i=1..11)
    bf.agg(sum("QTY")).head().getLong(0) shouldBe 660L
    bf.filter(col("RECID") === 9).select("NAME").head().getString(0) shouldBe "name9"
  }

  it should "read 8 incremental rows and 19 in total" in {
    val cdm = CdmSource(spark, writeFixture(), entity)
    val ch = cdm.changes()
    ch.count() shouldBe 8
    ch.filter(col("DML_Action") === "AFTER_UPDATE").count() shouldBe 3
    cdm.backfill().unionByName(ch).count() shouldBe 19
  }

  it should "abort on schema drift" in {
    val root = writeFixture()
    val cdm = CdmSource(spark, root, entity)
    val frozen = cdm.feedSchema()
    cdm.checkDrift(frozen) // identical: no throw
    Files.writeString(Paths.get(s"$root/ChangeFeed/$entity.cdm.json"), driftedFeedCdmJson)
    a[SchemaMismatchException] should be thrownBy cdm.checkDrift(frozen)
  }

  behavior of "CDM stream through the arcane sink (token matrix)"

  private def layout(target: String) = {
    val dir = new java.io.File(target)
    // drop local-FS checksum shadows (.<name>.crc) — a RawLocalFileSystem
    // artifact absent on object stores
    def ls(sub: String): Seq[String] = {
      val d = new java.io.File(dir, sub)
      Option(d.listFiles()).map(_.map(_.getName).toSeq).getOrElse(Nil)
        .filterNot(_.startsWith("."))
    }
    (ls("data"), ls("schema"), dir.listFiles().map(_.getName).toSeq.filterNot(_.startsWith(".")))
  }

  it should "drain the feed, write the full layout, and publish one token on graceful completion" in {
    val root = writeFixture()
    val target = tempDir("cdm-sink")
    val cdm = CdmSource(spark, root, entity)
    val sink = new ArcaneParquetSink(SinkConfig(target))
    val builder = new CdmStreamGraphBuilder(cdm, sink, tempDir("cdm-ckpt"),
      schemaUpdateIntervalMillis = 200)
    val runner = new StreamRunner(spark, statusReporter = _ => ())

    // AvailableNow drains every change-feed file then terminates
    runner.run(StreamContext("cdm-s1", "cdm", isBackfilling = true, "{}"),
      builder) shouldBe ExitCodes.Success

    val (data, schemaFiles, rootFiles) = layout(target)
    val hash = sink.schemaHash.get
    hash.length shouldBe 7 // the SAME short hash everywhere
    data should not be empty
    all(data) should (startWith("part-") and endWith(s"-$hash-chunk.parquet"))
    schemaFiles.size shouldBe 1
    schemaFiles.head should (startWith("schema-") and endWith(s"-$hash.parquet"))
    rootFiles should contain(s"$hash.COMPLETED")
    // the written rows round-trip with the merge key
    val written = spark.read.parquet(s"$target/data")
    written.count() shouldBe 8
    written.columns should contain(Constants.MergeKeyColumn)
  }

  it should "suppress the token when the stream fails" in {
    val root = writeFixture()
    val target = tempDir("cdm-sink-fail")
    val cdm = CdmSource(spark, root, entity)
    // a sink whose writes blow up mid-stream
    val sink = new ArcaneParquetSink(SinkConfig(target)) {
      override def writeBatch(df: org.apache.spark.sql.DataFrame): Seq[String] =
        throw new RuntimeException("blob storage down")
    }
    val builder = new CdmStreamGraphBuilder(cdm, sink, tempDir("cdm-ckpt-fail"))
    val runner = new StreamRunner(spark, statusReporter = _ => ())
    runner.run(StreamContext("cdm-s2", "cdm", isBackfilling = true, "{}"),
      builder) shouldBe ExitCodes.Fatal
    val (_, _, rootFiles) = layout(target)
    rootFiles.filter(_.endsWith(".COMPLETED")) shouldBe empty // Times.Never
  }

  it should "stop on drift mid-stream, exit SUCCESS, and never publish the token" in {
    val root = writeFixture()
    val target = tempDir("cdm-sink-drift")
    val cdm = CdmSource(spark, root, entity)
    val sink = new ArcaneParquetSink(SinkConfig(target))
    val builder = new CdmStreamGraphBuilder(cdm, sink, tempDir("cdm-ckpt-drift"),
      schemaUpdateIntervalMillis = 150)
    val statuses = scala.collection.mutable.ListBuffer[String]()
    val runner = new StreamRunner(spark,
      processingInterval = java.time.Duration.ofMillis(200),
      statusReporter = statuses += _)

    // drift the declared schema while the ProcessingTime stream runs
    new Thread(() => {
      Thread.sleep(1500)
      Files.writeString(Paths.get(s"$root/ChangeFeed/$entity.cdm.json"), driftedFeedCdmJson)
    }).start()

    runner.run(StreamContext("cdm-s3", "cdm", isBackfilling = false, "{}"),
      builder) shouldBe ExitCodes.Success
    statuses.exists(_.contains("schema-mismatch")) shouldBe true
    val (_, _, rootFiles) = layout(target)
    rootFiles.filter(_.endsWith(".COMPLETED")) shouldBe empty
  }
}
