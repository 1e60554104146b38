package graft.sources.dsv2

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture
import graft.sources.RestSource

/** A 5-page API instantiable by class name on executors (no-arg ctor,
  * as the DSv2 source's `fetcherClass` option requires). local[n] =
  * one JVM, so the static call log observes executor-side fetches. */
class FakePagedApi extends RestSource.HttpFetch {
  override def fetch(uri: String, headers: Map[String, String],
      body: Option[String]): Option[String] = {
    FakePagedApi.calls.add(uri)
    val page = uri.split("page=")(1).toLong
    Some(
      s"""{"meta": {"totalPages": 5},
         | "items": [{"page": $page, "a": ${page * 10}},
         |           {"page": $page, "a": ${page * 10 + 1}}]}""".stripMargin)
  }
}
object FakePagedApi {
  val calls = new ConcurrentLinkedQueue[String]()
}

/** A 2-page API whose content is bumpable between sweeps (static state
  * observed across executor instantiations in local mode). */
class FakeMutableApi extends RestSource.HttpFetch {
  override def fetch(uri: String, headers: Map[String, String],
      body: Option[String]): Option[String] = {
    FakeMutableApi.calls.add(uri)
    val page = uri.split("page=")(1).toLong
    val v = FakeMutableApi.version.get()
    Some(s"""{"meta": {"totalPages": 3}, "items": [{"page": $page, "v": $v}]}""")
  }
}
object FakeMutableApi {
  val calls = new ConcurrentLinkedQueue[String]()
  val version = new java.util.concurrent.atomic.AtomicLong(0L)
}

/** An oldest-first 3-page API: pages 1-2 are frozen history, new items
  * land only on the LAST page (the ADVICE r3 scenario a first-page-only
  * idle signature never sees). */
class FakeAppendApi extends RestSource.HttpFetch {
  override def fetch(uri: String, headers: Map[String, String],
      body: Option[String]): Option[String] = {
    val page = uri.split("page=")(1).toLong
    val v = if (page == 3) FakeAppendApi.version.get() else 0L
    Some(s"""{"meta": {"totalPages": 3}, "items": [{"page": $page, "v": $v}]}""")
  }
}
object FakeAppendApi {
  val version = new java.util.concurrent.atomic.AtomicLong(0L)
}

/** End-to-end DSv2 REST stream: `readStream.format(...)` → memory
  * sink, offsets in the checkpoint WAL, page ranges fetched by
  * executor tasks (SURVEY §7.1 module 5). */
class RestApiSourceV2Spec extends AnyFlatSpec with Matchers with SparkFixture {

  behavior of "RestApiTableProvider (DSv2 MicroBatchStream)"

  it should "stream one paginated sweep with distributed page fetches" in {
    import spark.implicits._
    FakePagedApi.calls.clear()
    val stream = spark.readStream
      .format(classOf[RestApiTableProvider].getName)
      .option("uriTemplate", "http://api/items?page=@page")
      .option("totalPagesKeyChain", "meta.totalPages")
      .option("recordKeyChain", "items")
      .option("fetcherClass", classOf[FakePagedApi].getName)
      .option("maxSweeps", "1")
      .option("pagesPerPartition", "2")
      .load()
    val schema = StructType(Seq(
      StructField("page", LongType), StructField("a", LongType)))
    val q = stream
      .select(from_json(col("value"), schema).as("r")).select("r.*")
      .writeStream.format("memory").queryName("rest_v2_out")
      .option("checkpointLocation", tempDir("restv2-ckpt"))
      .start()
    try {
      q.processAllAvailable()
      val out = spark.table("rest_v2_out").as[(Long, Long)].collect().sorted
      out.length shouldBe 10 // 5 pages × 2 records
      out.map(_._1).distinct.toSeq shouldBe Seq(1L, 2L, 3L, 4L, 5L)
      out.head shouldBe ((1L, 10L))

      import scala.jdk.CollectionConverters._
      val fetchedPages = FakePagedApi.calls.asScala.toSeq.map(_.split("page=")(1).toLong)
      // one sizing probe (pages 1 AND 5 — the idle-guard signature
      // covers both ends of the sweep, cached per sweep) + each page
      // exactly once across the 3 partition tasks
      fetchedPages.sorted shouldBe Seq(1L, 1L, 2L, 3L, 4L, 5L, 5L)
      // the query made real micro-batch progress with our offset JSON
      q.lastProgress.sources.head.endOffset should include("\"sweep\":1")
    } finally q.stop()
  }

  it should "land a sweep in the arcane sink layout under AvailableNow" in {
    import graft.sinks.{ArcaneLayoutReader, ArcaneParquetSink, SinkConfig}
    FakePagedApi.calls.clear()
    val stream = spark.readStream
      .format(classOf[RestApiTableProvider].getName)
      .option("uriTemplate", "http://api/items?page=@page")
      .option("totalPagesKeyChain", "meta.totalPages")
      .option("recordKeyChain", "items")
      .option("fetcherClass", classOf[FakePagedApi].getName)
      .option("maxSweeps", "1")
      .load()
    val target = tempDir("restv2-sink")
    val sink = new ArcaneParquetSink(SinkConfig(target))
    val q = sink.start(stream, tempDir("restv2-sink-ckpt"),
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    try q.awaitTermination(60000) shouldBe true
    finally q.stop()
    sink.complete(stream)

    ArcaneLayoutReader.isComplete(spark, target) shouldBe true
    val rows = ArcaneLayoutReader.readRaw(spark, target)
    rows.count() shouldBe 10 // one full paginated sweep
    rows.columns.toSeq shouldBe Seq("value")
  }

  it should "not plan a new sweep while the API is unchanged, then advance on change" in {
    import spark.implicits._
    FakeMutableApi.calls.clear()
    FakeMutableApi.version.set(0L)
    val stream = spark.readStream
      .format(classOf[RestApiTableProvider].getName)
      .option("uriTemplate", "http://api/items?page=@page")
      .option("totalPagesKeyChain", "meta.totalPages")
      .option("recordKeyChain", "items")
      .option("fetcherClass", classOf[FakeMutableApi].getName)
      .option("maxSweeps", "5")
      .option("forceSweepEvery", "100000") // keep forced re-sweeps out of THIS test
      .load()
    val schema = StructType(Seq(
      StructField("page", LongType), StructField("v", LongType)))
    val q = stream
      .select(from_json(col("value"), schema).as("r")).select("r.*")
      .writeStream.format("memory").queryName("rest_v2_idle")
      .option("checkpointLocation", tempDir("restv2-idle-ckpt"))
      .start()
    try {
      q.processAllAvailable()
      // one sweep ran; the idle guard (unchanged page count + first/last
      // probe bodies) blocks re-sweeps. Page 2 is MID-RANGE — never
      // probed — so its fetch count is pure sweep activity: exactly one
      spark.table("rest_v2_idle").count() shouldBe 3
      import scala.jdk.CollectionConverters._
      def page2Fetches = FakeMutableApi.calls.asScala.count(_.contains("page=2"))
      page2Fetches shouldBe 1

      FakeMutableApi.version.incrementAndGet() // API content changes
      // an in-flight idle trigger can signal no-new-data just after the
      // bump, returning processAllAvailable early — poll until the new
      // sweep lands
      val deadline = System.currentTimeMillis() + 90000
      while (spark.table("rest_v2_idle").count() < 6 &&
          System.currentTimeMillis() < deadline) {
        q.processAllAvailable(); Thread.sleep(50)
      }
      val out = spark.table("rest_v2_idle").as[(Long, Long)].collect()
      // the change must be delivered; under rapid triggers a SECOND
      // sweep of the same changed version can slip in before the first
      // commits its signature — that is the documented at-least-once
      // contract (downstream merge-key dedup absorbs it), so assert
      // "new content arrived, in whole sweeps" not exactly-once
      out.length should be >= 6
      out.length % 3 shouldBe 0 // whole sweeps only, never partial
      out.map(_._2).toSet shouldBe Set(0L, 1L)
      page2Fetches should be >= 2
    } finally q.stop()
  }

  it should "advance when changes land only on the LAST page" in {
    import spark.implicits._
    FakeAppendApi.version.set(0L)
    val stream = spark.readStream
      .format(classOf[RestApiTableProvider].getName)
      .option("uriTemplate", "http://api/items?page=@page")
      .option("totalPagesKeyChain", "meta.totalPages")
      .option("recordKeyChain", "items")
      .option("fetcherClass", classOf[FakeAppendApi].getName)
      .option("maxSweeps", "5")
      .option("forceSweepEvery", "100000") // the SIGNATURE must catch it, not the fallback
      .load()
    val schema = StructType(Seq(
      StructField("page", LongType), StructField("v", LongType)))
    val q = stream
      .select(from_json(col("value"), schema).as("r")).select("r.*")
      .writeStream.format("memory").queryName("rest_v2_append")
      .option("checkpointLocation", tempDir("restv2-append-ckpt"))
      .start()
    try {
      q.processAllAvailable()
      spark.table("rest_v2_append").count() shouldBe 3
      // page 1 and the page count stay byte-identical; only page 3 moves
      FakeAppendApi.version.incrementAndGet()
      val deadline = System.currentTimeMillis() + 90000
      while (spark.table("rest_v2_append").count() < 6 &&
          System.currentTimeMillis() < deadline) {
        q.processAllAvailable(); Thread.sleep(50)
      }
      val out = spark.table("rest_v2_append").as[(Long, Long)].collect()
      out.length shouldBe 6 // the last-page change triggered a sweep
      out.filter(_._1 == 3L).map(_._2).toSet shouldBe Set(0L, 1L)
    } finally q.stop()
  }

  it should "force a full re-sweep after N idle-skipped triggers" in {
    FakePagedApi.calls.clear()
    val stream = spark.readStream
      .format(classOf[RestApiTableProvider].getName)
      .option("uriTemplate", "http://api/items?page=@page")
      .option("totalPagesKeyChain", "meta.totalPages")
      .option("recordKeyChain", "items")
      .option("fetcherClass", classOf[FakePagedApi].getName)
      .option("maxSweeps", "2")
      .option("forceSweepEvery", "1") // every trigger sweeps, idle or not
      .load()
    val q = stream
      .writeStream.format("memory").queryName("rest_v2_forced")
      .option("checkpointLocation", tempDir("restv2-forced-ckpt"))
      .start()
    try {
      // the API never changes, yet the forced re-sweep must override the
      // idle guard and deliver a second identical sweep (staleness bound)
      val deadline = System.currentTimeMillis() + 90000
      while (spark.table("rest_v2_forced").count() < 20 &&
          System.currentTimeMillis() < deadline) {
        q.processAllAvailable(); Thread.sleep(50)
      }
      spark.table("rest_v2_forced").count() shouldBe 20 // 2 sweeps × 10 records
    } finally q.stop()
  }

  it should "require its mandatory options" in {
    val ex = intercept[Exception] {
      spark.readStream
        .format(classOf[RestApiTableProvider].getName)
        .option("fetcherClass", classOf[FakePagedApi].getName)
        .load()
        .writeStream.format("memory").queryName("rest_v2_bad")
        .option("checkpointLocation", tempDir("restv2-bad-ckpt"))
        .start()
        .processAllAvailable()
    }
    ex.getMessage should include("uriTemplate")
  }
}
