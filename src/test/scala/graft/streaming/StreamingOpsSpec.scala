package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture
import graft.runtime.RowCountListener

/** Structured Streaming semantics: watermarked windowed aggregation
  * (late-row eviction), stateful first-seen dedup, and the
  * rows.incoming metrics listener (reference: DeclaredMetrics.cs:11 +
  * SourceTags.cs:28-38). MemoryStream drives the queries
  * synchronously. */
class StreamingOpsSpec extends AnyFlatSpec with Matchers with SparkFixture {

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  behavior of "windowedCounts with watermark"

  it should "aggregate per tumbling window and drop late rows past the watermark" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val agg = StreamingOps.windowedCounts(
      in.toDF().toDF("ts", "k", "v"), "ts", "k", "v", "5 minutes", "10 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("win_out")
      .option("checkpointLocation", tempDir("win-ckpt"))
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData((ts(0), "a", 1.0), (ts(1), "a", 2.0), (ts(6), "b", 5.0))
      q.processAllAvailable()
      // advance the watermark far past the first windows...
      in.addData((ts(40), "a", 9.0))
      q.processAllAvailable()
      // ...then send a row 40 min late: must be dropped by state eviction
      in.addData((ts(2), "a", 100.0))
      q.processAllAvailable()
      in.addData((ts(59), "z", 0.0)) // push watermark so 10:40 window closes
      q.processAllAvailable()

      val out = spark.table("win_out")
        .select(col("window.start").as("ws"), col("k"), col("n_events"), col("sum_value"))
        .as[(Timestamp, String, Long, Double)].collect().sortBy(r => (r._1.getTime, r._2))
      // closed windows only (append mode): [10:00 a], [10:05 b], [10:40 a]
      out.map(r => (r._1, r._2, r._3, r._4)) shouldBe Array(
        (ts(0), "a", 2L, 3.0),  // the late 100.0 was NOT added
        (ts(5), "b", 1L, 5.0),
        (ts(40), "a", 1L, 9.0))
    } finally q.stop()
  }

  it should "aggregate session windows with a watermark (merge, then close on inactivity)" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val agg = in.toDF().toDF("ts", "user")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user"), col("w.start").as("session_start"), col("n_events"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .option("checkpointLocation", tempDir("sess-ckpt"))
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      // two events 20 min apart MERGE into one session (< 30-min gap)
      in.addData((ts(0), "u1"), (ts(20), "u1"))
      q.processAllAvailable()
      spark.table("sess_out").count() shouldBe 0 // session still open
      // 31+ min of inactivity then a new event: the old session closes
      // once the watermark passes its end (20 + 30 = 10:50)
      in.addData((Timestamp.valueOf("2024-01-01 11:30:00"), "u1"))
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2024-01-01 13:00:00"), "u2")) // advance watermark
      q.processAllAvailable()
      val out = spark.table("sess_out")
        .as[(String, Timestamp, Long)].collect().sortBy(_._2.getTime)
      out.head shouldBe (("u1", ts(0), 2L)) // merged 2-event session
      out.map(_._1) should contain("u1")
    } finally q.stop()
  }

  it should "drain the driver's events table through the windowed aggregate" in {
    import graft.queries.QueryKit
    val dir = "/root/testdata/sf0.001"
    val batch = QueryKit.table(spark, dir, "events") // sets nanosAsLong
    val streamIn = spark.readStream
      .schema(batch.schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts_utc", QueryKit.tsMicros("ts"))
    val agg = StreamingOps.windowedCounts(
      streamIn, "ts_utc", "event_type", "value", "1 hour", "1 minute")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("events_stream_out")
      .option("checkpointLocation", tempDir("events-stream-ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    try {
      q.awaitTermination(60000) shouldBe true
      val out = spark.table("events_stream_out")
      out.agg(sum("n_events")).head().getLong(0) shouldBe batch.count()
      out.select("event_type").distinct().count() shouldBe
        batch.select("event_type").distinct().count()
    } finally q.stop()
  }

  behavior of "decontaminateStream ingest guard"

  it should "flag arriving docs that share shingles with the broadcast benchmark set" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // benchmark: one distinctive sentence; its trigram shingles are
    // the static side, derived with the SAME helper the batch
    // pipeline_decontaminate uses
    val bench = graft.ext.Dedup.shingleRows(
      Seq((0L, "the secret benchmark question about ancient rivers and their deltas"))
        .toDF("doc_id", "text"), "doc_id", "text")
    val in = MemoryStream[(Long, String, Timestamp)]
    val flagged = StreamingOps.decontaminateStream(
      in.toDF().toDF("doc_id", "text", "ts"), bench,
      "doc_id", "text", "ts",
      watermarkDelay = "0 seconds", windowLength = "5 minutes",
      minHits = 2)
    val q = flagged.writeStream.outputMode("append")
      .format("memory").queryName("decon_out")
      .option("checkpointLocation", tempDir("decon-ckpt"))
      .start()
    try {
      in.addData(
        // contaminated: contains the benchmark phrase verbatim
        (10L, "prefix words then the secret benchmark question about ancient rivers appears here", ts(0)),
        // near-miss: shares exactly ONE shingle — below minHits=2
        (11L, "unrelated text mentioning ancient rivers and nothing else of note", ts(0)),
        // clean
        (12L, "completely unrelated content about spark catalyst optimizer internals", ts(1)))
      q.processAllAvailable()
      // push the watermark so the 10:00 window closes (append mode)
      in.addData((99L, "filler traffic far in the future", ts(30)))
      q.processAllAvailable()
      val out = spark.table("decon_out")
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      out.map(_._1) shouldBe Seq(10L)
      out.head._2 should be >= 2L
    } finally q.stop()
  }

  it should "not let an at-least-once replay inflate n_hits across minHits" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bench = graft.ext.Dedup.shingleRows(
      Seq((0L, "the secret benchmark question about ancient rivers and their deltas"))
        .toDF("doc_id", "text"), "doc_id", "text")
    val in = MemoryStream[(Long, String, Timestamp)]
    val flagged = StreamingOps.decontaminateStream(
      in.toDF().toDF("doc_id", "text", "ts"), bench,
      "doc_id", "text", "ts",
      watermarkDelay = "10 minutes", windowLength = "5 minutes",
      minHits = 2)
    val q = flagged.writeStream.outputMode("append")
      .format("memory").queryName("decon_replay_out")
      .option("checkpointLocation", tempDir("decon-replay-ckpt"))
      .start()
    try {
      // doc 11 shares exactly ONE shingle with the benchmark; an
      // at-least-once source redelivers it — in-batch and next-batch —
      // inside the same window. Per-arrival counting would read 3 hits
      // and falsely cross minHits=2; distinct (doc, shingle) stays at 1.
      val row = (11L, "unrelated text mentioning ancient rivers and nothing else of note", ts(0))
      in.addData(row, row)
      q.processAllAvailable()
      in.addData(row) // cross-batch redelivery, same window
      q.processAllAvailable()
      in.addData((99L, "filler traffic far in the future", ts(60)))
      q.processAllAvailable()
      spark.table("decon_replay_out")
        .as[(Long, Long)].collect().toSeq shouldBe empty
    } finally q.stop()
  }

  behavior of "firstSeen stateful dedup"

  it should "emit only the first occurrence of each key across micro-batches" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Int)]
    val deduped = StreamingOps.firstSeen[(String, Int)](in.toDS(), _._1)
    val q = deduped.toDF("k", "v").writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .option("checkpointLocation", tempDir("dedup-ckpt"))
      .start()
    try {
      in.addData(("a", 1), ("a", 2), ("b", 3))
      q.processAllAvailable()
      in.addData(("a", 4), ("c", 5)) // a is already-seen state
      q.processAllAvailable()
      val out = spark.table("dedup_out").as[(String, Int)].collect().sortBy(_._1)
      out.map(_._1).toSeq shouldBe Seq("a", "b", "c")
      out.toMap.apply("a") shouldBe 1 // kept the FIRST value
    } finally q.stop()
  }

  it should "dedup within the watermark horizon via the built-in stateful op" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val deduped = in.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("k")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("wmdedup_out")
      .option("checkpointLocation", tempDir("wmdedup-ckpt"))
      .start()
    try {
      in.addData((ts(0), "a"), (ts(1), "a"), (ts(2), "b"))
      q.processAllAvailable()
      in.addData((ts(3), "a")) // duplicate inside the horizon: dropped
      q.processAllAvailable()
      spark.table("wmdedup_out").select("k").as[String].collect().sorted.toSeq shouldBe
        Seq("a", "b")
    } finally q.stop()
  }

  behavior of "intervalJoin stream-stream"

  it should "join rows within the interval and not beyond it" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Timestamp, String)]
    val clicks = MemoryStream[(Timestamp, String)]
    val joined = StreamingOps.intervalJoin(
      imps.toDF().toDF("imp_ts", "imp_id"),
      clicks.toDF().toDF("click_ts", "click_id"),
      "imp_id", "click_id", "imp_ts", "click_ts",
      lateness = "10 minutes", within = "5 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssjoin_out")
      .option("checkpointLocation", tempDir("ssjoin-ckpt"))
      .start()
    try {
      imps.addData((ts(0), "a"), (ts(0), "b"))
      clicks.addData((ts(3), "a")) // within 5 min of a's impression
      q.processAllAvailable()
      clicks.addData((ts(30), "b")) // 30 min later: outside the interval
      q.processAllAvailable()
      val out = spark.table("ssjoin_out")
        .select("imp_id", "click_ts").as[(String, Timestamp)].collect()
      out.toSeq shouldBe Seq(("a", ts(3)))
    } finally q.stop()
  }

  behavior of "enrich stream-static join"

  it should "enrich each micro-batch from the broadcast dimension without shuffling the stream" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Int)]
    val dim = Seq(("u1", "gold"), ("u2", "basic")).toDF("dim_user", "tier")
    val enriched = StreamingOps.enrich(
      in.toDF().toDF("user", "amount"), dim, "user", "dim_user")
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("enrich_out")
      .option("checkpointLocation", tempDir("enrich-ckpt"))
      .start()
    try {
      in.addData(("u1", 5), ("u3", 7))
      q.processAllAvailable()
      val out = spark.table("enrich_out")
        .select("user", "amount", "tier").as[(String, Int, Option[String])]
        .collect().sortBy(_._1)
      out.toSeq shouldBe Seq(("u1", 5, Some("gold")), ("u3", 7, None)) // left join keeps misses
      // the micro-batch plan must broadcast the dimension, never
      // shuffle the stream side
      val planOut = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(planOut))(q.explain())
      planOut.toString should include("BroadcastHashJoin")
      planOut.toString should not include "SortMergeJoin"
    } finally q.stop()
  }

  it should "resolve a shared key column name and emit it once" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the common enrichment shape: stream and dimension both call the
    // key "user" (ADVICE r5: the bare-col join threw
    // AMBIGUOUS_REFERENCE here, and on success duplicated the column)
    val in = MemoryStream[(String, Int)]
    val dim = Seq(("u1", "gold")).toDF("user", "tier")
    val enriched = StreamingOps.enrich(
      in.toDF().toDF("user", "amount"), dim, "user", "user")
    enriched.columns.count(_ == "user") shouldBe 1
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("enrich_same_key_out")
      .option("checkpointLocation", tempDir("enrich-same-ckpt"))
      .start()
    try {
      in.addData(("u1", 5), ("u9", 1))
      q.processAllAvailable()
      val out = spark.table("enrich_same_key_out")
        .select("user", "amount", "tier").as[(String, Int, Option[String])]
        .collect().sortBy(_._1)
      out.toSeq shouldBe Seq(("u1", 5, Some("gold")), ("u9", 1, None))
    } finally q.stop()
  }

  behavior of "RowCountListener"

  it should "emit rows.incoming with the stream tags" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[(String, Map[String, String], Long)]()
    val listener = new RowCountListener("s1", "CdmChangeFeed", isBackfilling = false,
      (m, tags, n) => { emitted.add((m, tags, n)); () },
      sourceLocation = "container/path", sourceEntity = "orders")
    spark.streams.addListener(listener)
    val in = MemoryStream[Int]
    val q = in.toDF().writeStream.format("memory").queryName("listener_out")
      .option("checkpointLocation", tempDir("listener-ckpt"))
      .start()
    try {
      in.addData(1, 2, 3)
      q.processAllAvailable()
      // listener events are delivered asynchronously
      val deadline = System.currentTimeMillis() + 10000
      while (emitted.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
      import scala.jdk.CollectionConverters._
      val rowEvents = emitted.asScala.filter(_._3 > 0).toSeq
      rowEvents should not be empty
      val (metric, tags, n) = rowEvents.head
      metric shouldBe "rows.incoming"
      n shouldBe 3L
      // the reference's exact tag vocabulary (SourceTags.cs:28-38),
      // kind in CamelCaseToSnakeCase — dashboards match unmodified
      tags shouldBe Map(
        "arcane.sneaksanddata.com/kind" -> "cdm_change_feed",
        "arcane.sneaksanddata.com/mode" -> "stream",
        "arcane.sneaksanddata.com/stream_source_location" -> "container/path",
        "arcane.sneaksanddata.com/stream_source_entity" -> "orders",
        "arcane.sneaksanddata.com/stream_id" -> "s1")
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }
}
