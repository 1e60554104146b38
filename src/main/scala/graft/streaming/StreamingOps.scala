package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming operators for the ingestion + training-data pipeline
  * (SURVEY.md §2.8: watermarks/windows are free in Spark and absent in
  * the reference; custom state via KeyValueGroupedDataset is the
  * §2.9-sanctioned extension point).
  *
  * All state here is Spark-managed (checkpointed, partitioned by key) —
  * at 100 TB the state store scales with distinct keys per watermark
  * horizon, not with throughput.
  */
object StreamingOps {

  /** Watermarked tumbling-window aggregate over an event stream:
    * count + exact decimal sum per (window, key). Late rows beyond the
    * watermark are dropped by Spark's state eviction. */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      windowLength: String,
      watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLength), col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,4)")).cast("double").as("sum_value"))

  /** Watermarked stream-stream inner join: a right-side row matches
    * when its key equals and its event time falls in
    * [leftTs, leftTs + within] — the click-to-impression attribution
    * shape. The time bound is part of the join condition, so Spark can
    * evict state on BOTH sides once the watermark passes the bound:
    * state size is O(arrival rate × (lateness + within)) per side, not
    * unbounded. Column names must differ across sides. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      lateness: String, within: String): DataFrame =
    left.withWatermark(leftTs, lateness)
      .join(right.withWatermark(rightTs, lateness),
        col(leftKey) === col(rightKey) &&
          col(rightTs) >= col(leftTs) &&
          col(rightTs) <= col(leftTs) + expr(s"interval $within"))

  /** Stream-static enrichment join: every micro-batch joins the stream
    * against a static dimension, explicitly broadcast so the stream
    * side never shuffles — the enrich-events-with-reference-data
    * pattern a CDC consumer runs on every batch. The static side is
    * planned per micro-batch, so a dimension backed by files picks up
    * new data on the next batch without restarting the stream (no
    * stream-stream state involved: this is the right tier whenever the
    * dimension fits a broadcast, and `intervalJoin` when it doesn't or
    * when the dimension is itself a stream). */
  def enrich(stream: DataFrame, dim: DataFrame,
      streamKey: String, dimKey: String,
      joinType: String = "left"): DataFrame = {
    // alias-qualified keys: the common enrichment case has the SAME key
    // column name on both sides, which a bare col(streamKey) ===
    // col(dimKey) resolves ambiguously (ADVICE r5); the dimension's key
    // is redundant after the join and is dropped
    val joined = stream.alias("s").join(broadcast(dim.alias("d")),
      col(s"s.$streamKey") === col(s"d.$dimKey"), joinType)
    joined.drop(col(s"d.$dimKey"))
  }

  /** Ingest-time benchmark decontamination (round 10): the
    * `pipeline_decontaminate` check as a guard on a DOCUMENT STREAM.
    * Benchmark shingles are the static broadcast side (metadata-sized
    * by definition — the corpus is the 100 TB side and never
    * shuffles for the join); each arriving doc's DISTINCT shingles
    * (`array_distinct` per row — a doc's shingles all ride its one
    * row, so this replicates the batch path's per-doc `distinct()`
    * without a second streaming aggregate) join the broadcast set, and
    * a watermarked windowed count flags docs with ≥ `minHits`
    * benchmark n-grams. Append-mode output; state is one count per
    * flagged-candidate doc inside the watermark horizon — evicted with
    * the window, never stream-lifetime.
    *
    * n_hits counts DISTINCT matched (doc, shingle) pairs, not arrival
    * rows: an at-least-once source replaying a doc inside one window
    * must not double its count and falsely push a one-shingle overlap
    * across `minHits` (ADVICE r10) — so matched pairs pass through
    * `dropDuplicatesWithinWatermark(doc_id, sh)` before the windowed
    * count, mirroring the batch path's per-doc `distinct()`. Dedup
    * state is per matched pair inside the watermark horizon
    * (benchmark-overlapping shingles only — a tiny fraction of
    * traffic), evicted by watermark like the count state.
    *
    * Returns (doc_id, n_hits) per flagged doc once its window closes. */
  def decontaminateStream(docs: DataFrame, benchShingles: DataFrame,
      idCol: String, textCol: String, tsCol: String,
      watermarkDelay: String, windowLength: String,
      shingleN: Int = 3, minHits: Long = 1,
      tok: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        graft.ext.TextOps.tokens): DataFrame =
    docs
      .withWatermark(tsCol, watermarkDelay)
      .select(col(idCol).as("doc_id"), col(tsCol).as("ts"),
        tok(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= shingleN)
      .select(col("doc_id"), col("ts"),
        explode(array_distinct(
          graft.ext.TextOps.shingles(col("toks"), shingleN))).as("sh"))
      .join(broadcast(benchShingles.select(col("s")).distinct()),
        col("sh") === col("s"))
      .dropDuplicatesWithinWatermark("doc_id", "sh")
      .groupBy(window(col("ts"), windowLength), col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minHits)
      .select(col("doc_id"), col("n_hits"))

  /** Streaming exact dedup: emit only the FIRST occurrence of each key
    * across micro-batches, with explicit per-key state via
    * flatMapGroupsWithState — the custom-state extension tier. For
    * bounded-lateness dedup prefer the built-in
    * `dropDuplicatesWithinWatermark`; this variant holds state
    * indefinitely (cap the key domain or add state timeouts in
    * production). */
  def firstSeen[T](ds: Dataset[T], key: T => String)(
      implicit enc: Encoder[T]): Dataset[T] = {
    implicit val stateEnc: Encoder[Boolean] = Encoders.scalaBoolean
    ds.groupByKey(key)(Encoders.STRING)
      .flatMapGroupsWithState[Boolean, T](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[T], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            rows.take(1)
          }
      }
  }
}
