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
