package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-memory bottom-k sketch over a string (hash) column — the
  * typed `Aggregator` extension tier (SURVEY §2.9): keeps the k
  * lexicographically-smallest DISTINCT values per group.
  *
  * The 100 TB rationale: a group-level content sketch via
  * `collect_set` holds every distinct hash of the group in the
  * aggregation buffer (unbounded — one hot group OOMs an executor);
  * this buffer is capped at k strings regardless of group size, and
  * merges associatively/commutatively, so partial aggregation works
  * map-side like any built-in agg.
  *
  * Bottom-k over a uniform hash space is a classic set sketch
  * (KMV-style): equal sketches ⇔ near-identical content sets, and
  * |A∩B|/k over merged sketches estimates Jaccard.
  */
final class BottomKSketch(k: Int) extends Aggregator[String, List[String], Seq[String]] {
  require(k > 0)

  override def zero: List[String] = Nil

  /** Insert keeping the list sorted, distinct, and ≤ k. */
  override def reduce(buf: List[String], value: String): List[String] =
    if (value == null) buf
    else if (buf.length >= k && buf.last <= value) buf // fast path: too large
    else if (buf.contains(value)) buf
    else ((value :: buf).sorted).take(k)

  override def merge(a: List[String], b: List[String]): List[String] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(reduction: List[String]): Seq[String] = reduction

  override def bufferEncoder: Encoder[List[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[String]]()
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

object BottomKSketch {
  /** Column-function form: `bottomK(8)(col)` usable in `agg(...)`. */
  def apply(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new BottomKSketch(k), Encoders.STRING)
}
