package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for the 100 TB path.
  *
  * A hot grouping key (one tenant, one null-ish default, one viral
  * document) turns a shuffle into a single straggler task. Salting
  * splits each key across `saltBuckets` synthetic sub-keys for the
  * partial phase, then re-aggregates the partials — two shuffles, but
  * each is balanced, which beats one shuffle with a task that runs
  * 1000× longer than its peers. (AQE's skew-join handling covers join
  * skew at runtime; aggregation skew needs this plan shape.)
  */
object Skew {

  /** Re-aggregatable aggregate spec: the partial expression and how to
    * merge partials in the final phase. */
  final case class Reagg(partial: Column, merge: String => Column, name: String)

  /** `sum` is merged by summing partial sums. */
  def sumOf(c: Column, name: String): Reagg =
    Reagg(sum(c).as(name), n => sum(col(n)).as(n), name)

  /** `count` is merged by summing partial counts. */
  def countAll(name: String): Reagg =
    Reagg(count(lit(1)).as(name), n => sum(col(n)).as(n), name)

  /** `min`/`max` merge with themselves. */
  def minOf(c: Column, name: String): Reagg =
    Reagg(min(c).as(name), n => min(col(n)).as(n), name)
  def maxOf(c: Column, name: String): Reagg =
    Reagg(max(c).as(name), n => max(col(n)).as(n), name)

  /** Two-phase salted aggregation: groupBy(keys + salt) → partials,
    * then groupBy(keys) → merged finals. The salt is uniform random per
    * row — it only routes rows, never appears in the result, so the
    * output is deterministic. */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      saltBuckets: Int,
      aggs: Seq[Reagg]): DataFrame = {
    require(aggs.nonEmpty && saltBuckets > 0)
    val salted = df.withColumn("__salt",
      (rand() * saltBuckets).cast("int"))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(aggs.head.partial, aggs.tail.map(_.partial): _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(aggs.head.merge(aggs.head.name),
        aggs.tail.map(a => a.merge(a.name)): _*)
  }
}
