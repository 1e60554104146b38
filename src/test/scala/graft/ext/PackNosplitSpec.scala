package graft.ext

import org.apache.spark.sql.functions.{col, md5}
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** Round 20 (VERDICT r19 #6): document-boundary-aware packing. The
  * distributed (source, sub)-bucketed next-fit fold must equal a
  * plain sequential next-fit reference computed per group on collected
  * data, and the waste/truncation ledger must satisfy the packing
  * invariants: no sequence over budget, docs never split, padding =
  * budget − fill, truncation = total token loss of over-budget docs. */
class PackNosplitSpec extends AnyFlatSpec with Matchers with SparkFixture {

  private val SF = "/root/testdata/sf0.001"
  private val L = 128L

  private lazy val out = ExtQueries.pipelinePackNosplit(spark, SF).collect()
    .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5)))
  // (source, seq_id, n_docs, seq_tokens, pad_tokens, trunc_tokens)

  private lazy val docsPrepared = spark.read
    .parquet(s"$SF/documents.parquet")
    .select(col("source"), col("doc_id"),
      org.apache.spark.sql.functions.size(TextOps.tokens(col("text")))
        .cast("long").as("n"))
    .filter(col("n") > 0)
    .withColumn("hk", md5(col("doc_id").cast("string")))
    .collect()
    .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2), r.getString(3)))

  behavior of "pipeline_pack_nosplit"

  it should "never exceed the budget and account every token as fill, pad, or truncation" in {
    out.length should be > 0
    out.foreach { case (_, _, nDocs, seqTokens, pad, _) =>
      nDocs should be > 0L
      seqTokens should be <= L
      pad shouldBe L - seqTokens
    }
    // conservation: every doc lands in exactly one sequence; truncation
    // equals the total over-budget loss
    out.map(_._3).sum shouldBe docsPrepared.length.toLong
    out.map(_._4).sum shouldBe docsPrepared.map(d => math.min(d._3, L)).sum
    out.map(_._6).sum shouldBe docsPrepared.map(d => math.max(d._3 - L, 0L)).sum
  }

  it should "equal the sequential next-fit reference per (source, sub) group" in {
    // reference: plain next-fit per group in (hk, doc_id) order, then
    // global ids by sub order — the exact published contract
    val expected = docsPrepared
      .groupBy(d => (d._1, d._4.substring(0, 2)))
      .toSeq
      .flatMap { case ((src, sub), ds) =>
        var fill = 0L; var seq = -1L
        ds.sortBy(d => (d._4, d._2)).map { d =>
          val eff = math.min(d._3, L)
          if (seq >= 0L && fill + eff <= L) fill += eff
          else { seq += 1L; fill = eff }
          (src, sub, seq, eff, math.max(d._3 - L, 0L))
        }
      }
    val seqCounts = expected.groupBy(e => (e._1, e._2))
      .view.mapValues(_.map(_._3).max + 1L).toMap
    val expAgg = expected.groupBy { e =>
      val off = seqCounts.filterKeys(k => k._1 == e._1 && k._2 < e._2)
        .values.sum
      (e._1, off + e._3)
    }.map { case ((src, seqId), es) =>
      (src, seqId, es.length.toLong, es.map(_._4).sum, L - es.map(_._4).sum,
        es.map(_._5).sum)
    }.toSet
    out.toSet shouldBe expAgg
  }

  it should "emit deterministic output across runs" in {
    val again = ExtQueries.pipelinePackNosplit(spark, SF).collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    again.toSeq shouldBe out.toSeq
  }
}
