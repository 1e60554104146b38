package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** Structural invariants of the round-5 operators — properties that
  * must hold for ANY input, checked on the real sf0.001 tables. The
  * DuckDB oracle pins exact values; these pin the semantics a user
  * relies on (intervals chain, token mass is conserved, positions are
  * dense, funnel stages are ordered), so a future rewrite that happens
  * to hash-match a stale oracle still can't violate the contract.
  */
class OpInvariantSpec extends AnyFlatSpec with Matchers with SparkFixture {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = graft.SparkEntry.queries(name)(spark, dir)

  behavior of "parity_scd2 intervals"

  it should "chain per key with exactly one open (current) interval" in {
    import spark.implicits._
    val rows = q("parity_scd2")
      .select("user_id", "valid_from", "valid_to", "is_current")
      .as[(Long, java.sql.Timestamp, Option[java.sql.Timestamp], Long)]
      .collect()
    rows should not be empty
    rows.groupBy(_._1).foreach { case (user, hist) =>
      withClue(s"user $user: ") {
        // exactly one open interval, flagged current
        hist.count(_._3.isEmpty) shouldBe 1
        hist.filter(_._3.isEmpty).map(_._4) shouldBe Array(1L)
        hist.filter(_._3.nonEmpty).foreach { r =>
          r._4 shouldBe 0L
          r._3.get.getTime should be >= r._2.getTime // never negative
        }
        // closed intervals chain: each valid_to appears as a valid_from
        val froms = hist.map(_._2.getTime).sorted
        val tos = hist.flatMap(_._3).map(_.getTime).sorted
        tos.foreach(t => froms should contain(t))
      }
    }
  }

  behavior of "pipeline_pack_sequences conservation"

  it should "conserve token mass and assign dense sequence ids per source" in {
    import spark.implicits._
    val packed = q("pipeline_pack_sequences")
      .select("source", "seq_id", "seq_tokens")
      .as[(String, Long, Long)].collect()
    val chunkMass = graft.SparkEntry.queries("text_chunk")(spark, dir)
      .agg(sum("chunk_tokens")).head().getLong(0)
    packed.map(_._3).sum shouldBe chunkMass // nothing dropped or double-packed
    packed.groupBy(_._1).foreach { case (src, seqs) =>
      withClue(s"source $src: ") {
        val ids = seqs.map(_._2).sorted
        ids shouldBe (0L until ids.length).toArray // dense from 0
        seqs.foreach(_._3 should be > 0L)
      }
    }
  }

  behavior of "pipeline_shard_shuffle layout"

  it should "assign dense positions per shard and be rerun-deterministic" in {
    import spark.implicits._
    val a = q("pipeline_shard_shuffle")
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect()
    val b = q("pipeline_shard_shuffle")
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect()
    a.toSeq shouldBe b.toSeq // pure function of (seed, doc_id)
    a.map(_._1).distinct.length shouldBe a.length // every doc exactly once
    a.groupBy(_._2).foreach { case (shard, rows) =>
      withClue(s"shard $shard: ") {
        rows.map(_._3).sorted shouldBe (1L to rows.length).toArray
      }
    }
  }

  behavior of "events_funnel ordering"

  it should "only reach a stage strictly after the previous one" in {
    import spark.implicits._
    val rows = q("events_funnel")
      .select("view_ts", "click_ts", "purchase_ts", "stage")
      .as[(java.sql.Timestamp, Option[java.sql.Timestamp],
        Option[java.sql.Timestamp], Long)].collect()
    rows should not be empty
    rows.foreach { case (v, c, p, stage) =>
      c.foreach(_.getTime should be > v.getTime)
      p.foreach { pt =>
        c should not be empty // purchase implies click reached
        pt.getTime should be > c.get.getTime
      }
      stage shouldBe (1L + c.size + p.size)
    }
  }

  behavior of "dedup_containment bounds"

  it should "stay within [0, 10000] and dominate the symmetric Jaccard ratio" in {
    import spark.implicits._
    val cont = q("dedup_containment")
      .select("doc_a", "doc_b", "n_common", "cont_a_e4", "cont_b_e4")
      .as[(Long, Long, Long, Long, Long)].collect()
    cont should not be empty
    val jacc = q("dedup_jaccard")
      .select("doc_a", "doc_b", "n_common", "n_union")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    cont.foreach { case (a, b, common, ca, cb) =>
      withClue(s"pair ($a,$b): ") {
        ca should (be >= 0L and be <= 10000L)
        cb should (be >= 0L and be <= 10000L)
        // same candidate set, same intersection counts
        val (jCommon, jUnion) = jacc((a, b))
        common shouldBe jCommon
        // containment ≥ Jaccard: |A∩B|/min side ≥ |A∩B|/|A∪B|
        math.max(ca, cb) * jUnion should be >= common * 10000L
      }
    }
  }
}
