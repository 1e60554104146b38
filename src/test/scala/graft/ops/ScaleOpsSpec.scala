package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** Scale-path machinery: salted aggregation for hot keys and bucketed
  * co-located joins (pre-partitioned storage ⇒ no shuffle at join
  * time). These are plan-shape guarantees, verified on small data. */
class ScaleOpsSpec extends AnyFlatSpec with Matchers with SparkFixture {

  behavior of "Skew.saltedAggregate"

  it should "produce exactly the unsalted results" in {
    import spark.implicits._
    // one hot key (90% of rows) + a tail
    val df = ((1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k${i % 7}", i.toLong))).toDF("k", "v")
    val out = Skew.saltedAggregate(df, Seq("k"), saltBuckets = 8,
        Seq(Skew.sumOf(col("v"), "sum_v"), Skew.countAll("n"),
          Skew.maxOf(col("v"), "max_v")))
      .orderBy("k").as[(String, Long, Long, Long)].collect()
    val expected = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"), max("v").as("m"))
      .orderBy("k").as[(String, Long, Long, Long)].collect()
    out shouldBe expected
  }

  it should "plan two exchanges (balanced) instead of one skewed" in {
    import spark.implicits._
    val df = Seq(("a", 1L)).toDF("k", "v")
    val plan = Skew.saltedAggregate(df, Seq("k"), 8, Seq(Skew.countAll("n")))
      .queryExecution.optimizedPlan.toString
    // partial phase really groups on (k, __salt)
    plan should include("__salt")
  }

  behavior of "dedup_segments hot-segment geometry"

  it should "absorb a boilerplate segment shared by every doc without per-key state" in {
    import spark.implicits._
    // 20,000 docs all opening with the SAME 16-token boilerplate
    // segment, each followed by a unique 16-token tail. The old
    // collect_set-over-h window buffered all 20k sharer ids in ONE
    // window partition (the straggler/OOM shape at real boilerplate
    // scale); the bounded plan counts distinct sharers with partial
    // aggregation and broadcasts the single over-threshold hash.
    val boiler = (1 to 16).map(i => s"common$i").mkString(" ")
    val rows = (0 until 20000).map { id =>
      (id.toLong, boiler + " " + (1 to 16).map(i => s"u${id}x$i").mkString(" "))
    }
    val dir = tempDir("hotseg")
    rows.toDF("doc_id", "text").repartition(8)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("dedup_segments")(spark, dir)
    val plan = out.queryExecution.executedPlan.toString
    plan should not include "Window"
    plan should include("BroadcastHashJoin")
    val got = out.select("doc_id", "n_segments", "n_boiler_segments")
      .as[(Long, Long, Long)].collect()
    got.length shouldBe 20000
    // every doc: 2 segments, exactly the boilerplate one flagged
    got.foreach { case (_, nSeg, nBoiler) =>
      nSeg shouldBe 2L
      nBoiler shouldBe 1L
    }
  }

  behavior of "text_cooccurrence Zipf guard"

  it should "drop the df-head stopword from the pair space before aggregation" in {
    import spark.implicits._
    // a planted Zipf head: "the" in EVERY doc (interleaved, so it pairs
    // with every unique token in window range) over 5,000 docs of
    // otherwise-unique tokens. Unguarded, every ("the", u*) pair is a
    // reduce key and "the"-rows dominate the shuffle; the df ceiling
    // (79% of docs) removes the stopword before pair generation, so no
    // surviving pair mentions it and the pair volume collapses to the
    // unique-token tails.
    val rows = (0 until 5000).map { id =>
      val uniq = (1 to 8).map(i => s"u${id}x$i")
      (id.toLong, uniq.flatMap(u => Seq("the", u)).mkString(" "))
    }
    val dir = tempDir("zipfco")
    rows.toDF("doc_id", "text").repartition(8)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("text_cooccurrence")(spark, dir)
      .select("w1", "w2").as[(String, String)].collect()
    out should not be empty
    out.foreach { case (w1, w2) =>
      w1 should not be "the"
      w2 should not be "the"
    }
    // the hot set is broadcast, never joined by shuffle
    val plan = graft.SparkEntry.queries("text_cooccurrence")(spark, dir)
      .queryExecution.executedPlan.toString
    plan should include("Broadcast")
  }

  behavior of "bucketed co-located join"

  it should "join two bucketed tables without a shuffle" in {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    graft.queries.QueryKit.table(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    graft.queries.QueryKit.table(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    // at test scale the planner would rightly broadcast instead; force
    // the shuffle-join path to expose the bucketing guarantee
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem").join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      // co-located: storage partitioning satisfies the join distribution
      plan should include("SortMergeJoin")
      plan should not include "Exchange"
      joined.count() should be > 0L
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  behavior of "pipeline_token_budget sub-bucket prefix scan"

  // VERDICT r16 flagged the single per-source window as a 100 TB
  // straggler machine (~20 sources ⇒ one source = ONE task's sort).
  // The two-phase scan must (a) reproduce the single-window running
  // sum bit-for-bit and (b) never sort a whole source in one window
  // partition — the doc-level window partitions by (source, sub).
  it should "equal the single-window cut on a planted mega source, with no source-sized window sort" in {
    import spark.implicits._
    // one mega source (12k docs, mixed sizes) + a niche source
    val d = ((0L until 12000L).map(i => (i, "mega", (i % 7) + 1L)) ++
      (20000L until 20050L).map(i => (i, "niche", 3L)))
      .toDF("doc_id", "source", "n_tokens")
    val budget = 5000L // binding for mega, non-binding for niche
    val got = graft.ext.ExtQueries.tokenBudgetOf(d, budget)
    val wRef = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("hk").asc, col("doc_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val ref = d.withColumn("hk", md5(col("doc_id").cast("string")))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(wRef))
      .filter(col("cum_tokens") <= budget)
      .select("doc_id", "source", "n_tokens", "cum_tokens")
    got.orderBy("doc_id").collect() shouldBe ref.orderBy("doc_id").collect()
    // the niche source's budget is non-binding: all 50 docs kept
    got.filter(col("source") === "niche").count() shouldBe 50L
    // plan audit: the DOC-LEVEL window (ordered by hk) partitions by
    // (source, sub); only the bounded ≤256-row offsets window may
    // partition by source alone
    val wins = got.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        (w.partitionSpec.map(_.sql).mkString(","),
          w.orderSpec.map(_.sql).mkString(","))
    }
    val docWins = wins.filter(_._2.contains("hk"))
    docWins should not be empty
    docWins.foreach { case (part, _) => part should include("sub") }
  }

  it should "pack with the same distributed scan: packCum equals the single-window cum" in {
    import spark.implicits._
    // chunk frame of a mega source: 8k docs × 1-3 chunks
    val chunks = (0L until 8000L).flatMap { i =>
      (0L until (i % 3 + 1)).map(c => (i, "mega", c, (i % 5) + 2L))
    }.toDF("doc_id", "source", "chunk_idx", "chunk_tokens")
    val got = graft.ext.ExtQueries.packCum(chunks)
      .select("source", "doc_id", "chunk_idx", "chunk_tokens", "cum")
    val wRef = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(col("hk").asc, col("doc_id").asc, col("chunk_idx").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val ref = chunks.withColumn("hk", md5(col("doc_id").cast("string")))
      .withColumn("cum", sum(col("chunk_tokens")).over(wRef))
      .select("source", "doc_id", "chunk_idx", "chunk_tokens", "cum")
    got.orderBy("doc_id", "chunk_idx").collect() shouldBe
      ref.orderBy("doc_id", "chunk_idx").collect()
    val wins = got.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        (w.partitionSpec.map(_.sql).mkString(","),
          w.orderSpec.map(_.sql).mkString(","))
    }
    val docWins = wins.filter(_._2.contains("hk"))
    docWins should not be empty
    docWins.foreach { case (part, _) => part should include("sub") }
  }

  it should "rank shard positions with the same scan: rankByHash equals the single-window row_number" in {
    import spark.implicits._
    val d = (0L until 20000L).map { i =>
      (i, f"${(i * 2654435761L) % 4294967296L}%08x" + f"$i%08d")
    }.toDF("doc_id", "hk")
      .withColumn("shard", pmod(col("doc_id"), lit(3L)))
    val got = graft.ext.ExtQueries.rankByHash(d, Seq("shard"))
      .select("doc_id", "shard", "pos")
    val wRef = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("hk").asc, col("doc_id").asc)
    val ref = d.withColumn("pos", row_number().over(wRef).cast("long"))
      .select("doc_id", "shard", "pos")
    got.orderBy("doc_id").collect() shouldBe ref.orderBy("doc_id").collect()
    val wins = got.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        (w.partitionSpec.map(_.sql).mkString(","),
          w.orderSpec.map(_.sql).mkString(","))
    }
    val rowWins = wins.filter(_._2.contains("hk"))
    rowWins should not be empty
    rowWins.foreach { case (part, _) => part should include("__sub") }
  }
}
