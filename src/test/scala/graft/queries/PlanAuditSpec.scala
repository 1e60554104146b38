package graft.queries

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** Physical-plan audit of the declared query inventory: the plans must
  * not merely pass the oracle, they must be the plans you'd want at
  * 100 TB — broadcasts on small sides, filters and projections pushed
  * into the parquet scan, TakeOrderedAndProject for top-k, and no
  * cartesian anywhere. Runs against sf0.001 (planning is
  * scale-independent). */
class PlanAuditSpec extends AnyFlatSpec with Matchers with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  behavior of "query plans"

  it should "broadcast every dimension side of the regional-revenue join" in {
    val p = plan("join_q5_regional_revenue")
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin" // no shuffle join against dims
  }

  it should "plan top-k as TakeOrderedAndProject, not sort-all" in {
    plan("topk_orders") should include("TakeOrderedAndProject")
  }

  it should "push the market-segment filter into the parquet scan" in {
    plan("join_q3_top_orders") should
      include regex "PushedFilters: \\[[^\\]]*EqualTo\\(c_mktsegment,BUILDING\\)"
  }

  it should "prune the scan to the projected columns" in {
    val p = plan("parity_date_partition")
    p should include("ReadSchema")
    // orders has 9 columns; this projection needs exactly two
    p should include("o_orderkey")
    p should not include "o_comment"
    p should not include "o_totalprice"
  }

  it should "scan the corpus ONCE at runtime in the verify-bearing dedup pipeline" in {
    // the shared distinct-shingle subtree only pays off if AQE's
    // exchange reuse actually fires at RUNTIME — assert it on the
    // adaptive FINAL plan (executedPlan after an action; its toString
    // appends an '== Initial Plan ==' section, which is pre-reuse and
    // must be excluded)
    val df = graft.SparkEntry.queries("dedup_jaccard")(spark, dir)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    "FileScan parquet".r.findAllIn(finalPlan).size shouldBe 1
    "ReusedExchange".r.findAllIn(finalPlan).size should be >= 3
  }

  it should "broadcast the benchmark shingle set in decontamination" in {
    // the corpus side must NEVER shuffle for the join: benchmark
    // n-grams are metadata-sized, the corpus is the 100 TB side
    val p = plan("pipeline_decontaminate")
    p should include("BroadcastHashJoin")
    p.toLowerCase should not include "sortmergejoin"
  }

  it should "never plan a cartesian or nested-loop for the LSH dedup pipeline" in {
    Seq("dedup_minhash", "dedup_jaccard", "sim_ann_lsh", "dedup_embed_cosine",
      "pipeline_decontaminate", "text_repetition", "text_keywords",
      "dedup_simhash_pairs").foreach { q =>
      val p = plan(q).toLowerCase
      withClue(q) {
        p should not include "cartesianproduct"
        p should not include "broadcastnestedloop"
      }
    }
  }

  it should "broadcast the query side of brute-force similarity search" in {
    // the ONE sanctioned nested-loop: 5 broadcast query vectors against
    // the corpus — by construction, never corpus × corpus
    plan("sim_topk") should include("BroadcastNestedLoopJoin")
  }

  it should "mine hard negatives through the index with no corpus-sided nested loop (VERDICT r11 #5)" in {
    // the composed production form (unlike the oracle-scale
    // sim_hard_negatives, whose corpus-sided BroadcastNestedLoopJoin
    // is exactly what this replaces): candidates come from the probed
    // cells' code files, and the corpus is touched only by a
    // broadcast-hash-pruned scan that attaches label + rerank
    // embedding to each candidate. The ONLY nested loop allowed is the
    // query-side centroid assignment, whose build side is the index's
    // metadata-sized coarse/ table — never a corpus scan.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val planTree = graft.SparkEntry.queries("sim_hard_negatives_store")(spark, dir)
      .queryExecution.executedPlan
    val p = planTree.toString
    p should not include "CartesianProduct"
    p should include("BroadcastHashJoin")
    // the code-store read prunes to the probed cells at the file level
    "PartitionFilters: \\[cell#\\d+ IN".r.findFirstIn(p) should not be empty
    planTree.collect { case j: BroadcastNestedLoopJoinExec => j }.foreach { j =>
      val build = if (j.buildSide.toString.contains("Right")) j.right else j.left
      val corpusScans = build.collect {
        case s: FileSourceScanExec
            if s.toString.contains("embeddings.parquet") ||
              s.toString.contains("documents.parquet") => s
      }
      withClue("nested-loop build side scans corpus: ") {
        corpusScans shouldBe empty
      }
    }
  }

  it should "scan the documents table at most twice in the corpus-clean pipeline" in {
    // VERDICT r2 #2: the quality gate, MinHash signatures and exact
    // verify must share ONE tokenized/shingled intermediate. The shared
    // distinct-shingle subtree is identical in every branch, so
    // ReuseExchange materializes it once — with AQE off the reuse is
    // visible statically in the physical plan.
    import org.apache.spark.sql.execution.FileSourceScanExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for ((q, maxScans) <- Seq("pipeline_corpus_clean" -> 2, "dedup_jaccard" -> 1)) {
        val plan = graft.SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan
        val docScans = plan.collect {
          case s: FileSourceScanExec if s.toString.contains("documents") => s
        }.size
        withClue(s"$q documents-scan count: ") { docScans should be <= maxScans }
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  it should "keep per-row extension queries free of data shuffles" in {
    // narrow ops: the only exchange allowed is the final orderBy the
    // oracle-determinism harness requires
    // text_bpe_encode: training runs at plan-construction time
    // (metadata collect); the ENCODE plan itself must stay a narrow
    // fold of literal replaces. multimodal_decode: the codec runs
    // partition-wise; nothing may shuffle but the oracle sort.
    Seq("text_stats", "text_lang_id", "text_bpe_tokens", "multimodal_ingest",
      "text_rolling_hash", "text_pii_scrub", "text_bpe_encode",
      "multimodal_decode").foreach { q =>
      val p = plan(q)
      withClue(q) {
        "Exchange".r.findAllIn(p).size should be <= 2 // range-partition sort only (AQE may reuse one)
        p should not include "HashAggregate" // no accidental aggregation
      }
    }
  }

  it should "plan the anti join as a join with the anti-side filter pushed down" in {
    val p = plan("join_anti")
    p should include("LeftAnti")
    // the priority filter runs below the join, on the orders scan
    p should include regex "PushedFilters: \\[[^\\]]*EqualTo\\(o_orderpriority,1-URGENT\\)"
  }

  it should "plan grouping sets as ONE scan + one Expand" in {
    val p = plan("agg_grouping_sets")
    "Expand".r.findAllIn(p).size shouldBe 1
    "FileScan parquet".r.findAllIn(p).size shouldBe 1
  }

  it should "decorrelate the scalar subquery into an aggregate + join (no per-row subplan)" in {
    val p = plan("join_correlated_subquery")
    // a non-decorrelated plan would carry a ScalarSubquery node executed
    // per outer row; the rewrite leaves a join against a pre-aggregated
    // (one row per customer) side
    p should not include "ScalarSubquery"
    p should include("HashAggregate")
  }

  it should "plan corpus heavy hitters as partial top-k, not a global sort" in {
    plan("text_heavy_hitters") should include("TakeOrderedAndProject")
  }

  it should "plan co-occurrence top-k as partial top-k over the pair aggregate" in {
    val p = plan("text_cooccurrence")
    p should include("TakeOrderedAndProject")
    p should not include "CartesianProduct"
  }

  it should "decorrelate the LATERAL subquery into a windowed top-k (no per-row subplan)" in {
    val p = plan("join_lateral")
    // per-row re-execution would appear as a LateralJoin/ScalarSubquery;
    // the decorrelated form is one orders scan + partitioned window rank
    p should not include "ScalarSubquery"
    p should include("Window")
    p should not include "CartesianProduct"
  }

  it should "serve both window specs of lag/lead from ONE customer shuffle" in {
    val p = plan("window_lag_lead")
    // same partition key (o_custkey) for the date- and spend-ordered
    // specs: one hash exchange + per-spec sorts, plus only the final
    // oracle-determinism range sort
    "Exchange hashpartitioning".r.findAllIn(p).size shouldBe 1
  }

  it should "aggregate each funnel stage to per-user rows before joining" in {
    val p = plan("events_funnel")
    p should not include "CartesianProduct"
    // three stage aggregates (view/click/purchase) all below the joins
    "HashAggregate".r.findAllIn(p).size should be >= 3
  }

  it should "keep sequence packing cartesian-free with at most the prefix-scan's two corpus scans" in {
    val p = plan("pipeline_pack_sequences")
    p should not include "CartesianProduct"
    // round 17: the distributed sub-bucket prefix scan adds ONE extra
    // narrow pass (the per-(source, sub) totals aggregate — column-
    // pruned to 3 columns) in exchange for eliminating the per-source
    // single-task window sort VERDICT r16 flagged. Two scans, both
    // pruned, is the intended shape; the offsets side must broadcast.
    "FileScan parquet".r.findAllIn(p).size should be <= 2
    p should include("BroadcastExchange")
  }

  it should "count segment doc-frequency with bounded aggregates; boiler-set join planner-chosen" in {
    // VERDICT r5 #2: per-segment frequency must never be per-key window
    // state (a million-doc boilerplate segment = one task's buffer).
    // The bounded shape: count(distinct) on h (partial-agg'd), the
    // over-threshold set joined back WITHOUT a mandatory broadcast hint
    // (ADVICE r6: on duplication-heavy corpora that set scales with the
    // corpus — AQE must stay free to pick the join side/strategy).
    val p = plan("dedup_segments")
    p should not include "CartesianProduct"
    p should not include "Window" // the old collect_set-over-h shape
    withClue(p) { p should include("partial_count(distinct doc_id") }
    // at THIS corpus size AQE converts the boiler join to broadcast at
    // runtime — size-based, not mandated
    val df = graft.SparkEntry.queries("dedup_segments")(spark, dir)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    fin should include("BroadcastHashJoin")
  }

  it should "derive retention cohorts from ONE events scan (window min, no self-join)" in {
    val p = plan("events_retention")
    "FileScan parquet".r.findAllIn(p).size shouldBe 1
    p should not include "Join"
  }

  it should "keep the round-5 single-scan operators at one corpus scan, cartesian-free" in {
    Seq("events_anomaly", "pipeline_manifest",
      "multimodal_frames", "pipeline_quality_report", "scalar_funcs").foreach { q =>
      val p = plan(q)
      withClue(q) {
        p should not include "CartesianProduct"
        "FileScan parquet".r.findAllIn(p).size shouldBe 1
      }
    }
    // pipeline_shard_shuffle moved to the two-phase distributed rank in
    // round 17: one extra narrow pass (per-(shard, sub) counts) buys
    // away the per-shard single-task row_number sort — two pruned
    // scans + a broadcast offsets side is the intended shape
    val p = plan("pipeline_shard_shuffle")
    p should not include "CartesianProduct"
    "FileScan parquet".r.findAllIn(p).size should be <= 2
    p should include("BroadcastExchange")
  }

  it should "profile substring duplication in ONE corpus scan, join-free" in {
    // the Lee-et-al substring tier must stay linear: one scan, the
    // window-key exchange + the per-doc exchange, no join anywhere (a
    // self-join form either re-scans the corpus or broadcasts a
    // corpus-sized key set)
    val p = plan("dedup_substring")
    "FileScan parquet".r.findAllIn(p).size shouldBe 1
    p should not include "Join"
    "Exchange hashpartitioning".r.findAllIn(p).size shouldBe 2
  }

  it should "keep incremental dedup cartesian-free with the cross-side filter below the verify" in {
    val p = plan("dedup_incremental")
    p should not include "CartesianProduct"
    p should include("LeftSemi") // exact-dup check never materializes match rows
  }

  // --- structural helpers for the sided-join audits (ADVICE r7 #5:
  // anchor on operator types and expression CLASSES, not on Spark's
  // rendered predicate text, which changes across engine versions) ---

  private def physicalNodes(name: String): Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val root = graft.SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
    root.collect { case n => n }
  }

  /** Attribute names a filter condition compares beyond null checks. */
  private def comparedRefs(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Set[String] = {
    import org.apache.spark.sql.catalyst.expressions.{And, IsNotNull}
    e match {
      case IsNotNull(_) => Set.empty
      case And(l, r)    => comparedRefs(l) ++ comparedRefs(r)
      case other        => other.references.map(_.name).toSet
    }
  }

  /** No FilterExec compares `a` with `b` — i.e. no pair row carrying
    * both sides' ids is ever generated then discarded by a filter. */
  private def assertNoPostJoinSideFilter(name: String, a: String, b: String): Unit = {
    import org.apache.spark.sql.execution.FilterExec
    val offenders = physicalNodes(name).collect {
      case f: FilterExec if {
        val refs = comparedRefs(f.condition)
        refs.contains(a) && refs.contains(b)
      } => f
    }
    withClue(s"$name: post-join filter comparing $a with $b: ") {
      offenders shouldBe empty
    }
  }

  /** Count document scans whose pushed-down data filters contain an
    * expression matched by `pred` — side pruning at the SOURCE. */
  private def docScansFilteredBy(name: String)(
      pred: PartialFunction[org.apache.spark.sql.catalyst.expressions.Expression, Boolean]): Int = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    physicalNodes(name).collect {
      case s: FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("documents.parquet")) &&
            s.dataFilters.exists(_.exists(e => pred.lift(e).getOrElse(false))) => s
    }.size
  }

  it should "enumerate ONLY cross-side pairs in incremental dedup (sided band join)" in {
    // VERDICT r6 #1: the band join's inputs must each contain one side —
    // the parity side filters are pushed below the join (onto the
    // scans), and no post-join parity filter survives (same-side pairs
    // are never generated, not generated-then-discarded)
    import org.apache.spark.sql.catalyst.expressions.Pmod
    docScansFilteredBy("dedup_incremental") {
      case p: Pmod => p.references.map(_.name).toSet == Set("doc_id")
    } should be >= 2 // both sides side-pruned at the source
    assertNoPostJoinSideFilter("dedup_incremental", "doc_a", "doc_b")
  }

  it should "enumerate ONLY cross-split pairs in split-leakage detection (sided band join)" in {
    // eval side: seeded-hash bucket >= EvalBucket; train side: its
    // negation — both pushed below the band join onto the scans; no
    // post-join filter comparing the two sides' ids remains
    import org.apache.spark.sql.catalyst.expressions.{Conv, Not}
    docScansFilteredBy("pipeline_split_leakage") {
      case c: Conv => c.references.map(_.name).toSet == Set("doc_id")
    } should be >= 2 // both sides carry the seeded-hash split predicate
    docScansFilteredBy("pipeline_split_leakage") {
      case n: Not => n.exists(_.isInstanceOf[Conv])
    } should be >= 1 // ... and one of them is the train-side negation
    assertNoPostJoinSideFilter("pipeline_split_leakage", "doc_a", "doc_b")
    assertNoPostJoinSideFilter("pipeline_split_leakage", "ea", "eb")
  }

  it should "broadcast PQ codebooks and distance tables — corpus embeddings never shuffle" in {
    val p = plan("sim_pq")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    // codebook assignment + ADC lookups ride subspace-keyed broadcast
    // hash joins against the (m × codebookK)-row codebook table
    p should include("BroadcastHashJoin")
    // the only hash exchanges are the final (query, neighbor) ADC
    // aggregate + rank window and the per-(s,cell,pos) training sums —
    // never an embedding-carrying corpus shuffle: no exchange's
    // output columns contain the full embedding vector
    "Exchange hashpartitioning\\([^)]*embedding".r.findAllIn(p).size shouldBe 0
  }

  it should "restrict IVF+PQ scoring by a broadcast candidate set — no corpus-sized shuffle" in {
    val p = plan("sim_ivfpq")
    p should not include "CartesianProduct"
    // cell pruning joins the (broadcast) candidate pairs against the
    // codes, and the ADC tables are broadcast too — the corpus codes
    // flow scan → broadcast joins → partial aggregate without ever
    // shuffling before the candidate restriction has filtered them
    p should include("BroadcastHashJoin")
    "Exchange hashpartitioning\\([^)]*embedding".r.findAllIn(p).size shouldBe 0
  }

  it should "keep the semantic dedup family cartesian-free — nested-loops broadcast metadata only" in {
    // round 10: the three-tier decision surface and both SemDeDup
    // forms. The ONLY sanctioned nested-loop is assignCells'
    // crossJoin(broadcast(centroids)) — whose build side is
    // metadata-sized by construction (checkpointed trained centroids,
    // or the index store's coarse/ table) and NEVER a corpus scan.
    // The attach subtree replicates across the decision's self-join
    // branches, so the invariant is per-node build-side content, not
    // a node count. In-cell pair enumeration must be an equi-join on
    // the cell key, never a product.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // pipeline_dedup_apply's connected-components tiers run under
      // eager checkpoints, so its FINAL plan only joins the
      // checkpointed cluster labels — the attach is audited through
      // the two semantic queries that share the enumeration code
      for ((q, attachVisible) <- Seq("pipeline_dedup_apply" -> false,
          "dedup_semantic" -> true, "dedup_semantic_store" -> true)) {
        val planTree = graft.SparkEntry.queries(q)(spark, dir)
          .queryExecution.executedPlan
        withClue(q) {
          planTree.toString should not include "CartesianProduct"
          val bnljs = planTree.collect {
            case j: BroadcastNestedLoopJoinExec => j
          }
          if (attachVisible) bnljs should not be empty // the attach exists
          bnljs.foreach { j =>
            val build =
              if (j.buildSide.toString.contains("Right")) j.right else j.left
            val corpusScans = build.collect {
              case s: FileSourceScanExec
                  if s.toString.contains("embeddings.parquet") ||
                    s.toString.contains("documents.parquet") => s
            }
            withClue(s"nested-loop build side scans corpus: ") {
              corpusScans shouldBe empty
            }
          }
        }
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
  it should "normalize text map-only: no joins, no hash shuffle, codegen'd NFC (round 13)" in {
    // codegen spans only materialize on the adaptive FINAL plan
    val df = graft.SparkEntry.queries("text_normalize")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // two scans of documents (the base slice + the planted dirty
    // clones), nothing else — the normalization chain itself is one
    // narrow projection with no exchange beyond the ORDER BY's range
    // partitioning
    "FileScan parquet".r.findAllIn(p).size shouldBe 2
    p should not include "Join"
    "Exchange hashpartitioning".r.findAllIn(p).size shouldBe 0
    // the native NFC expression participates in whole-stage codegen:
    // the Project carrying graft_nfc is inside a starred (codegen'd)
    // span — a fallback would strand it in an unstarred Project
    p should include regex "\\*\\(\\d+\\) Project .*graft_nfc"
  }

  it should "broadcast the per-source rate table in temperature sampling (round 16)" in {
    val p = plan("pipeline_sample_temperature")
    // the rates side is source-cardinality metadata: the doc-side join
    // must be a broadcast, never a corpus shuffle join
    p should include("BroadcastHashJoin")
    p should not include "CartesianProduct"
    // the one SortMergeJoin-shaped risk would be rates joined by
    // shuffle — with both norm and rates broadcast there is none
    p should not include "SortMergeJoin"
  }

  it should "bucket LM-surprise quartiles without a corpus-sized sort (round 16)" in {
    val p = plan("pipeline_quality_buckets")
    // the quantile machinery runs over the value HISTOGRAM: the only
    // window in the plan sorts histogram rows (domain-bounded), and
    // the boundary frame reaches each doc by broadcast
    p should not include "CartesianProduct"
    p should include("BroadcastNestedLoopJoin") // 1-row bounds frame × docs: planner's literal-free form
  }

  it should "select the token budget with one per-source window and no joins beyond the tokenize pass (round 16)" in {
    val p = plan("pipeline_token_budget")
    p should not include "CartesianProduct"
    p should include("Window")
    p should not include "SortMergeJoin"
  }

  it should "keep the quality-classifier features cartesian-free with the LM corpus stats broadcast (round 13)" in {
    // the query's final frame is localCheckpoint-materialized (opaque
    // plan), so audit the feature-extraction plan the fit/score read
    import org.apache.spark.sql.functions.lit
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").withColumn("label", lit(1L))
    val p = graft.ext.QualityClassifier
      .features(d, d, "doc_id", "text", Seq("the", "a", "of"))
      .queryExecution.executedPlan.toString
    p should not include "CartesianProduct"
    // the (vn, nn) corpus scalars are collected ONCE at trainLm time
    // and inlined as literals (round 15: the shared LmModel the
    // streaming tier broadcasts) — the per-row plan carries no joint
    // join for them at all, and every bigram-keyed LM join is an
    // equi-join
    p should not include "BroadcastNestedLoopJoin"
  }

}
