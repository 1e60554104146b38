package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryKit._

/** Relational core: aggregation, joins, windows, top-k, set ops,
  * rollup, streaming-style tumbling windows. The reference pushes all
  * relational work into the source database (SURVEY.md §2.4-2.6); our
  * engine executes it natively on Spark, so these queries are the
  * capability + performance surface the bench measures.
  *
  * Scale notes (100 TB): the dimension sides of every join here are
  * orders-of-magnitude smaller than the fact table — Spark's AQE
  * broadcast-joins them automatically; aggregations are partial
  * (map-side combine) before the single shuffle on the group keys.
  */
object AnalyticsQueries {

  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1-flavor pricing summary over lineitem. One shuffle on the
    * 2-value group key after map-side partial aggregation. */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        decSum(col("l_quantity")).as("sum_qty"),
        decSum(col("l_extendedprice")).as("sum_base_price"),
        decSum(col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
          .as("sum_disc_price"),
        decAvg(col("l_quantity")).as("avg_qty"),
        decAvg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1PricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-flavor: top 10 BUILDING-segment orders by revenue.
    * customer is broadcast; revenue is an exact decimal sum so the
    * top-k ordering is identical on both engines. */
  def q3TopOrders(spark: SparkSession, dir: String): DataFrame = {
    val customer = table(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val orders = table(spark, dir, "orders")
    val lineitem = table(spark, dir, "lineitem")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderkey", "o_orderdate")
      .agg(decSum(col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
  }

  val q3TopOrdersSql: String =
    """SELECT o_orderkey, o_orderdate,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey ASC
      |LIMIT 10""".stripMargin

  /** TPC-H Q5-flavor: revenue by nation across a 5-table star join.
    * region/nation/customer broadcast into the orders⨝lineitem stream. */
  def q5RegionalRevenue(spark: SparkSession, dir: String): DataFrame = {
    val region = table(spark, dir, "region")
    val nation = table(spark, dir, "nation")
    val customer = table(spark, dir, "customer")
    val orders = table(spark, dir, "orders")
    val lineitem = table(spark, dir, "lineitem")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        decSum(col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  val q5RegionalRevenueSql: String =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** Ranking window: top-3 orders per customer by totalprice.
    * One shuffle on o_custkey; deterministic tie-break on o_orderkey. */
  def windowTopPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    table(spark, dir, "orders")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("o_custkey", "rnk", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rnk")
  }

  val windowTopPerCustomerSql: String =
    """SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
      |  FROM orders) WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin

  /** Global top-k: TakeOrderedAndProject, no full sort at scale. */
  def topKOrders(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .limit(20)

  val topKOrdersSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin

  /** Distinct aggregation: supplier/part reach per return flag. */
  def distinctAgg(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_suppkey")).as("n_suppliers"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  val distinctAggSql: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_suppkey) AS n_suppliers,
      |  COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Set op: customers that have at least one order (INTERSECT). */
  /** Multiset (ALL) variants: exceptAll keeps multiplicity — a custkey
    * with n orders survives n−1 times against the single customer row.
    * Both plan as aggregate+join with count bookkeeping, one shuffle. */
  def setExceptAll(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders").select(col("o_custkey").as("custkey"))
      .exceptAll(table(spark, dir, "customer").select(col("c_custkey").as("custkey")))
      .groupBy("custkey").agg(count(lit(1)).as("n_surplus"))
      .orderBy("custkey")

  val setExceptAllSql: String =
    """SELECT custkey, count(*)::BIGINT AS n_surplus FROM (
      |  SELECT o_custkey AS custkey FROM orders
      |  EXCEPT ALL
      |  SELECT c_custkey FROM customer
      |) t GROUP BY custkey ORDER BY custkey""".stripMargin

  def setIntersectAll(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders").select(col("o_custkey").as("custkey"))
      .intersectAll(table(spark, dir, "customer").select(col("c_custkey").as("custkey")))
      .orderBy("custkey")

  val setIntersectAllSql: String =
    """SELECT o_custkey AS custkey FROM orders
      |INTERSECT ALL
      |SELECT c_custkey FROM customer
      |ORDER BY custkey""".stripMargin

  def setIntersect(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer").select("c_custkey")
      .intersect(table(spark, dir, "orders").select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")

  val setIntersectSql: String =
    """SELECT c_custkey FROM customer
      |INTERSECT
      |SELECT o_custkey FROM orders
      |ORDER BY c_custkey""".stripMargin

  /** Set op: customers with no orders (EXCEPT / anti join). */
  def setExcept(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer").select("c_custkey")
      .except(table(spark, dir, "orders").select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")

  val setExceptSql: String =
    """SELECT c_custkey FROM customer
      |EXCEPT
      |SELECT o_custkey FROM orders
      |ORDER BY c_custkey""".stripMargin

  /** ROLLUP over the region→nation hierarchy (customer counts).
    * NULLS FIRST pinned explicitly — Spark and DuckDB default
    * differently. */
  def rollupCustomers(spark: SparkSession, dir: String): DataFrame = {
    // Expressed in SQL: Dataset-API rollup over a multi-join trips
    // Spark 4.1's DetectAmbiguousSelfJoin false positive (the Expand
    // node re-emits the grouping attributes). Catalyst still broadcasts
    // both dimensions and prunes the scans. The views are dropped after
    // planning — nothing leaks into the shared session catalog.
    table(spark, dir, "customer").createOrReplaceTempView("g_customer")
    table(spark, dir, "nation").createOrReplaceTempView("g_nation")
    table(spark, dir, "region").createOrReplaceTempView("g_region")
    try spark.sql(
      """SELECT r_name, n_name, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal
        |FROM g_customer
        |JOIN g_nation ON c_nationkey = n_nationkey
        |JOIN g_region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
    finally Seq("g_customer", "g_nation", "g_region")
      .foreach(spark.catalog.dropTempView(_): Unit)
  }

  val rollupCustomersSql: String =
    """SELECT r_name, n_name, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  /** Tumbling-window aggregation over the events stream table — the
    * batch shape of `groupBy(window($"ts", "1 hour"))`; at scale this is
    * the watermarked Structured Streaming aggregate. */
  def eventsTumbling(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(date_trunc("hour", tsMicros("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        decSum(col("value")).as("sum_value"))
      .orderBy("window_start", "event_type")

  val eventsTumblingSql: String =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** Per-user session windows (30-minute inactivity gap) over the
    * events table — the third windowed-aggregation shape beside
    * tumbling and frame windows. Spark's `session_window` keyword
    * (merge-on-overlap, end = last event + gap) against a DuckDB
    * gaps-and-islands oracle: a new session starts when the gap to the
    * previous event is ≥ the timeout (Spark merges strictly-before-end
    * only), sessions numbered by a running sum. */
  def eventsSessionWindow(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .withColumn("evt_ts", tsMicros("ts"))
      .groupBy(session_window(col("evt_ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), decSum(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")

  val eventsSessionWindowSql: String =
    """WITH g AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT *, sum(new_session) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess
      |  FROM g)
      |SELECT user_id,
      |  min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTE AS session_end,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM s GROUP BY user_id, sess
      |ORDER BY user_id, session_start""".stripMargin

  /** Full-outer reconciliation: per-customer order rollup keeping BOTH
    * orderless customers (null order side) and any orphan orders (null
    * customer side) — the audit-join shape. The shuffle join is
    * unavoidable for full-outer (no broadcast strategy exists for it);
    * both sides pre-aggregate to one row per key before joining, so the
    * exchange carries rollups, not raw orders. */
  def fullOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val perCust = table(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), decSum(col("o_totalprice")).as("total_spend"))
    table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
      .join(perCust, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_mktsegment"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("total_spend"), lit(0.0)).as("total_spend"))
      .orderBy("custkey")
  }

  val fullOuterJoinSql: String =
    """WITH per_cust AS (
      |  SELECT o_custkey, COUNT(*) AS n_orders,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spend
      |  FROM orders GROUP BY o_custkey)
      |SELECT coalesce(c_custkey, o_custkey) AS custkey, c_mktsegment,
      |  coalesce(n_orders, 0) AS n_orders,
      |  coalesce(total_spend, 0.0) AS total_spend
      |FROM customer FULL OUTER JOIN per_cust ON c_custkey = o_custkey
      |ORDER BY custkey""".stripMargin

  /** Exact distribution aggregates: median and p90 of extended price
    * per return flag — linear-interpolated exact percentiles (both
    * engines define quantiles the same way), emitted as e2-scaled
    * BIGINTs so the hash compare is representation-proof. Exact
    * percentile is a sort-based aggregate; at scale swap in
    * approx_percentile (t-digest) and drop the oracle to rows-only. */
  def aggPercentiles(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        // ONE percentile buffer for both quantiles — two separate
        // percentile() calls would hold the group's values twice
        expr("percentile(l_extendedprice, array(0.5D, 0.9D))").as("pcts"),
        count(lit(1)).as("n_rows"))
      .select(col("l_returnflag"),
        round(element_at(col("pcts"), 1) * 100).cast("long").as("p50_e2"),
        round(element_at(col("pcts"), 2) * 100).cast("long").as("p90_e2"),
        col("n_rows"))
      .orderBy("l_returnflag")

  val aggPercentilesSql: String =
    """SELECT l_returnflag,
      |  CAST(round(quantile_cont(l_extendedprice, 0.5) * 100) AS BIGINT) AS p50_e2,
      |  CAST(round(quantile_cont(l_extendedprice, 0.9) * 100) AS BIGINT) AS p90_e2,
      |  COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** The APPROXIMATE tier of the distinct/percentile family — the plan
    * that actually runs at 100 TB, where exact distinct counts shuffle
    * every key and exact percentiles sort every partition:
    * `approx_count_distinct` (HyperLogLog++, fixed-size sketch buffers,
    * pure map-side mergeable) and `approx_percentile` (quantile sketch,
    * bounded accuracy parameter). No DuckDB oracle can reproduce
    * sketch internals, but the accuracy CONTRACT is checkable: this
    * query computes sketch and exact aggregates in ONE plan and emits
    * the exact values plus per-group pass/fail bounds flags — the
    * oracle recomputes the exact columns and pins every flag to 1, so
    * a sketch drifting out of tolerance flips a flag and fails the
    * hash compare (VERDICT r5 #8: the former rows-only check is now a
    * full oracle). Bounds mirror ApproxAccuracySpec: HLL++ at default
    * relativeSD 0.05 within 15% (3σ), the accuracy-1000 quantile
    * sketch within 2% of the exact median. The production form drops
    * the exact legs; the gate's job is proving the sketch contract. */
  def aggApprox(spark: SparkSession, dir: String): DataFrame = {
    // the exact distinct legs live in their OWN aggregates, joined back
    // on the (3-row) group key: two countDistincts + a percentile in
    // one agg would plan a 3× Expand of the whole fact table (measured
    // 5.1 s vs 2.4 s at sf0.1), and at 100 TB the Expand triples the
    // shuffle where the join of independent aggregates adds only
    // broadcast-sized group rows
    val li = table(spark, dir, "lineitem")
    val sketches = li
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("ap"),
        approx_count_distinct(col("l_suppkey")).as("asu"),
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("p50a"),
        expr("percentile(l_extendedprice, 0.5D)").as("p50e"),
        count(lit(1)).as("n_rows"))
    val parts = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
    val supps = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("exact_suppliers"))
    sketches
      .join(parts, "l_returnflag")
      .join(supps, "l_returnflag")
      .select(col("l_returnflag"), col("exact_parts"), col("exact_suppliers"),
        round(col("p50e") * 100).cast("long").as("exact_p50_e2"),
        col("n_rows"),
        when(abs(col("ap") - col("exact_parts")) * 100
          <= col("exact_parts") * 15, 1L).otherwise(0L).as("parts_ok"),
        when(abs(col("asu") - col("exact_suppliers")) * 100
          <= col("exact_suppliers") * 15, 1L).otherwise(0L).as("suppliers_ok"),
        when(abs(col("p50a") - col("p50e")) * 100 <= col("p50e") * 2, 1L)
          .otherwise(0L).as("p50_ok"))
      .orderBy("l_returnflag")
  }

  val aggApproxSql: String =
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS exact_parts,
      |  count(DISTINCT l_suppkey) AS exact_suppliers,
      |  CAST(round(quantile_cont(l_extendedprice, 0.5) * 100) AS BIGINT) AS exact_p50_e2,
      |  COUNT(*) AS n_rows,
      |  1::BIGINT AS parts_ok, 1::BIGINT AS suppliers_ok, 1::BIGINT AS p50_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Semi-join: orders from customers with positive balance. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .join(broadcast(table(spark, dir, "customer").filter(col("c_acctbal") > 0)),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderstatus")

  val semiJoinSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n_orders FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 0)
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** As-of join: each event enriched with the user's latest order at
    * or before the event date ([[ColumnOps.asOfJoin]] — hash join on
    * the user key + windowed argmax, no custom plan needed). */
  def asofLatestOrder(spark: SparkSession, dir: String): DataFrame = {
    val events = table(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
        to_date(tsMicros("ts")).as("event_date"))
    val orders = table(spark, dir, "orders")
      .select("o_custkey", "o_orderkey", "o_orderdate")
    graft.ops.ColumnOps.asOfJoin(events, orders,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "event_date", rightTime = "o_orderdate",
        uniqueLeftId = "event_id", rightTieBreakers = Seq("o_orderkey"))
      .select("event_id", "user_id", "o_orderkey", "o_orderdate")
      .orderBy("event_id")
  }

  val asofLatestOrderSql: String =
    """SELECT event_id, user_id, o_orderkey, o_orderdate FROM (
      |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
      |    row_number() OVER (PARTITION BY e.event_id
      |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      |  FROM events e LEFT JOIN orders o
      |    ON e.user_id = o.o_custkey AND o.o_orderdate <= CAST(make_timestamp(epoch_ns(e.ts) // 1000) AS DATE)
      |) t WHERE rn = 1 ORDER BY event_id""".stripMargin

  /** Range (interval) join: per event, how many of the same user's
    * events land in the following hour — a sessionization-style
    * follow-count. Plans as a hash join on the user key with the time
    * range as a post-join filter — the key carries the selectivity, so
    * the plan scales like any equi-join (a dedicated range-join
    * strategy only pays off for keyless interval joins). The range is
    * computed in raw epoch-nanos integer math, exact on both engines. */
  def rangeJoinEvents(spark: SparkSession, dir: String): DataFrame = {
    val e1 = table(spark, dir, "events").select(
      col("event_id"), col("user_id"), col("ts"))
    val e2 = table(spark, dir, "events").select(
      col("user_id").as("u2"), col("ts").as("ts2"))
    val hourNs = 3600L * 1000 * 1000 * 1000
    e1.join(e2,
        col("user_id") === col("u2")
          && col("ts2") > col("ts") && col("ts2") <= col("ts") + hourNs)
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_next_hour"))
      .orderBy("event_id")
  }

  val rangeJoinEventsSql: String =
    """SELECT e1.event_id, count(*)::BIGINT AS n_next_hour
      |FROM events e1 JOIN events e2
      |  ON e2.user_id = e1.user_id
      | AND epoch_ns(e2.ts) > epoch_ns(e1.ts)
      | AND epoch_ns(e2.ts) <= epoch_ns(e1.ts) + 3600000000000
      |GROUP BY e1.event_id
      |ORDER BY e1.event_id""".stripMargin

  /** Window FRAMES (beyond ranking): per-customer running spend
    * (unbounded-preceding row frame over exact decimals) and days
    * since the previous order (lag). One shuffle on the customer key
    * serves both window functions. */
  def windowFrames(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    table(spark, dir, "orders")
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("running_spend",
        sum(col("o_totalprice").cast("decimal(18,4)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .withColumn("days_since_prev",
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)).cast("long"))
      .select("o_custkey", "o_orderkey", "running_spend", "days_since_prev")
      .orderBy("o_custkey", "o_orderkey")
  }

  val windowFramesSql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
      |  date_diff('day',
      |    lag(o_orderdate, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |    o_orderdate)::BIGINT AS days_since_prev
      |FROM orders WHERE o_custkey < 100
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** CUBE over (status, priority): all four grouping-set combinations,
    * NULLS FIRST pinned like the rollup query. */
  def cubeOrders(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        decSum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  val cubeOrdersSql: String =
    s"""SELECT o_orderstatus, o_orderpriority, count(*)::BIGINT AS n_orders,
       |  ${decSumSql("o_totalprice")} AS sum_price
       |FROM orders
       |GROUP BY CUBE (o_orderstatus, o_orderpriority)
       |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** Left anti join: customers with no URGENT order — the anti shape as
    * a JOIN (set_except covers the EXCEPT form): keeps the full outer-side
    * row, and the filter on the anti side is pushed below the join. At
    * scale both sides shuffle on the key (or the filtered anti side
    * broadcasts when small — AQE decides from the post-filter size). */
  def antiJoin(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
      .join(
        table(spark, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_nationkey")
      .orderBy("c_custkey")

  val antiJoinSql: String =
    """SELECT c_custkey, c_name, c_nationkey FROM customer
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** GROUPING SETS ((status), (priority)): two one-dimension rollups in
    * ONE scan + one Expand — the custom-subset shape that neither ROLLUP
    * nor CUBE expresses. Same temp-view SQL route as [[rollupCustomers]]
    * (the Expand node trips DetectAmbiguousSelfJoin on the Dataset API). */
  def groupingSetsOrders(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "orders").createOrReplaceTempView("g_orders")
    try spark.sql(
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
         |FROM g_orders
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
         |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
    finally spark.catalog.dropTempView("g_orders"): Unit
  }

  val groupingSetsOrdersSql: String =
    s"""SELECT o_orderstatus, o_orderpriority, count(*)::BIGINT AS n_orders,
       |  ${decSumSql("o_totalprice")} AS sum_price
       |FROM orders
       |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
       |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** Correlated scalar subquery: orders from customers with ≥ 20 orders.
    * Catalyst decorrelates the subquery (RewriteCorrelatedScalarSubquery)
    * into an aggregate + join — one scan of orders feeds both sides and
    * the aggregate side reduces to one row per customer before the join,
    * so the shape scales like a self-join on a pre-aggregated dimension,
    * not like per-row subquery execution. Count predicate: integer-exact
    * in both engines (a double-avg predicate could flip borderline rows
    * in the last ulp). */
  def correlatedSubquery(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "orders").createOrReplaceTempView("g_orders_corr")
    try spark.sql(
      """SELECT o_orderkey, o_custkey FROM g_orders_corr o
        |WHERE (SELECT COUNT(*) FROM g_orders_corr o2
        |       WHERE o2.o_custkey = o.o_custkey) >= 20
        |ORDER BY o_orderkey""".stripMargin)
    finally spark.catalog.dropTempView("g_orders_corr"): Unit
  }

  val correlatedSubquerySql: String =
    """SELECT o_orderkey, o_custkey FROM orders o
      |WHERE (SELECT COUNT(*) FROM orders o2
      |       WHERE o2.o_custkey = o.o_custkey) >= 20
      |ORDER BY o_orderkey""".stripMargin

  /** Pivot: per-user event counts spread across event-type columns
    * (explicit value list ⇒ stable output schema, the scale-sane form —
    * an unlisted pivot would need a distinct-scan planning pass). */
  def pivotEvents(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")

  val pivotEventsSql: String =
    """SELECT user_id,
      |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS click,
      |  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS error,
      |  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS purchase,
      |  sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS signup,
      |  sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Navigation + distribution window functions over each customer's
    * order timeline: lag/lead (previous/next order price, day gap) on
    * the date ordering, ntile + percent_rank on the spend ordering —
    * the window-function surface beyond frames/row_number that
    * [[windowFrames]]/[[windowTopPerCustomer]] cover. Both orderings
    * are made unique with o_orderkey so tie order can't differ between
    * engines; percent_rank = (rank−1)/(n−1) is a small-integer ratio,
    * IEEE-exact in both engines, emitted ·10⁶. One shuffle on
    * o_custkey serves both window specs (same partition key). */
  def windowLagLead(spark: SparkSession, dir: String): DataFrame = {
    val byDate = Window.partitionBy("o_custkey")
      .orderBy(col("od"), col("o_orderkey"))
    val bySpend = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    table(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("od"), col("o_totalprice"))
      .withColumn("prev_price_e2",
        round(lag(col("o_totalprice"), 1).over(byDate) * 100).cast("long"))
      .withColumn("next_price_e2",
        round(lead(col("o_totalprice"), 1).over(byDate) * 100).cast("long"))
      .withColumn("days_since_prev",
        datediff(col("od"), lag(col("od"), 1).over(byDate)).cast("long"))
      .withColumn("spend_quartile", ntile(4).over(bySpend).cast("long"))
      .withColumn("spend_pct_rank_e6",
        round(percent_rank().over(bySpend) * 1e6).cast("long"))
      .select("o_custkey", "o_orderkey", "prev_price_e2", "next_price_e2",
        "days_since_prev", "spend_quartile", "spend_pct_rank_e6")
      .orderBy("o_custkey", "o_orderkey")
  }

  val windowLagLeadSql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(round(lag(o_totalprice) OVER bydate * 100) AS BIGINT) AS prev_price_e2,
      |  CAST(round(lead(o_totalprice) OVER bydate * 100) AS BIGINT) AS next_price_e2,
      |  date_diff('day', lag(CAST(o_orderdate AS DATE)) OVER bydate,
      |    CAST(o_orderdate AS DATE))::BIGINT AS days_since_prev,
      |  ntile(4) OVER byspend AS spend_quartile,
      |  CAST(round(percent_rank() OVER byspend * 1000000) AS BIGINT) AS spend_pct_rank_e6
      |FROM orders
      |WINDOW bydate AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
      |  byspend AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Hopping (sliding) windows: 30-minute windows every 15 minutes, so
    * each event lands in exactly size/slide = 2 windows — the overlap
    * shape between tumbling ([[eventsTumbling]]) and session
    * ([[eventsSessionWindow]]) windows, and the same `window()` keyword
    * the streaming path uses (StreamingOps). The oracle mirrors Spark's
    * epoch-aligned window generation: floor to the slide, plus the
    * preceding hop. */
  def eventsHoppingWindow(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .withColumn("evt_ts", tsMicros("ts"))
      .groupBy(window(col("evt_ts"), "30 minutes", "15 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), decSum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("window_start", "event_type")

  val eventsHoppingWindowSql: String =
    """WITH h AS (SELECT event_type, value,
      |    CAST(to_timestamp(floor(epoch(ts) / 900) * 900) AS TIMESTAMP) AS h0 FROM events),
      |w AS (SELECT event_type, value,
      |    unnest([h0, h0 - INTERVAL 15 MINUTE]) AS window_start FROM h)
      |SELECT window_start, event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM w GROUP BY window_start, event_type
      |ORDER BY window_start, event_type""".stripMargin

  /** Correlated LATERAL subquery: each customer joined to its top-2
    * orders by price — the per-row table-generating join shape (SQL
    * `LATERAL`). Catalyst decorrelates the ORDER BY … LIMIT subquery
    * (DecorrelateInnerQuery) into a partitioned window rank over one
    * scan of orders — per-GROUP top-k, never per-row re-execution.
    * Inner join: customers with no orders drop out. */
  def lateralTopOrders(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "customer").createOrReplaceTempView("g_cust_lat")
    table(spark, dir, "orders").createOrReplaceTempView("g_ord_lat")
    try spark.sql(
      """SELECT c.c_custkey, t.o_orderkey,
        |  CAST(round(t.o_totalprice * 100) AS BIGINT) AS price_e2
        |FROM g_cust_lat c
        |JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM g_ord_lat
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c.c_custkey, price_e2 DESC, t.o_orderkey""".stripMargin)
    finally {
      spark.catalog.dropTempView("g_cust_lat")
      spark.catalog.dropTempView("g_ord_lat"): Unit
    }
  }

  val lateralTopOrdersSql: String =
    """SELECT c.c_custkey, t.o_orderkey,
      |  CAST(round(t.o_totalprice * 100) AS BIGINT) AS price_e2
      |FROM customer c
      |JOIN LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t ON true
      |ORDER BY c.c_custkey, price_e2 DESC, t.o_orderkey""".stripMargin

  /** Ordered conversion funnel view → click → purchase per user: first
    * view, first click STRICTLY AFTER that view, first purchase
    * strictly after that click — order-dependent min-timestamps, the
    * product-analytics shape plain per-type mins can't express. Each
    * stage is a filtered scan aggregated to one row per user before
    * joining (user-keyed dimension-sized joins; the carried stage
    * timestamps ride as group keys, functionally dependent on the
    * user). Left joins keep users who fall out mid-funnel. */
  def eventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    val e = table(spark, dir, "events")
      .select(col("user_id"), col("event_type"), tsMicros("ts").as("ets"))
    val fv = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ets")).as("view_ts"))
    val fc = e.filter(col("event_type") === "click")
      .join(fv, "user_id").filter(col("ets") > col("view_ts"))
      .groupBy("user_id", "view_ts").agg(min(col("ets")).as("click_ts"))
    val fp = e.filter(col("event_type") === "purchase")
      .join(fc, Seq("user_id")).filter(col("ets") > col("click_ts"))
      .groupBy("user_id", "view_ts", "click_ts").agg(min(col("ets")).as("purchase_ts"))
    fv.join(fc, Seq("user_id", "view_ts"), "left")
      .join(fp, Seq("user_id", "view_ts", "click_ts"), "left")
      .withColumn("stage",
        (lit(1L) + when(col("click_ts").isNotNull, 1L).otherwise(0L)
          + when(col("purchase_ts").isNotNull, 1L).otherwise(0L)))
      .select("user_id", "view_ts", "click_ts", "purchase_ts", "stage")
      .orderBy("user_id")
  }

  val eventsFunnelSql: String =
    """WITH e AS (SELECT user_id, event_type,
      |    make_timestamp(epoch_ns(ts) // 1000) AS ets FROM events),
      |fv AS (SELECT user_id, min(ets) AS view_ts FROM e
      |  WHERE event_type = 'view' GROUP BY user_id),
      |fc AS (SELECT e.user_id, fv.view_ts, min(e.ets) AS click_ts
      |  FROM e JOIN fv ON e.user_id = fv.user_id
      |  WHERE e.event_type = 'click' AND e.ets > fv.view_ts
      |  GROUP BY e.user_id, fv.view_ts),
      |fp AS (SELECT e.user_id, fc.view_ts, fc.click_ts, min(e.ets) AS purchase_ts
      |  FROM e JOIN fc ON e.user_id = fc.user_id
      |  WHERE e.event_type = 'purchase' AND e.ets > fc.click_ts
      |  GROUP BY e.user_id, fc.view_ts, fc.click_ts)
      |SELECT fv.user_id, fv.view_ts, fc.click_ts, fp.purchase_ts,
      |  (1 + CASE WHEN fc.click_ts IS NULL THEN 0 ELSE 1 END
      |     + CASE WHEN fp.purchase_ts IS NULL THEN 0 ELSE 1 END)::BIGINT AS stage
      |FROM fv
      |LEFT JOIN fc ON fv.user_id = fc.user_id AND fv.view_ts = fc.view_ts
      |LEFT JOIN fp ON fc.user_id = fp.user_id AND fc.view_ts = fp.view_ts
      |  AND fc.click_ts = fp.click_ts
      |ORDER BY fv.user_id""".stripMargin

  /** Hourly-volume anomaly detection per event type: an hour is
    * anomalous when its count deviates from the type's mean by more
    * than 2σ — evaluated ENTIRELY in integers. With S = Σx, Q = Σx²
    * over n hourly counts, (x−μ)² > 4σ² ⟺ (n·x−S)² > 4·(n·Q−S²), so
    * the z-test needs no division, no sqrt, no floats — bit-identical
    * on any engine (a Welford stddev is summation-order-dependent and
    * can flip borderline hours between engines). Stats ride a
    * whole-partition window over the (tiny) per-type hourly counts.
    * The squared terms are carried as DECIMAL(38,0) — (n·x−S)² and S²
    * silently overflow a BIGINT once a type's total count passes ~3·10⁹
    * (ADVICE r5), flipping the predicate; 38 digits holds the squares
    * exactly to S ~ 10¹⁹ (the oracle mirrors with HUGEINT — both are
    * exact integer arithmetic, so borderline hours cannot diverge).
    * Past that ~10¹⁹ boundary the ENGINES diverge in failure mode
    * (ADVICE r6): non-ANSI Spark nulls the overflowed square — the row
    * silently drops from the output — while DuckDB's HUGEINT raises;
    * unreachable at realistic per-type hourly volumes, but flip
    * spark.sql.ansi.enabled on if counts could ever approach it so
    * both engines fail loudly. */
  def eventsAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val counts = table(spark, dir, "events")
      .groupBy(date_trunc("hour", tsMicros("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy("event_type")
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    counts
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("x")).over(w))
      .withColumn("q", sum(dec(col("x")) * col("x")).over(w))
      .filter((dec(col("n")) * col("x") - col("s")) * (dec(col("n")) * col("x") - col("s"))
        > lit(4L) * (dec(col("n")) * col("q") - dec(col("s")) * col("s")))
      .select("event_type", "hour", "x", "n", "s")
      .orderBy("event_type", "hour")
  }

  val eventsAnomalySql: String =
    """WITH c AS (SELECT date_trunc('hour', ts) AS hour, event_type,
      |    COUNT(*) AS x FROM events GROUP BY 1, 2),
      |st AS (SELECT event_type, hour, x,
      |    count(*) OVER w AS n, sum(x) OVER w AS s, sum(x::HUGEINT * x) OVER w AS q
      |  FROM c WINDOW w AS (PARTITION BY event_type))
      |SELECT event_type, hour, x, n::BIGINT AS n, s::BIGINT AS s
      |FROM st
      |WHERE (n::HUGEINT * x - s) * (n::HUGEINT * x - s) > 4 * (n::HUGEINT * q - s::HUGEINT * s)
      |ORDER BY event_type, hour""".stripMargin

  /** Weekly cohort retention: users grouped by first-activity week,
    * then distinct active users counted per (cohort, weeks-since) cell
    * — the product-analytics matrix behind every retention chart. The
    * cohort week is a window min over the same distinct-activity frame
    * (no self-join: a groupBy-then-join-back would let Catalyst drop
    * the shared distinct under the duplicate-agnostic min and scan the
    * table twice — plan-audited at ONE scan); offsets are exact
    * integer day-diffs ÷ 7. Week truncation is ISO-Monday on both
    * engines. */
  def eventsRetention(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .select(col("user_id"),
        to_date(date_trunc("week", tsMicros("ts"))).as("week"))
      .distinct()
      .withColumn("cohort_week",
        min(col("week")).over(Window.partitionBy("user_id")))
      .withColumn("weeks_since", (datediff(col("week"), col("cohort_week")) / 7)
        .cast("long"))
      .groupBy("cohort_week", "weeks_since")
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy("cohort_week", "weeks_since")

  val eventsRetentionSql: String =
    """WITH activity AS (SELECT DISTINCT user_id,
      |    CAST(date_trunc('week', ts) AS DATE) AS week FROM events),
      |w AS (SELECT user_id, week,
      |    min(week) OVER (PARTITION BY user_id) AS cohort_week FROM activity)
      |SELECT cohort_week, (date_diff('day', cohort_week, week) // 7)::BIGINT AS weeks_since,
      |  count(DISTINCT user_id) AS n_active
      |FROM w GROUP BY cohort_week, weeks_since
      |ORDER BY cohort_week, weeks_since""".stripMargin

  /** Scalar-function surface sweep (§2.7): one projection exercising
    * the string / date / math / conditional built-ins a reference user
    * leans on daily — every cell engine-portable (integer casts for
    * floor/ceil/round on positive values, regexes that always match,
    * `%` on positive integers). Narrow map-only stage; the whole row
    * set hash-compares, so each function's semantics are pinned. */
  def scalarFuncs(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        upper(col("o_orderstatus")).as("st_up"),
        lower(col("o_orderpriority")).as("pri_lo"),
        substring(col("o_orderpriority"), 1, 3).as("pri3"),
        length(col("o_orderpriority")).cast("long").as("pri_len"),
        regexp_replace(col("o_orderpriority"), "-", "_").as("pri_us"),
        lpad(col("o_orderkey").cast("string"), 12, "0").as("key_pad"),
        concat_ws(":", col("o_orderstatus"), col("o_orderpriority")).as("st_pri"),
        regexp_extract(col("o_orderpriority"), "^([0-9]+)", 1).as("pri_num"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        date_add(to_date(col("o_orderdate")), 7).as("d_plus7"),
        floor(col("o_totalprice")).cast("long").as("price_fl"),
        ceil(col("o_totalprice")).cast("long").as("price_ce"),
        round(col("o_totalprice")).cast("long").as("price_rd"),
        greatest(col("o_totalprice"), lit(1000.0)).as("price_hi"),
        least(col("o_custkey"), lit(100L)).as("cust_lo"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("st_nf"),
        (col("o_orderkey") % 7).as("key_mod"))
      .orderBy("o_orderkey")

  val scalarFuncsSql: String =
    """SELECT o_orderkey,
      |  upper(o_orderstatus) AS st_up,
      |  lower(o_orderpriority) AS pri_lo,
      |  substr(o_orderpriority, 1, 3) AS pri3,
      |  length(o_orderpriority)::BIGINT AS pri_len,
      |  replace(o_orderpriority, '-', '_') AS pri_us,
      |  lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS key_pad,
      |  concat_ws(':', o_orderstatus, o_orderpriority) AS st_pri,
      |  regexp_extract(o_orderpriority, '^([0-9]+)', 1) AS pri_num,
      |  year(o_orderdate)::BIGINT AS y,
      |  month(o_orderdate)::BIGINT AS m,
      |  day(o_orderdate)::BIGINT AS d,
      |  CAST(o_orderdate AS DATE) + 7 AS d_plus7,
      |  floor(o_totalprice)::BIGINT AS price_fl,
      |  ceil(o_totalprice)::BIGINT AS price_ce,
      |  round(o_totalprice)::BIGINT AS price_rd,
      |  greatest(o_totalprice, 1000.0) AS price_hi,
      |  least(o_custkey, 100) AS cust_lo,
      |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS st_nf,
      |  o_orderkey % 7 AS key_mod
      |FROM orders ORDER BY o_orderkey""".stripMargin

  val queries: Map[String, Q] = Map(
    "join_asof" -> asofLatestOrder,
    "join_range" -> rangeJoinEvents,
    "window_frames" -> windowFrames,
    "agg_cube" -> cubeOrders,
    "agg_pivot" -> pivotEvents,
    "set_except_all" -> setExceptAll,
    "set_intersect_all" -> setIntersectAll,
    "agg_q1_pricing" -> q1Pricing,
    "join_q3_top_orders" -> q3TopOrders,
    "join_q5_regional_revenue" -> q5RegionalRevenue,
    "window_top_per_customer" -> windowTopPerCustomer,
    "topk_orders" -> topKOrders,
    "agg_distinct" -> distinctAgg,
    "set_intersect" -> setIntersect,
    "set_except" -> setExcept,
    "agg_rollup" -> rollupCustomers,
    "events_tumbling_window" -> eventsTumbling,
    "events_session_window" -> eventsSessionWindow,
    "join_semi" -> semiJoin,
    "join_anti" -> antiJoin,
    "join_full_outer" -> fullOuterJoin,
    "agg_percentiles" -> aggPercentiles,
    "agg_grouping_sets" -> groupingSetsOrders,
    "join_correlated_subquery" -> correlatedSubquery,
    "window_lag_lead" -> windowLagLead,
    "events_hopping_window" -> eventsHoppingWindow,
    "events_funnel" -> eventsFunnel,
    "join_lateral" -> lateralTopOrders,
    "scalar_funcs" -> scalarFuncs,
    "events_retention" -> eventsRetention,
    "events_anomaly" -> eventsAnomaly,
    "agg_approx" -> aggApprox)

  val oracles: Map[String, String] = Map(
    "join_asof" -> asofLatestOrderSql,
    "join_range" -> rangeJoinEventsSql,
    "window_frames" -> windowFramesSql,
    "agg_cube" -> cubeOrdersSql,
    "agg_pivot" -> pivotEventsSql,
    "set_except_all" -> setExceptAllSql,
    "set_intersect_all" -> setIntersectAllSql,
    "agg_q1_pricing" -> q1PricingSql,
    "join_q3_top_orders" -> q3TopOrdersSql,
    "join_q5_regional_revenue" -> q5RegionalRevenueSql,
    "window_top_per_customer" -> windowTopPerCustomerSql,
    "topk_orders" -> topKOrdersSql,
    "agg_distinct" -> distinctAggSql,
    "set_except" -> setExceptSql,
    "set_intersect" -> setIntersectSql,
    "agg_rollup" -> rollupCustomersSql,
    "events_tumbling_window" -> eventsTumblingSql,
    "events_session_window" -> eventsSessionWindowSql,
    "join_semi" -> semiJoinSql,
    "join_anti" -> antiJoinSql,
    "join_full_outer" -> fullOuterJoinSql,
    "agg_percentiles" -> aggPercentilesSql,
    "agg_grouping_sets" -> groupingSetsOrdersSql,
    "join_correlated_subquery" -> correlatedSubquerySql,
    "window_lag_lead" -> windowLagLeadSql,
    "events_hopping_window" -> eventsHoppingWindowSql,
    "events_funnel" -> eventsFunnelSql,
    "join_lateral" -> lateralTopOrdersSql,
    "scalar_funcs" -> scalarFuncsSql,
    "events_retention" -> eventsRetentionSql,
    "events_anomaly" -> eventsAnomalySql,
    "agg_approx" -> aggApproxSql)
}
