package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Relational / analytic query surface.
  *
  * The reference (hansetag/iceberg-rest-server) delegates all relational
  * execution to Spark via the Iceberg connector — its integration suite
  * (tests/python/tests/test_spark.py) certifies scans, filters, joins,
  * aggregates and DML through the catalog. This module is the equivalent
  * declarative surface of our engine, expressed Spark-first so Catalyst
  * performs pushdown/pruning/join-selection. Each query has a DuckDB
  * oracle for the driver's sf0.01 hash-compare.
  *
  * Scale notes (100 TB design intent):
  *  - every query is a declarative plan: filters sit directly on the scan
  *    (parquet PushedFilters), projections prune columns at the reader;
  *  - only SIZE-CONSTANT dimensions (region: 5 rows, nation: 25 rows,
  *    single-row scalar aggregates) carry explicit broadcast hints; the
  *    SF-proportional relations (supplier, part, customer) are left to
  *    AQE's runtime size check, which broadcasts them at small sf and
  *    falls back to shuffle joins when they outgrow executor memory —
  *    a forced hint there would OOM the driver at 100×;
  *  - aggregates are partial (map-side combine) by construction;
  *  - no collect()s, no driver-side loops.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    load(s, dir, name)

  // ---------------------------------------------------------------- Q1
  /** TPC-H Q1 shape: full-scan aggregate with map-side combine. */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast(DoubleType).as("sum_disc_price"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
          * (lit(1) + dec(col("l_tax")))).cast(DoubleType).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      | CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      | COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- Q3
  /** TPC-H Q3 shape: broadcast dim filter, fact-side agg, top-N. */
  def q03ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = t(s, dir, "orders").filter(col("o_orderdate") < ts("1998-01-01 00:00:00"))
    val li = t(s, dir, "lineitem").filter(col("l_shipdate") > ts("1998-01-01 00:00:00"))
    // orders and customer are FACT-sized (1.5B / 150M rows at sf1000) —
    // no broadcast hints: these are shuffle joins on the join keys, and
    // AQE is free to auto-broadcast the filtered sides when they turn
    // out genuinely small at low sf.
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q03Sql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00' AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- Q4
  /** Semi join (EXISTS) — stays a broadcast/shuffled semi, no fact dup. */
  def q04OrderPriority(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
        col("o_orderdate") < ts("1996-07-01 00:00:00"))
    val li = t(s, dir, "lineitem").select(col("l_orderkey"))
    ord.join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q04Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- Q5
  /** Five-way star join; size-constant dims (nation/region) are
    * broadcast; supplier is SF-proportional so AQE decides its join
    * side at runtime; the fact–fact joins (orders, customer) shuffle
    * on their keys — at 100 TB neither fits in executor memory. AQE
    * still auto-broadcasts the small sides at small sf. */
  def q05LocalSupplierVolume(s: SparkSession, dir: String): DataFrame = {
    val asia = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val nat = t(s, dir, "nation")
    val cust = t(s, dir, "customer")
    val sup = t(s, dir, "supplier")
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
        col("o_orderdate") < ts("1997-01-01 00:00:00"))
    val li = t(s, dir, "lineitem")
    li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust,
        col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q05Sql: String =
    """SELECT n_name,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------- Q6
  /** Pure scan-filter-sum; filters must appear in PushedFilters. */
  def q06RevenueForecast(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1997-01-01 00:00:00") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast(DoubleType).as("revenue"))

  val q06Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------- Q10
  /** Returned-items report: fact-side filter, broadcast nation (true
    * dim) only; orders/customer join by shuffle (fact-sized at scale). */
  def q10ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-10-01 00:00:00") &&
        col("o_orderdate") < ts("1997-01-01 00:00:00"))
    val cust = t(s, dir, "customer")
    val nat = t(s, dir, "nation")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"), col("c_mktsegment"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10Sql: String =
    """SELECT c_custkey, c_name, c_acctbal, n_name, c_mktsegment,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, nation
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      |GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- Q14
  /** Conditional aggregate ratio (promo revenue share). */
  def q14PromoShare(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-09-01 00:00:00") &&
        col("l_shipdate") < ts("1996-10-01 00:00:00"))
    val part = t(s, dir, "part")
    val discPrice = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .agg(
        (sum(when(col("p_type") === "PROMO", discPrice).otherwise(lit(0)))
          .cast(DoubleType) * lit(100.0) /
          sum(discPrice).cast(DoubleType)).as("promo_revenue_pct"))
  }

  val q14Sql: String =
    """SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) ELSE 0 END) AS DOUBLE) * 100.0
      |     / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS promo_revenue_pct
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey
      |  AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00' AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin

  // ---------------------------------------------------------------- Q18
  /** Large-volume orders: aggregate-then-join (HAVING pushes the filter
    * onto the small aggregated side before the join). */
  def q18LargeOrders(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val big = li.groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 250)
    val ord = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    // `big` (HAVING-filtered aggregate) is the naturally small side;
    // customer is fact-sized at scale — no broadcast hint, AQE decides.
    big.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_orderdate"),
        dec(col("o_totalprice")).cast(DoubleType).as("o_totalprice"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
  }

  val q18Sql: String =
    """SELECT c_custkey, c_name, o_orderkey, o_orderdate,
      |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice, total_qty
      |FROM (SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |      FROM lineitem GROUP BY l_orderkey HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 250) big
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY total_qty DESC, o_orderkey""".stripMargin

  // ------------------------------------------------------- windows: top-N
  /** Top-3 customers per market segment — two-phase bounded top-K.
    *
    * NOT a `row_number().over(Window.partitionBy(c_mktsegment))`:
    * c_mktsegment has 5 values, so the window form sorts the entire
    * customer table in 5 tasks — a single task owns ~1/5 of the table
    * at any scale. The [[graft.functions.TopK]] aggregator instead keeps
    * a bounded K-row buffer per group inside a normal two-phase hash
    * aggregate: each input partition reduces to ≤3 rows per segment
    * map-side, only those survivors shuffle. */
  def qTop3PerSegment(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val rowSchema = StructType(Seq(
      StructField("ord", DoubleType, nullable = false),
      StructField("tie", LongType, nullable = false),
      StructField("c_name", StringType),
      StructField("c_acctbal", DoubleType)))
    t(s, dir, "customer")
      .groupBy(col("c_mktsegment"))
      .agg(graft.functions.TopK.topK(3, rowSchema)(
        col("c_acctbal"), col("c_custkey"), col("c_name"), col("c_acctbal")).as("top"))
      .select(col("c_mktsegment"), posexplode(col("top")))
      .select(col("c_mktsegment"), (col("pos") + 1).as("rank_in_segment"),
        col("col.tie").as("c_custkey"), col("col.c_name"), col("col.c_acctbal"))
      .orderBy(col("c_mktsegment"), col("rank_in_segment"))
  }

  val qTop3PerSegmentSql: String =
    """SELECT c_mktsegment, rank_in_segment, c_custkey, c_name, c_acctbal
      |FROM (SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
      |             ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rank_in_segment
      |      FROM customer)
      |WHERE rank_in_segment <= 3
      |ORDER BY c_mktsegment, rank_in_segment""".stripMargin

  // ------------------------------------------------ windows: running agg
  /** Per-customer running spend (frame window, deterministic order). */
  def qRunningSpend(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .filter(col("o_custkey") < 50)
      .withColumn("order_seq", row_number().over(w))
      .withColumn("running_spend",
        sum(dec(col("o_totalprice"))).over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast(DoubleType))
      .select(col("o_custkey"), col("order_seq"), col("o_orderkey"), col("o_orderdate"),
        col("running_spend"))
      .orderBy(col("o_custkey"), col("order_seq"))
  }

  val qRunningSpendSql: String =
    """SELECT o_custkey, order_seq, o_orderkey, o_orderdate, running_spend
      |FROM (SELECT o_custkey, o_orderkey, o_orderdate,
      |             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq,
      |             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      |      FROM orders WHERE o_custkey < 50)
      |ORDER BY o_custkey, order_seq""".stripMargin

  // ------------------------------------------------------------- set ops
  /** EXCEPT: building-segment customers that never placed a high-value
    * order. Set ops compile to distinct + anti/semi joins in Spark. */
  def qSetOps(s: SparkSession, dir: String): DataFrame = {
    val building = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val bigSpenders = t(s, dir, "orders")
      .filter(col("o_totalprice") > 300000).select(col("o_custkey").as("c_custkey"))
    building.except(bigSpenders).orderBy(col("c_custkey"))
  }

  val qSetOpsSql: String =
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |EXCEPT
      |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
      |ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------------------ anti join
  /** Customers with no high-value order (NOT EXISTS → left anti join). */
  def qCustomersWithoutOrders(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val ord = t(s, dir, "orders")
      .filter(col("o_totalprice") > 250000).select(col("o_custkey"))
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val qCustomersWithoutOrdersSql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 250000)
      |ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------------- distinct aggs
  /** COUNT(DISTINCT) per group (expand + two-phase agg in Spark). */
  def qDistinctCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        countDistinct(col("o_custkey")).as("distinct_customers"),
        countDistinct(col("o_orderpriority")).as("distinct_priorities"),
        count(lit(1)).as("order_count"))
      .orderBy(col("o_orderstatus"))

  val qDistinctCountsSql: String =
    """SELECT o_orderstatus,
      |       COUNT(DISTINCT o_custkey) AS distinct_customers,
      |       COUNT(DISTINCT o_orderpriority) AS distinct_priorities,
      |       COUNT(*) AS order_count
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  // ------------------------------------------------------------- rollup
  /** ROLLUP over status × priority (grouping sets). NULL ordering is
    * pinned NULLS FIRST on both sides. */
  def qRollupOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(dsum(col("o_totalprice")).as("total_price"), count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  val qRollupOrdersSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      |       COUNT(*) AS n_orders
      |FROM orders
      |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  // ------------------------------------------------------- events: hourly
  /** Time-bucketed aggregate over the event stream table (the batch
    * equivalent of a tumbling-window streaming agg). */
  def qEventsHourly(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"), 28, 12)).cast(DoubleType).as("total_value"),
        countDistinct(col("user_id")).as("distinct_users"))
      .filter(col("n_events") > 1)
      .orderBy(col("hour"), col("event_type"))

  val qEventsHourlySql: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      |       COUNT(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(28,12))) AS DOUBLE) AS total_value,
      |       COUNT(DISTINCT user_id) AS distinct_users
      |FROM events
      |GROUP BY 1, 2
      |HAVING COUNT(*) > 1
      |ORDER BY 1, 2""".stripMargin

  // --------------------------------------------------- events: sessions
  /** Sessionization via lag(): a session starts after a >30 min gap.
    * Pure window algebra — the streaming twin uses mapGroupsWithState. */
  def qEventSessions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("is_session_start",
        (col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES")).cast("int"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("is_session_start")).as("n_sessions"))
      .filter(col("n_events") >= 20)
      .orderBy(col("user_id"))
  }

  val qEventSessionsSql: String =
    """SELECT user_id, COUNT(*) AS n_events, CAST(SUM(is_session_start) AS BIGINT) AS n_sessions
      |FROM (SELECT user_id,
      |             CAST((prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE) AS INT) AS is_session_start
      |      FROM (SELECT user_id, ts, event_id,
      |                   LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |            FROM events))
      |GROUP BY user_id
      |HAVING COUNT(*) >= 20
      |ORDER BY user_id""".stripMargin

  // ------------------------------------------- events: gap percentiles
  /** Exact inter-event gap percentiles per event type (p50/p95 of the
    * seconds between a user's consecutive events of that type) — the
    * latency/cadence profile behind rate-limit tuning and
    * session-timeout selection.
    *
    * Scale: the gap derivation windows BY (user, type) — keyed, single
    * lag row of state. The percentile is the HISTOGRAM method (the
    * same shape as the CCNet quality-quantile filter): gaps quantize
    * to whole seconds, ONE keyed count builds the per-type histogram,
    * and the cumulative window runs over BUCKETS — bounded by the time
    * horizon in seconds, never by event count — so no gap population
    * is ever sorted. Discrete quantiles over integer buckets are
    * integer-exact cross-engine. */
  def qEventGapQuantiles(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val gaps = t(s, dir, "events")
      .withColumn("prev_us", lag(expr("unix_micros(ts)"), 1).over(w))
      .filter(col("prev_us").isNotNull)
      .selectExpr("event_type",
        "cast(floor((unix_micros(ts) - prev_us) / 1000000) as bigint) as gap_s")
    val hist = gaps.groupBy(col("event_type"), col("gap_s"))
      .agg(count(lit(1)).as("cnt"))
    val cumW = Window.partitionBy(col("event_type")).orderBy(col("gap_s"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(cumW))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("event_type"))))
    // both quantiles in ONE conditional aggregate (r19): the old
    // per-quantile pick-filter-join evaluated the histogram + both
    // windows twice and paid a join — min-over-threshold per quantile
    // is the same cumulative walk read twice, so one pass computes both
    cum.groupBy(col("event_type"))
      .agg(
        max(col("n")).as("n_gaps"),
        min(expr("case when cum >= ceil(0.5 * n) then gap_s end")).as("p50_gap_s"),
        min(expr("case when cum >= ceil(0.95 * n) then gap_s end")).as("p95_gap_s"))
      .selectExpr("event_type", "n_gaps", "p50_gap_s", "p95_gap_s")
      .orderBy(col("event_type"))
  }

  val qEventGapQuantilesSql: String =
    """WITH gaps AS (
      |  SELECT event_type,
      |         CAST(floor((epoch_us(ts) - prev_us) / 1000000) AS BIGINT) AS gap_s
      |  FROM (SELECT event_type, ts,
      |               LAG(epoch_us(ts), 1) OVER (
      |                 PARTITION BY user_id, event_type ORDER BY ts, event_id) AS prev_us
      |        FROM events)
      |  WHERE prev_us IS NOT NULL),
      |hist AS (SELECT event_type, gap_s, COUNT(*) AS cnt FROM gaps GROUP BY 1, 2),
      |cum AS (
      |  SELECT event_type, gap_s, cnt,
      |         SUM(cnt) OVER (PARTITION BY event_type ORDER BY gap_s) AS cum,
      |         SUM(cnt) OVER (PARTITION BY event_type) AS n
      |  FROM hist),
      |p50 AS (SELECT event_type, MIN(gap_s) AS p50_gap_s, MAX(n) AS n_gaps
      |        FROM cum WHERE cum >= ceil(0.5 * n) GROUP BY event_type),
      |p95 AS (SELECT event_type, MIN(gap_s) AS p95_gap_s
      |        FROM cum WHERE cum >= ceil(0.95 * n) GROUP BY event_type)
      |SELECT event_type, CAST(n_gaps AS BIGINT) AS n_gaps, p50_gap_s, p95_gap_s
      |FROM p50 JOIN p95 USING (event_type)
      |ORDER BY event_type""".stripMargin

  // ------------------------------------------------ events: transitions
  /** First-order Markov transition matrix over each user's event
    * sequence: for every (from, to) event-type pair, the transition
    * count and the conditional probability P(to | from). The standard
    * user-journey summary (and the generator model behind synthetic
    * session replay).
    *
    * Scale: the sequence window partitions BY USER — one keyed
    * exchange, per-user state is a single lag row; the pair aggregate
    * map-side combines to |event_types|² rows, and the per-from
    * normalization windows over THAT aggregate (≤ |event_types|²
    * rows — never a global window over raw events). Counts are exact
    * integers; the probability is one integer-ratio division, so both
    * engines compute the identical double. */
  def qEventTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val byFrom = Window.partitionBy(col("from_event"))
    t(s, dir, "events")
      .withColumn("to_event", lead(col("event_type"), 1).over(w))
      .filter(col("to_event").isNotNull)
      .select(col("event_type").as("from_event"), col("to_event"))
      .groupBy(col("from_event"), col("to_event"))
      .agg(count(lit(1)).as("n_transitions"))
      .withColumn("p_transition",
        col("n_transitions").cast(DoubleType) /
          sum(col("n_transitions")).over(byFrom).cast(DoubleType))
      .orderBy(col("from_event"), col("to_event"))
  }

  val qEventTransitionsSql: String =
    """WITH seq AS (
      |  SELECT event_type AS from_event,
      |         LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_event
      |  FROM events),
      |pairs AS (
      |  SELECT from_event, to_event, COUNT(*) AS n_transitions
      |  FROM seq WHERE to_event IS NOT NULL
      |  GROUP BY from_event, to_event)
      |SELECT from_event, to_event, n_transitions,
      |       CAST(n_transitions AS DOUBLE) /
      |         CAST(SUM(n_transitions) OVER (PARTITION BY from_event) AS DOUBLE) AS p_transition
      |FROM pairs
      |ORDER BY from_event, to_event""".stripMargin

  // ------------------------------------------------------ events: paths
  /** Top-10 three-step event paths (trigram sequences within a user's
    * stream) by frequency — the path-analysis view funnels don't give:
    * funnels fix the steps and count users; this finds WHICH step
    * sequences dominate.
    *
    * Scale: same per-user window exchange as the transition matrix
    * (two lag-family columns instead of one — identical shuffle), then
    * a map-side-combinable count over ≤ |event_types|³ path keys and a
    * bounded TakeOrdered(10) — no global row sort at any scale. */
  def qEventPaths(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("path"))
      .limit(10)
  }

  val qEventPathsSql: String =
    """WITH seq AS (
      |  SELECT event_type AS e1,
      |         LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
      |         LEAD(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
      |  FROM events)
      |SELECT e1 || '>' || e2 || '>' || e3 AS path, COUNT(*) AS n_occurrences
      |FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
      |GROUP BY 1
      |ORDER BY n_occurrences DESC, path
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------- events: regex k
  /** Extract a numeric field from the JSON-ish props payload with a
    * regex (codegen'd, no UDF) and aggregate it. */
  def qEventsPropsExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k", regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  val qEventsPropsExtractSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |       CAST(SUM(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
      |       MAX(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)) AS max_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- Q7
  /** TPC-H Q7 shape: nation-pair trade volume by year. The two nation
    * copies broadcast (true dims); supplier joins by AQE's choice;
    * lineitem–orders–customer shuffle on keys. */
  def q07VolumeShipping(s: SparkSession, dir: String): DataFrame = {
    val n1 = t(s, dir, "nation").selectExpr("n_nationkey as s_nk", "n_name as supp_nation")
    val n2 = t(s, dir, "nation").selectExpr("n_nationkey as c_nk", "n_name as cust_nation")
    t(s, dir, "lineitem")
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(
        (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q07Sql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |       CAST(year(l_shipdate) AS INT) AS l_year,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
      |GROUP BY 1, 2, 3
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // ---------------------------------------------------------------- Q8
  /** TPC-H Q8 shape: a nation's market share inside a region per year —
    * conditional aggregation over a 6-way join; constant dims broadcast,
    * supplier/part sized by AQE. */
  def q08MarketShare(s: SparkSession, dir: String): DataFrame = {
    val suppNation = t(s, dir, "nation")
      .selectExpr("n_nationkey as s_nk", "n_name as supp_nation")
    val custNation = t(s, dir, "nation")
      .selectExpr("n_nationkey as c_nk", "n_regionkey as c_rk")
    val regions = t(s, dir, "region").filter(col("r_name") === "EUROPE")
    val parts = t(s, dir, "part").filter(col("p_type") === "PROMO")
    val vol = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
    t(s, dir, "lineitem")
      .join(parts, col("l_partkey") === col("p_partkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("s_nk"))
      .join(broadcast(custNation), col("c_nationkey") === col("c_nk"))
      .join(broadcast(regions), col("c_rk") === col("r_regionkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg((sum(when(col("supp_nation") === "NATION_3", vol).otherwise(dec(lit(0))))
        .cast(DoubleType) /
        sum(vol).cast(DoubleType)).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  val q08Sql: String =
    """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      |  CAST(SUM(CASE WHEN n1.n_name = 'NATION_3'
      |        THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
      |  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS mkt_share
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |JOIN region ON n2.n_regionkey = r_regionkey AND r_name = 'EUROPE'
      |GROUP BY 1
      |ORDER BY o_year""".stripMargin

  // ---------------------------------------------------------------- Q9
  /** TPC-H Q9 shape (adapted: no partsupp table, so profit = revenue on
    * the name-matched parts): per supplier-nation per year. */
  def q09ProductProfit(s: SparkSession, dir: String): DataFrame = {
    val parts = t(s, dir, "part").filter(col("p_name").contains("widget"))
    t(s, dir, "lineitem")
      .join(parts, col("l_partkey") === col("p_partkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast(DoubleType).as("profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q09Sql: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1, 2
      |ORDER BY nation, o_year DESC""".stripMargin

  // --------------------------------------------------------------- Q13
  /** TPC-H Q13 shape: customer order-count distribution via LEFT OUTER
    * join (customers with zero orders included) + re-aggregation. */
  def q13CustomerDistribution(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  val q13Sql: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |      GROUP BY c_custkey) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // --------------------------------------------------------------- Q19
  /** TPC-H Q19 shape: disjunctive brand/size/quantity predicates pushed
    * into one joined scan (no union of three scans); AQE picks the part
    * join strategy by its runtime size. */
  def q19DiscountedRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val p = t(s, dir, "part")
    li.join(p, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
            col("l_quantity").between(20, 30)))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast(DoubleType).as("revenue"))

  }

  val q19Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  // --------------------------------------------------------------- Q15
  /** TPC-H Q15 shape: windowed revenue per supplier, keep the max. The
    * scalar max rides back as a broadcast (one row), so the fact scan
    * happens once and nothing shuffles twice. */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val revenue = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-04-01")
      .groupBy(col("l_suppkey"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast(DoubleType).as("total_revenue"))
    val top = revenue.agg(max(col("total_revenue")).as("max_revenue"))
    revenue
      .crossJoin(broadcast(top))
      .filter(col("total_revenue") === col("max_revenue"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q15Sql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey,
      |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  // --------------------------------------------------------------- Q12
  /** TPC-H Q12 shape (adapted — the dataset has no l_shipmode or
    * commit/receipt dates): conditional aggregation over the
    * lineitem⋈orders join, classing LATE shipments (> 30 days after
    * the order date) by line status and counting critical vs other
    * order priorities inside the aggregate. */
  def q12LatePriority(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT" ||
          col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority") =!= "1-URGENT" &&
          col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L)).as("low_line_count"))
      .orderBy(col("l_linestatus"))

  val q12Sql: String =
    """SELECT l_linestatus,
      |       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |       CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  // --------------------------------------------------------------- Q17
  /** TPC-H Q17 shape: correlated per-part average (decorrelated into a
    * keyed aggregate + equi-join) gating a revenue sum. Parts filtered
    * to one brand, avg over that part's lineitems, keep rows below
    * half the average quantity. */
  def q17SmallQuantityRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val brandParts =
      t(s, dir, "part").filter(col("p_brand") === "Brand#4").select("p_partkey")
    val branded = li.join(brandParts, col("l_partkey") === col("p_partkey"))
    val avgQty = branded.groupBy(col("l_partkey").as("avg_partkey"))
      .agg(davg(col("l_quantity")).as("avg_qty"))
    branded
      .join(avgQty, col("l_partkey") === col("avg_partkey"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg((sum(dec(col("l_extendedprice"))).cast(DoubleType) / lit(7.0)).as("avg_yearly"))
  }

  val q17Sql: String =
    """WITH branded AS (
      |  SELECT l_partkey, l_quantity, l_extendedprice
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand = 'Brand#4'),
      |avgq AS (
      |  SELECT l_partkey AS avg_partkey,
      |         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS DOUBLE) AS avg_qty
      |  FROM branded GROUP BY l_partkey)
      |SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
      |FROM branded JOIN avgq ON l_partkey = avg_partkey
      |WHERE l_quantity < 0.5 * avg_qty""".stripMargin

  // --------------------------------------------------------------- Q21
  /** TPC-H Q21 shape (adapted — lateness derived from ship vs order
    * date): suppliers who were the ONLY late shipper in a
    * multi-supplier order. EXISTS → left-semi join, NOT EXISTS →
    * left-anti join, both keyed on the order — no correlated per-row
    * subquery execution at scale. */
  def q21LateSoleSupplier(s: SparkSession, dir: String): DataFrame = {
    // decorrelated to ONE lineitem pass: per (order, supplier) count
    // late lines; per order derive supplier count, late-supplier count,
    // and the lone late supplier — the EXISTS/NOT-EXISTS become two
    // keyed aggregations instead of three fact-table joins
    val perSupp = t(s, dir, "lineitem")
      .join(t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(sum(when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), 1L)
        .otherwise(0L)).as("late_cnt"))
    val perOrder = perSupp.groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_supp"),
        sum(when(col("late_cnt") > 0, 1L).otherwise(0L)).as("n_late_supp"),
        max(when(col("late_cnt") > 0, col("l_suppkey"))).as("lone_supp"),
        max(when(col("late_cnt") > 0, col("late_cnt"))).as("lone_late_cnt"))
    perOrder
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
      .join(t(s, dir, "supplier"), col("lone_supp") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(sum(col("lone_late_cnt")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  val q21Sql: String =
    """WITH li AS (
      |  SELECT l_orderkey, l_suppkey, o_orderstatus,
      |         l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      |SELECT s_name, COUNT(*) AS numwait
      |FROM li l1 JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE l1.late AND l1.o_orderstatus = 'F'
      |  AND EXISTS (SELECT 1 FROM li l2
      |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM li l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name""".stripMargin

  // --------------------------------------------------------------- Q22
  /** TPC-H Q22 shape (adapted — no phone column, nation stands in for
    * the country code): wealthy-but-idle customers. A scalar average
    * over positive balances (broadcast single row) gates the customer
    * scan; orders are excluded with a left-anti join. */
  def q22IdleCustomers(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val avgBal = cust.filter(col("c_acctbal") > 0.0)
      .agg(davg(col("c_acctbal")).as("avg_bal"))
    cust
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(t(s, dir, "orders").select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("n_name"))
  }

  val q22Sql: String =
    """WITH avg_bal AS (
      |  SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal) AS DOUBLE) AS avg_bal
      |  FROM customer WHERE c_acctbal > 0.0)
      |SELECT n_name, COUNT(*) AS numcust,
      |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer, avg_bal, nation
      |WHERE c_acctbal > avg_bal
      |  AND c_nationkey = n_nationkey
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  // ----------------------------------------------------------- registry
  // ----------------------------------------------------- events: funnel
  /** Ordered conversion funnel view → click → purchase: per user, the
    * earliest view, the earliest click strictly AFTER it, the
    * earliest purchase strictly after that — the product-analytics
    * staple. Expressed as STEPWISE keyed min-aggregations (each stage
    * filters one event type, joins the previous stage's anchor, takes
    * a keyed min) — never a per-user event sort: at 100 TB the
    * per-stage frames are O(users), the joins are keyed (and the
    * stage frames broadcast when users ≪ events), and hot users cost
    * one combiner cell per stage instead of a buffered timeline.
    * Times surface as epoch micros (the cross-engine-stable form). */
  def qEventFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === lit("view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val c = ev.filter(col("event_type") === lit("click"))
      .join(v, "user_id").where(col("ts") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val p = ev.filter(col("event_type") === lit("purchase"))
      .join(c, "user_id").where(col("ts") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .selectExpr("user_id",
        "cast(cast(t_click is not null as int) + cast(t_purchase is not null as int) + 1 as int) as stage",
        "unix_micros(t_view) as t_view_us",
        "unix_micros(t_click) as t_click_us",
        "unix_micros(t_purchase) as t_purchase_us")
      .orderBy("user_id")
  }

  val qEventFunnelSql: String =
    """WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
      |           WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, MIN(e.ts) AS t_click
      |      FROM events e JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.ts > v.t_view
      |      GROUP BY e.user_id),
      |p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
      |      FROM events e JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      |      GROUP BY e.user_id)
      |SELECT v.user_id,
      |       CAST((c.t_click IS NOT NULL)::INT + (p.t_purchase IS NOT NULL)::INT + 1 AS INT) AS stage,
      |       epoch_us(v.t_view) AS t_view_us,
      |       epoch_us(c.t_click) AS t_click_us,
      |       epoch_us(p.t_purchase) AS t_purchase_us
      |FROM v LEFT JOIN c ON v.user_id = c.user_id
      |       LEFT JOIN p ON v.user_id = p.user_id
      |ORDER BY v.user_id""".stripMargin

  /** [[qEventFunnel]] with per-stage DEADLINES — the form product
    * analytics actually ships ("converted within 7 days"): the click
    * must land within [[FunnelWindowDays]] days of the anchoring view,
    * the purchase within the same window of that click. Same stepwise
    * keyed-min shape (the window bound is one more conjunct on each
    * stage's join), so the scale story is unchanged — and a user who
    * clicked only AFTER the window shows as stage 1, not stage 2. */
  private val FunnelWindowDays = 7

  def qEventFunnelWindowed(s: SparkSession, dir: String): DataFrame = {
    val iv = s"INTERVAL $FunnelWindowDays DAYS"
    val ev = t(s, dir, "events").select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === lit("view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val c = ev.filter(col("event_type") === lit("click"))
      .join(v, "user_id")
      .where(col("ts") > col("t_view") && col("ts") <= expr(s"t_view + $iv"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val p = ev.filter(col("event_type") === lit("purchase"))
      .join(c, "user_id")
      .where(col("ts") > col("t_click") && col("ts") <= expr(s"t_click + $iv"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .selectExpr("user_id",
        "cast(cast(t_click is not null as int) + cast(t_purchase is not null as int) + 1 as int) as stage",
        "unix_micros(t_view) as t_view_us",
        "unix_micros(t_click) as t_click_us",
        "unix_micros(t_purchase) as t_purchase_us")
      .orderBy("user_id")
  }

  val qEventFunnelWindowedSql: String =
    s"""WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
       |           WHERE event_type = 'view' GROUP BY user_id),
       |c AS (SELECT e.user_id, MIN(e.ts) AS t_click
       |      FROM events e JOIN v ON e.user_id = v.user_id
       |      WHERE e.event_type = 'click' AND e.ts > v.t_view
       |        AND e.ts <= v.t_view + INTERVAL $FunnelWindowDays DAYS
       |      GROUP BY e.user_id),
       |p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
       |      FROM events e JOIN c ON e.user_id = c.user_id
       |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
       |        AND e.ts <= c.t_click + INTERVAL $FunnelWindowDays DAYS
       |      GROUP BY e.user_id)
       |SELECT v.user_id,
       |       CAST((c.t_click IS NOT NULL)::INT + (p.t_purchase IS NOT NULL)::INT + 1 AS INT) AS stage,
       |       epoch_us(v.t_view) AS t_view_us,
       |       epoch_us(c.t_click) AS t_click_us,
       |       epoch_us(p.t_purchase) AS t_purchase_us
       |FROM v LEFT JOIN c ON v.user_id = c.user_id
       |       LEFT JOIN p ON v.user_id = p.user_id
       |ORDER BY v.user_id""".stripMargin

  // -------------------------------------------------- events: retention
  /** Weekly cohort retention: users grouped by their FIRST active week
    * (Monday-truncated, UTC — pinned by the session conf), counted in
    * each later week they reappear. Two keyed aggregations plus one
    * keyed join over the O(users × weeks) distinct-activity frame —
    * the raw event stream collapses map-side before anything joins. */
  def qEventRetention(s: SparkSession, dir: String): DataFrame = {
    val act = t(s, dir, "events")
      .selectExpr("user_id", "cast(date_trunc('week', ts) as date) as wk")
      .distinct()
    val cohort = act.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    act.join(cohort, "user_id")
      // ISO string on the wire: the gate's value comparison is
      // type-exact and date surfaces differ between engines
      .selectExpr("cast(cohort_wk as string) as cohort_wk",
        "cast(datediff(wk, cohort_wk) div 7 as int) as weeks_since", "user_id")
      .groupBy(col("cohort_wk"), col("weeks_since"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_wk"), col("weeks_since"))
  }

  val qEventRetentionSql: String =
    """WITH act AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      |  FROM events),
      |cohort AS (SELECT user_id, MIN(wk) AS cohort_wk FROM act GROUP BY user_id)
      |SELECT CAST(c.cohort_wk AS VARCHAR) AS cohort_wk,
      |       CAST((a.wk - c.cohort_wk) // 7 AS INT) AS weeks_since,
      |       COUNT(DISTINCT a.user_id) AS n_users
      |FROM act a JOIN cohort c ON a.user_id = c.user_id
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_event_funnel" -> (qEventFunnel _),
    "q_event_funnel_windowed" -> (qEventFunnelWindowed _),
    "q_event_retention" -> (qEventRetention _),
    "q12_late_priority" -> (q12LatePriority _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q17_small_quantity_revenue" -> (q17SmallQuantityRevenue _),
    "q21_late_sole_supplier" -> (q21LateSoleSupplier _),
    "q22_idle_customers" -> (q22IdleCustomers _),
    "q07_volume_shipping" -> (q07VolumeShipping _),
    "q08_market_share" -> (q08MarketShare _),
    "q09_product_profit" -> (q09ProductProfit _),
    "q13_customer_distribution" -> (q13CustomerDistribution _),
    "q19_discounted_revenue" -> (q19DiscountedRevenue _),
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q03_shipping_priority" -> (q03ShippingPriority _),
    "q04_order_priority" -> (q04OrderPriority _),
    "q05_local_supplier_volume" -> (q05LocalSupplierVolume _),
    "q06_revenue_forecast" -> (q06RevenueForecast _),
    "q10_returned_items" -> (q10ReturnedItems _),
    "q14_promo_share" -> (q14PromoShare _),
    "q18_large_orders" -> (q18LargeOrders _),
    "q_top3_per_segment" -> (qTop3PerSegment _),
    "q_running_spend" -> (qRunningSpend _),
    "q_setops_except" -> (qSetOps _),
    "q_customers_without_orders" -> (qCustomersWithoutOrders _),
    "q_distinct_counts" -> (qDistinctCounts _),
    "q_rollup_orders" -> (qRollupOrders _),
    "q_events_hourly" -> (qEventsHourly _),
    "q_event_sessions" -> (qEventSessions _),
    "q_event_gap_quantiles" -> (qEventGapQuantiles _),
    "q_event_transitions" -> (qEventTransitions _),
    "q_event_paths" -> (qEventPaths _),
    "q_events_props_extract" -> (qEventsPropsExtract _))

  val oracleSql: Map[String, String] = Map(
    "q_event_funnel" -> qEventFunnelSql,
    "q_event_funnel_windowed" -> qEventFunnelWindowedSql,
    "q_event_retention" -> qEventRetentionSql,
    "q12_late_priority" -> q12Sql,
    "q15_top_supplier" -> q15Sql,
    "q17_small_quantity_revenue" -> q17Sql,
    "q21_late_sole_supplier" -> q21Sql,
    "q22_idle_customers" -> q22Sql,
    "q07_volume_shipping" -> q07Sql,
    "q08_market_share" -> q08Sql,
    "q09_product_profit" -> q09Sql,
    "q13_customer_distribution" -> q13Sql,
    "q19_discounted_revenue" -> q19Sql,
    "q01_pricing_summary" -> q01Sql,
    "q03_shipping_priority" -> q03Sql,
    "q04_order_priority" -> q04Sql,
    "q05_local_supplier_volume" -> q05Sql,
    "q06_revenue_forecast" -> q06Sql,
    "q10_returned_items" -> q10Sql,
    "q14_promo_share" -> q14Sql,
    "q18_large_orders" -> q18Sql,
    "q_top3_per_segment" -> qTop3PerSegmentSql,
    "q_running_spend" -> qRunningSpendSql,
    "q_setops_except" -> qSetOpsSql,
    "q_customers_without_orders" -> qCustomersWithoutOrdersSql,
    "q_distinct_counts" -> qDistinctCountsSql,
    "q_rollup_orders" -> qRollupOrdersSql,
    "q_events_hourly" -> qEventsHourlySql,
    "q_event_sessions" -> qEventSessionsSql,
    "q_event_gap_quantiles" -> qEventGapQuantilesSql,
    "q_event_transitions" -> qEventTransitionsSql,
    "q_event_paths" -> qEventPathsSql,
    "q_events_props_extract" -> qEventsPropsExtractSql)
}
