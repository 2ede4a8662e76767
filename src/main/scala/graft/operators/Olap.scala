package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Exact.{sumx, avgx, roundx}
import graft.sources.Tables

/** Generic OLAP shapes — the building blocks every fcd query composes
  * from, kept as standalone benchmark headliners.
  *
  * Scale notes (100 TB / 1000 executors):
  *  - q1: single wide partial-aggregation; map-side combine means the
  *    shuffle carries only (flag,status) groups — bytes shuffled is
  *    O(groups × partitions), not O(rows).  Whole-stage codegen covers
  *    scan→project→partial_agg.
  *  - q3/q5: dims are broadcast, so the only shuffle is the final
  *    aggregation on the fact side; AQE re-plans skew at runtime.
  *  - as-of join: the price (build) side is tiny post-rollup, so we
  *    broadcast price *intervals* and range-join — the 100 TB fact side
  *    never shuffles or sorts.  (A global `last() over (order by ts)`
  *    window would be a single-partition sort — wrong at scale.)
  *  - sessionize: windows partitioned by user_id (high cardinality) —
  *    fully parallel, no global ordering anywhere.
  */
object Olap {

  /** TPC-H Q1 pricing summary — wide codegen'd aggregate.
    * fcd analogue: the per-denom tx-volume/fee rollups
    * (reference: src/collector/dashboard/txVolume.ts:21).
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("date"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        roundx(sumx(col("l_quantity")), 2).as("sum_qty"),
        roundx(sumx(col("l_extendedprice")), 2).as("sum_base_price"),
        roundx(sumx(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        roundx(sumx(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        roundx(avgx(col("l_quantity")), 4).as("avg_qty"),
        roundx(avgx(col("l_extendedprice")), 4).as("avg_price"),
        roundx(avgx(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** TPC-H Q3 shipping priority — size-guarded broadcast joins + top-k.
    * Top-k via orderBy+limit compiles to TakeOrderedAndProject: per-
    * partition heaps then a driver merge of k rows — never a full sort.
    *
    * The orders⋈customer build side is FILTERED FACT data — it grows
    * with history, so the broadcast is size-guarded: under the session
    * threshold it broadcasts (the plan you want at test scale), above
    * it the join runs shuffled on l_orderkey and AQE decides at runtime.
    */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val cust = t.customer.filter(col("c_mktsegment") === "BUILDING")
    val ord = t.orders.filter(col("o_orderdate") < lit("1998-03-15").cast("date"))
    val li = t.lineitem.filter(col("l_shipdate") > lit("1998-03-15").cast("date"))
    li.join(
        PlanHints.broadcastIfSmall(
          ord.join(PlanHints.broadcastIfSmall(cust), ord("o_custkey") === cust("c_custkey"))),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(roundx(sumx(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        to_date(col("o_orderdate")).as("o_orderdate"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 local supplier volume — 6-way join, all dims broadcast;
    * the only shuffle is the final groupBy(n_name).
    */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val reg = t.region.filter(col("r_name") === "ASIA")
    val nat = t.nation.join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
    val ord = t.orders.filter(col("o_orderdate") >= lit("1996-01-01").cast("date") &&
      col("o_orderdate") < lit("1999-01-01").cast("date"))
    t.lineitem
      .join(broadcast(t.supplier.join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(roundx(sumx(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
  }

  /** As-of join: each purchase event gets the latest 'click' price at or
    * before its timestamp (fcd joins rewards to the price effective at
    * that time, reference: src/collector/dashboard/blockReward.ts:19).
    * The plan/scale strategy (interval buckets, per-day leads, boundary
    * stitch, size-guarded broadcast) lives in the reusable
    * [[AsOf.joinLatest]] operator — this query is one instantiation. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // events are µs-grained, so epoch-µs comparisons are exactly the
    // raw-timestamp comparisons
    val tsUs = unix_micros(col("ts").cast("timestamp"))
    val ticks = t.events.filter(col("event_type") === "click")
      .select(tsUs.as("p_us"), col("event_id").as("p_event_id"), col("value").as("p_value"))
    val purchases = t.events.filter(col("event_type") === "purchase")
      .select(col("event_id"), tsUs.as("e_us"), col("value"))
    AsOf.joinLatest(purchases, "e_us", ticks, "p_us", "p_event_id")
      .select(col("event_id"), roundx(col("value"), 4).as("amount"),
        roundx(col("p_value"), 4).as("price_at_ts"))
  }

  /** Sessionization: a >30-min gap starts a new session (fcd's
    * account_tx activity grouping).  lag + running-sum of session-start
    * flags, windows partitioned by user_id — distributed by user, no
    * global sort.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val tsMs = unix_millis(col("ts").cast("timestamp"))
    t.events
      .withColumn("ts_ms", tsMs)
      .withColumn("prev_ms", lag(col("ts_ms"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > 1800000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(byUser))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_ms")).as("session_start_ms"),
        (max(col("ts_ms")) - min(col("ts_ms"))).as("duration_ms"))
      .select(col("user_id"), col("session_seq"), col("n_events"),
        col("session_start_ms"), col("duration_ms"))
  }

  /** Cohort retention matrix over purchase activity: users cohorted by
    * first-purchase day, a cell per (cohort, day offset) with the
    * distinct-active count and the retention rate vs cohort size — the
    * dashboard complement of q_account_growth (which counts arrivals;
    * this tracks whether they COME BACK).
    *
    * Scale shape: the fact scan collapses to distinct (user, day) rows
    * first (map-side combined — days/user is bounded, so this is the
    * only stage that sees raw events); first-seen and the activity join
    * are both user-keyed, so AQE reuses one exchange side; the cohort
    * matrix aggregate is calendar-bounded (cohorts × offsets), and the
    * cohort-size join broadcasts.  No count-distinct over raw events
    * anywhere — `p` is already distinct, so the matrix agg is count(1).
    */
  def retentionCohort(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val p = t.events.filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val f = p.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    val cells = p.join(f, Seq("user_id"))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("bigint").as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = f.groupBy(col("cohort_day")).agg(count(lit(1)).as("cohort_size"))
    cells.join(broadcast(sizes), Seq("cohort_day"))
      .select(col("cohort_day"), col("day_offset"), col("n_active"),
        col("cohort_size"),
        roundx(col("n_active").cast("double") / col("cohort_size"), 4)
          .as("retention"))
  }

  /** Windowed conversion funnel: first signup → first view within 6 h
    * of it → first purchase within 24 h of that view, reported as
    * per-step user counts with step-over-step and vs-first conversion
    * rates.  The time windows are the point (the unwindowed funnel is
    * degenerate — every active user eventually does everything); strict
    * `>` + `<=` bounds are exact µs-integer timestamp compares in both
    * engines.
    *
    * Scale shape: each step is a user-keyed min-aggregate joined to the
    * previous step's (user, t) frame — three user-keyed shuffles over
    * per-user-collapsed rows, never a window over raw events; the final
    * 3-row union + lag is metadata-scale.
    */
  def funnelSteps(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val ev = t.events.select(col("user_id"), col("event_type"), col("ts"))
    def firstAfter(step: String, prev: DataFrame, window: String): DataFrame =
      ev.filter(col("event_type") === step)
        .join(prev, Seq("user_id"))
        .filter(col("ts") > col("t") &&
          col("ts") <= col("t") + expr(s"INTERVAL $window"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
    val s2 = firstAfter("view", s1, "6 HOURS")
    val s3 = firstAfter("purchase", s2, "24 HOURS")
    def c(df: DataFrame, step: Long, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(step).as("step"), lit(name).as("event_type"), col("n_users"))
    val steps = c(s1, 1L, "signup").union(c(s2, 2L, "view"))
      .union(c(s3, 3L, "purchase"))
    val byStep = Window.orderBy(col("step")) // 3 rows — single partition is fine
    steps
      .withColumn("prev", lag(col("n_users"), 1).over(byStep))
      .withColumn("first", first(col("n_users")).over(byStep))
      .select(col("step"), col("event_type"), col("n_users"),
        roundx(col("n_users").cast("double") /
          coalesce(col("prev"), col("n_users")), 4).as("conv_from_prev"),
        roundx(col("n_users").cast("double") / col("first"), 4)
          .as("conv_from_first"))
  }
}
