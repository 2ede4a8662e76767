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
}
