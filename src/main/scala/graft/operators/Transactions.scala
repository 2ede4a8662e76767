package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Exact.roundx
import graft.sources.Tables

/** Transaction list / lookup queries (reference: src/service/transaction/).
  *
  * Scale notes: keyset pagination (`id < offset ORDER BY id DESC LIMIT n`)
  * keeps the scan bounded — with the filter pushed to parquet the scan
  * skips row groups via min/max stats, and the limit compiles to
  * TakeOrderedAndProject.  Point lookups push an equality predicate into
  * the scan (PushedFilters) — at 100 TB this is a partition-pruned read,
  * not a table scan.
  */
object Transactions {

  private def tsMs: org.apache.spark.sql.Column = unix_millis(col("ts").cast("timestamp"))

  /** Account tx page: keyset pagination, recent-first
    * (reference: src/service/transaction/getTxList.ts:118 getTxsByAccount —
    * WHERE account = ? AND id < offset ORDER BY id DESC LIMIT n). */
  def txsByAccountPage(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .filter(col("user_id") === 7 && col("event_id") < 800)
      .orderBy(col("event_id").desc)
      .limit(20)
      .select(col("event_id"), tsMs.as("ts_ms"), col("event_type"),
        roundx(col("value"), 4).as("amount"))

  /** All txs of one block, in block order
    * (reference: src/service/transaction/getTxList.ts:45 getTxsInBlock). */
  def txsByBlock(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .filter(col("l_orderkey") === 1)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), roundx(col("l_extendedprice"), 2).as("price"))
      .orderBy(col("l_linenumber"))

  /** Point lookup of one tx joined to its account
    * (reference: src/service/transaction/getTx.ts:8).  The single-row
    * filtered side is broadcast; no shuffle. */
  def txPointLookup(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val one = t.orders.filter(col("o_orderkey") === 1)
    broadcast(one).join(t.customer, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"),
        roundx(col("o_totalprice"), 2).as("o_totalprice"), col("c_name"),
        col("c_mktsegment"))
  }
}
