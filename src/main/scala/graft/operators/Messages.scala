package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Exact.roundx
import graft.sources.Tables

/** Semi-structured tx-message surface — fcd's single most-used read
  * path: every tx list renders messages parsed out of the raw tx JSON
  * (reference: src/service/transaction/parseMsg.ts:271 — a per-msg-type
  * parser dispatch producing typed display fields), and the collector
  * fans every tx out into (account, tx) rows so per-account pages are
  * one indexed read (reference: src/collector/block/accountTx.ts:45
  * generateAccountTxs — extract every address mentioned in the msg
  * value, uniq, one AccountTxEntity per address).
  *
  * Spark-first shape: `from_json` projects the JSON `props` column into
  * typed columns INSIDE the scan stage (codegen'd, no UDF); the per-type
  * dispatch is a `when` chain (Catalyst folds it into one projection);
  * the fan-out is `explode(array_distinct(...))` — a narrow transform,
  * no shuffle anywhere in either plan.  At 100 TB both run as pure
  * map-side column work over the fact scan, which is exactly why fcd
  * materializes the same thing once at collect time.
  */
object Messages {

  /** Typed projection of the raw `props` JSON.  Pure transform — the
    * same plan runs over the batch parquet or a readStream frame (the
    * fcd collector runs this parse per incoming block). */
  def parsed(events: DataFrame): DataFrame =
    events.withColumn("p",
      from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")))

  /** Per-message typed parse + display-text dispatch
    * (parseMsg.ts:271: `types[type] || defaultParser`, with the
    * failure path prefixing "Failed to ").  One row per message with
    * the extracted typed fields — the page renderer's input.
    * Pure transform: batch and streaming share it. */
  def parseTransform(events: DataFrame): DataFrame = {
    val k = col("p.k").cast("long")
    parsed(events).select(
      col("event_id"),
      col("event_type").as("msg_type"),
      k.as("k"),
      when(col("event_type") === "signup",
        concat(lit("Registered account "), col("user_id").cast("string")))
        .when(col("event_type") === "purchase",
          concat(lit("Bought "), k.cast("string"), lit(" units")))
        .when(col("event_type") === "click",
          concat(lit("Swapped "), k.cast("string"), lit(" tokens")))
        .when(col("event_type") === "view",
          concat(lit("Queried contract "), k.cast("string")))
        .when(col("event_type") === "error",
          concat(lit("Failed to execute msg "), k.cast("string")))
        .otherwise(lit("Unknown msg"))
        .as("msg_text"),
      roundx(col("value"), 4).as("amount"))
  }

  def msgParse(spark: SparkSession, dir: String): DataFrame =
    parseTransform(Tables(spark, dir).events)

  /** account_tx fan-out: every account mentioned by a tx (here the
    * sender `user_id` plus the counterparty account carried in
    * `props.k`) gets its own (account, tx) row — the materialization
    * that makes per-account tx pages a keyed read instead of a scan
    * (accountTx.ts:45; fcd uniq's the address list and drops empties,
    * mirrored by array_distinct + the null filter).
    * Pure transform: batch and streaming share it. */
  def fanoutTransform(events: DataFrame): DataFrame =
    parsed(events)
      .select(col("event_id"),
        unix_millis(col("ts").cast("timestamp")).as("ts_ms"),
        explode(array_distinct(
          array(col("user_id"), col("p.k").cast("long")))).as("account"))
      .filter(col("account").isNotNull)
      .select(col("account"), col("event_id"), col("ts_ms"))

  def accountTxFanout(spark: SparkSession, dir: String): DataFrame =
    fanoutTransform(Tables(spark, dir).events)

  /** The read side the fan-out exists for: one account's recent txs as
    * a keyset page over the fan-out rows, joined back to the tx facts
    * (getTxList.ts:118 over the account_tx table).  The fan-out side
    * filters to ONE account before the join, so the join build side is
    * a page-bounded sliver. */
  def accountTxsPage(spark: SparkSession, dir: String, account: Long = 7L,
      beforeId: Long = 8000L, pageSize: Int = 20): DataFrame = {
    val t = Tables(spark, dir)
    val keys = accountTxFanout(spark, dir)
      .filter(col("account") === account && col("event_id") < beforeId)
      .orderBy(col("event_id").desc)
      .limit(pageSize)
    keys.join(t.events, Seq("event_id"))
      .select(col("account"), col("event_id"), col("ts_ms"),
        col("event_type"), roundx(col("value"), 4).as("amount"))
      .orderBy(col("event_id").desc)
  }
}
