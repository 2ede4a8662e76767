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
    // k is an ACCOUNT ID (it joins/unions with BIGINT user_id) — parse
    // it as BIGINT: an INT schema would silently null out ids beyond
    // 2^31 and drop their rows from the account fan-out
    events.withColumn("p",
      from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")))

  /** Per-message typed parse + display-text dispatch
    * (parseMsg.ts:271: `types[type] || defaultParser`, with the
    * failure path prefixing "Failed to ").  One row per message with
    * the extracted typed fields — the page renderer's input.
    * Pure transform: batch and streaming share it. */
  def parseTransform(events: DataFrame): DataFrame = {
    val k = col("p.k")
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
          array(col("user_id"), col("p.k")))).as("account"))
      .filter(col("account").isNotNull)
      .select(col("account"), col("event_id"), col("ts_ms"))

  def accountTxFanout(spark: SparkSession, dir: String): DataFrame =
    fanoutTransform(Tables(spark, dir).events)

  /** The fan-out materialized in the SAME 64-way hash-bucket layout the
    * streaming sink writes (graft.streaming.StreamOps.accountTxSink):
    * files partitioned by pmod(xxhash64(account), 64), so a keyed read
    * partition-prunes to 1/64 of the files.  Built once per process
    * (graft.sources.Materialized); this is the batch backfill of the
    * table the collector maintains incrementally. */
  def accountTxPath(spark: SparkSession, dir: String): String =
    graft.sources.Materialized.pathFor("account_tx", dir) { p =>
      fanoutTransform(Tables(spark, dir).events)
        .withColumn("account_bucket", pmod(xxhash64(col("account")), lit(64L)))
        .write.mode("overwrite").partitionBy("account_bucket").parquet(p)
    }

  /** The read side the fan-out exists for: one account's recent txs as
    * a keyset page, joined back to the tx facts (getTxList.ts:118 over
    * the account_tx table).  Serves from the MATERIALIZED hash-bucket
    * fan-out via the same keyed read as the streaming layout
    * (StreamOps.accountTxRead): bucket partition-pruning cuts the key
    * scan to 1/64 of the files (AccountTxPruningSpec asserts it), then
    * the page-bounded key sliver joins the fact table. */
  def accountTxsPage(spark: SparkSession, dir: String, account: Long = 7L,
      beforeId: Long = 8000L, pageSize: Int = 20): DataFrame = {
    val t = Tables(spark, dir)
    val keys = graft.streaming.StreamOps
      .accountTxRead(spark, accountTxPath(spark, dir), account)
      .filter(col("event_id") < beforeId)
      .orderBy(col("event_id").desc)
      .limit(pageSize)
    keys.join(t.events, Seq("event_id"))
      .select(col("account"), col("event_id"), col("ts_ms"),
        col("event_type"), roundx(col("value"), 4).as("amount"))
      .orderBy(col("event_id").desc)
  }
}
