package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Exact.{sumx, avgx, roundx}
import graft.sources.Tables

/** Market/price queries (reference: src/service/market/).
  * The 'click' event stream plays the price tick stream; other
  * event_types are other denoms.
  *
  * Scale notes: time-bucket keys are computed arithmetically from epoch
  * millis (codegen-friendly, no UDF), aggregation is partial map-side,
  * and "last 50 buckets" is TakeOrderedAndProject (per-partition heap +
  * driver merge of 50 rows) — not a global sort.
  */
object Market {

  private def tsMs: org.apache.spark.sql.Column = unix_millis(col("ts").cast("timestamp"))

  private def prices(t: Tables): DataFrame =
    t.events.filter(col("event_type") === "click")

  /** Hourly average price, most recent 50 buckets
    * (reference: src/service/market/getPrice.ts:26, hour interval). */
  def priceHourly(spark: SparkSession, dir: String): DataFrame =
    prices(Tables(spark, dir))
      .groupBy(((tsMs / 3600000L).cast("long") * 3600000L).as("hour_ms"))
      .agg(roundx(avgx(col("value")), 4).as("avg_price"))
      .orderBy(col("hour_ms").desc)
      .limit(50)

  /** 15-minute average price buckets
    * (reference: src/service/market/getPrice.ts:26, minute interval ×15). */
  def price15m(spark: SparkSession, dir: String): DataFrame =
    prices(Tables(spark, dir))
      .groupBy(((tsMs / 900000L).cast("long") * 900000L).as("bucket_ms"))
      .agg(roundx(avgx(col("value")), 4).as("avg_price"), count(lit(1)).as("n_ticks"))

  /** OHLC candles per (denom, day) — the standard exchange extension
    * of the reference's interval averages (getPrice.ts serves plain
    * avg buckets; candle consumers want open/high/low/close).
    *
    * Open/close use the argmin-by-(ts, event_id) struct trick:
    * min/max over struct(ts, event_id, value) orders lexicographically
    * on the unique (ts, event_id) prefix, so ONE partial-aggregated
    * groupBy produces all four prices — no window over the tick
    * stream, no first()/last() (whose result depends on partition
    * order), no self-join.
    *
    * Plan note: struct-typed min/max buffers aren't UnsafeRow-mutable,
    * so this compiles to a PARTIAL SortAggregate (map-side sort by
    * group key; only the per-(date, denom) rows cross the shuffle) —
    * the map-side sort vs hash probe is the price of exactness here.
    * The tempting fix, packing (ts_ms, event_id) into one long for a
    * hash-aggregable min, silently corrupts once ids exceed the packed
    * width — the same id-range hazard as props.k (Messages.scala). */
  def priceOhlc(spark: SparkSession, dir: String): DataFrame = {
    val tick = struct(col("ts"), col("event_id"), col("value"))
    Tables(spark, dir).events
      .groupBy(to_date(col("ts")).as("date"), col("event_type").as("denom"))
      .agg(
        roundx(min(tick).getField("value"), 4).as("open"),
        roundx(max(col("value")), 4).as("high"),
        roundx(min(col("value")), 4).as("low"),
        roundx(max(tick).getField("value"), 4).as("close"),
        count(lit(1)).as("n_ticks"))
  }

  /** One-day price variation: daily average with lag diff and rate
    * (reference: src/service/market/getPrice.ts:51 oneDayVariation). */
  def priceVariation(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val byDenom = Window.partitionBy(col("denom")).orderBy(col("date"))
    t.events
      .groupBy(to_date(col("ts")).as("date"), col("event_type").as("denom"))
      .agg(avgx(col("value")).as("avg_price"))
      .withColumn("prev_price", lag(col("avg_price"), 1).over(byDenom))
      .select(col("date"), col("denom"),
        roundx(col("avg_price"), 4).as("avg_price"),
        roundx(col("avg_price") - col("prev_price"), 4).as("diff"),
        roundx((col("avg_price") - col("prev_price")) / col("prev_price"), 6).as("rate"))
  }

  /** Cross-denom swap rate vs the base denom via self-join on date
    * (reference: src/service/market/getSwapRate.ts:14).  The base-denom
    * daily series is tiny → broadcast. */
  def swapRate(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val dailyAvg = t.events
      .groupBy(to_date(col("ts")).as("date"), col("event_type").as("denom"))
      .agg(avgx(col("value")).as("avg_price"))
    val base = dailyAvg.filter(col("denom") === "click")
      .select(col("date"), col("avg_price").as("base_price"))
    dailyAvg.filter(col("denom") =!= "click")
      .join(broadcast(base), Seq("date"))
      .select(col("date"), col("denom"),
        roundx(col("avg_price") / col("base_price"), 6).as("swap_rate"))
  }

  /** Market cap: daily issued supply × daily average price
    * (reference: src/service/dashboard/getMarketCap.ts + src/collector/block/network.ts). */
  def marketCap(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val supply = t.events.filter(col("event_type") === "signup")
      .groupBy(to_date(col("ts")).as("date"))
      .agg(sumx(col("value")).as("supply"))
    val price = t.events.filter(col("event_type") === "click")
      .groupBy(to_date(col("ts")).as("date"))
      .agg(avgx(col("value")).as("price"))
    supply.join(broadcast(price), Seq("date"))
      .select(col("date"), roundx(col("supply"), 4).as("supply"),
        roundx(col("price"), 4).as("price"),
        roundx(col("supply") * col("price"), 4).as("market_cap"))
  }
}
