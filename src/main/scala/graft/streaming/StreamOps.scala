package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Exact.{sumx, roundx}
import graft.sources.Tables

/** Streaming re-expression of fcd's collector watcher loop
  * (reference: src/collector/collector.ts:40 — a setInterval loop that
  * polls new blocks and upserts per-minute rollups).
  *
  * In Spark this is Structured Streaming: the same declarative
  * transform runs over a stream or a batch frame.  `tumblingAgg` is
  * that shared transform — Bench/Verify run it on the batch parquet
  * (DuckDB-oracled); the streaming spec drives it from a MemoryStream
  * with a watermark and checks incremental results match the batch run.
  *
  * Scale notes: stateful aggregation keyed by (window, event_type) —
  * state size is bounded by windows×denoms, and the 10-minute watermark
  * lets Spark evict closed windows, so state does not grow with the
  * 100 TB history.  shuffle partitions carry post-agg state updates.
  */
object StreamOps {

  /** Tumbling 1-hour window counts/sums per event_type.  Works on both
    * batch and streaming inputs (same plan either way). */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sumx(col("value")).as("total_value"))
      .select(unix_millis(col("w.start")).as("window_ms"), col("event_type"),
        col("n_events"), roundx(col("total_value"), 4).as("total_value"))

  /** Batch entry for Verify/Bench over the parquet events table. */
  def streamWindow(spark: SparkSession, dir: String): DataFrame =
    tumblingAgg(Tables(spark, dir).events)

  /** Streaming variant with watermarking, for a readStream source. */
  def streamingTumblingAgg(events: DataFrame): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sumx(col("value")).as("total_value"))
      .select(unix_millis(col("w.start")).as("window_ms"), col("event_type"),
        col("n_events"), roundx(col("total_value"), 4).as("total_value"))
}
