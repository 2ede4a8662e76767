package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders.
  *
  * Scale design: at 100 TB the fact tables (`lineitem`, `events`) are
  * date-partitioned parquet; we keep loaders as plain declarative
  * `spark.read.parquet` so Catalyst pushes filters/projections into the
  * scan (visible as PushedFilters / ReadSchema in explain) and prunes
  * partitions — no imperative pre-filtering here.
  *
  * Dimension tables (`region nation supplier part customer`) are small
  * relative to facts; query code wraps them in `broadcast()` at join
  * sites so fact tables never shuffle for dim joins.
  */
final class Tables(val spark: SparkSession, val dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = table("region")
  def nation: DataFrame = table("nation")
  def customer: DataFrame = table("customer")
  def supplier: DataFrame = table("supplier")
  def part: DataFrame = table("part")
  def orders: DataFrame = table("orders")
  def lineitem: DataFrame = table("lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS) — Spark has no ns type, so
    * sessions set spark.sql.legacy.parquet.nanosAsLong=true (see
    * graft.GraftSession) and the loader converts epoch-nanos → a µs
    * timestamp here (the data is µs-grained; `div` keeps it exact —
    * a double division would lose precision above 2^53 ns). */
  def events: DataFrame =
    table("events").withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")

  /** `events` with a `date` column — the per-day grain every dashboard
    * rollup groups on (fcd materializes the same grain into its
    * `dashboard` table, reference: src/collector/dashboard/collectDashboard.ts:23).
    */
  def eventsWithDate: DataFrame = events.withColumn("date", to_date(col("ts")))
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)
}
