package graft.sources

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The shared tombstone mechanics of the doc-keyed retraction rung —
  * one implementation for every warehouse member that retracts by
  * key (MinHashWarehouse, Bm25Warehouse, RichlistWarehouse): an
  * append-only key set at `<path>.tomb`, probes anti-join it on the
  * hit/candidate set (O(hits), never O(index)), compact physically
  * prunes and clears it.
  *
  * Existence checks go through the Hadoop FileSystem API — NOT
  * java.nio — so the same code is correct on hdfs://
  * or object-store paths (the 100 TB claim), not just local temp
  * dirs.  The no-tomb fast path (the common case: no retraction ever
  * happened) returns the input frame untouched, keeping its exact
  * old plan. */
object Tombstones {

  def exists(spark: SparkSession, tombPath: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(tombPath)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Anti-join `rows` against the tombstoned key set: the tombstone
    * column (`tombCol`, the set's on-disk name) matches `rows`' `key`
    * column.  No-op when no tombstone set exists.  `tombFilter`
    * restricts which tombstones apply — the snapshot (as-of) probes
    * pass a generation cut here, so the time-filtered path shares
    * this one implementation instead of hand-rolling the anti-join. */
  def drop(spark: SparkSession, rows: DataFrame, tombPath: String,
      key: String, tombCol: String = "doc_id",
      tombFilter: DataFrame => DataFrame = identity): DataFrame =
    if (!exists(spark, tombPath)) rows
    else rows.join(
      tombFilter(spark.read.parquet(tombPath)).select(col(tombCol).as(key)),
      Seq(key), "left_anti")

  /** The frame-based twin of `drop` for members whose tombstone set
    * lives behind CommitLog (the committed read replaces the path
    * existence check): None = no tombstones ever — `rows` keeps its
    * exact old plan. */
  def dropDf(rows: DataFrame, tomb: Option[DataFrame], key: String,
      tombCol: String = "doc_id"): DataFrame =
    tomb match {
      case None => rows
      case Some(t) =>
        // no distinct: a left_anti join is insensitive to right-side
        // duplicates, so deduping here would only add a shuffle per
        // probe (callers that reuse a tomb frame may pre-pin it)
        rows.join(t.select(col(tombCol).as(key)), Seq(key), "left_anti")
    }

  /** The distinct tombstoned key set, pinned — compact's prune input. */
  def keys(spark: SparkSession, tombPath: String, tombCol: String = "doc_id"): DataFrame =
    spark.read.parquet(tombPath).select(col(tombCol)).distinct()
      .localCheckpoint()

  /** Delete the tombstone set — the end of a compact that physically
    * removed the tombstoned rows. */
  def clear(spark: SparkSession, tombPath: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(tombPath)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }
}
