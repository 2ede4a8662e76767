package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The training set AT REST — the last mile a real pipeline runs
  * nightly: corpus funnel (keep gates) ∧ context chunking ∧ shard
  * layout, materialized as shard-partitioned parquet that training
  * readers consume directly.  The IvfWarehouse pattern applied to
  * text: assignment happens once at write time, and a reader of one
  * shard plans a partition-pruned scan of 1/shards of the files
  * (TrainWarehouseSpec asserts the pruning via location.listFiles).
  *
  * Scale notes: the write is the funnel's one corpus scan + the
  * chunk explode (narrow) + one bounded-key shuffle for the shard
  * ordinal window (partitioned BY SHARD — never a global
  * row_number); `partitionBy("shard")` keeps leaf files large
  * because the shard count is fixed and content-hashing spreads
  * docs uniformly.  Shard/pos are content-hash-derived over the
  * SURVIVOR set, so re-running the pipeline on any engine or
  * partitioning reproduces the identical layout — epoch order is
  * stable, which is what makes training runs reproducible.
  */
object TrainWarehouse {

  /** Ingest: funnel survivors → overlapping context chunks → shard
    * assignment, written shard-partitioned.  Columns at rest:
    * (doc_id, chunk_id, n_tokens, chunk_text, pos) partitioned by
    * shard — `pos` is the doc's dense ordinal within its shard
    * (the epoch-shuffle order), carried on every chunk row.
    *
    * `exciseSpans = true` inserts the Lee et al. span rewrite between
    * the funnel and chunking: cross-doc duplicated word ranges
    * (computed WITHIN the survivor set — that is the corpus being
    * trained on) are cut out, docs reduced to nothing drop, and the
    * shard layout + ordinals are computed over the EXCISED texts —
    * so dedup-of-spans and epoch order stay consistent.  This is the
    * production pairing of d_substring_excised: keep the unique
    * remainder of partially-duplicated docs instead of dropping or
    * double-training them. */
  def materialize(spark: SparkSession, dir: String, path: String,
      shards: Int = 8, exciseSpans: Boolean = false): Unit = {
    val survivors = Tables(spark, dir).documents
      .join(TrainPrep.corpusFunnel(spark, dir)
        .filter(col("keep") === 1).select(col("doc_id")), Seq("doc_id"))
    val corpus =
      if (!exciseSpans) survivors
      else graft.dedup.Dedup.substringExciseOf(survivors, n = 8)
        .select(col("doc_id"), col("excised_text").as("text"))
    val layout = TrainPrep.shardLayoutOf(corpus, shards)
    TrainPrep.chunkDocsOf(corpus)
      .join(layout, Seq("doc_id"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }

  /** Full training-set read (all shards). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
        col("chunk_text"), col("shard").cast("long").as("shard"), col("pos"))

  /** One training reader's slice: the keyed read prunes to exactly its
    * shard's partition directory — file-local at any corpus size. */
  def readShard(spark: SparkSession, path: String, shard: Long): DataFrame =
    read(spark, path).filter(col("shard") === shard)

  /** The doc-level shard layout read back from the files (one row per
    * doc — chunk rows collapse on the carried (shard, pos)). */
  def shardLayout(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
      .select(col("doc_id"), col("shard"), col("pos"))
      .distinct()
}
