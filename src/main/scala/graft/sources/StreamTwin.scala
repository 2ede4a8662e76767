package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** The shared EXACTLY-ONCE streaming-refresh machinery (round 12,
  * extracted once three members carried near-verbatim copies — review
  * r12b): a member's streaming twin folds each micro-batch through
  * ONE CommitLog transaction that ALSO commits the engine batch id as
  * a `.stream` part.  Replay safety in layers:
  *  - the BatchMarkers fast-skip (one driver FS listing, zero Spark
  *    actions) absorbs the common at-least-once redelivery;
  *  - the txn-embedded id closes the residual window (crash between
  *    the commit marker and the external batchid record): on
  *    redelivery the committed id makes the member's refreshTxn fold
  *    NOTHING — the id and the data commit in the same atomic marker;
  *  - the lineage guard fails loudly when the engine checkpoint and
  *    the marker dir diverge (the silent-mass-skip trap);
  *  - the count-triggered log checkpoint bounds marker I/O, so
  *    nothing in the loop grows with stream length.
  * Members keep their own refreshTxn (the verb bodies differ — parts,
  * stats columns, stats-scalar updates); this object holds everything
  * that must not drift apart across them. */
object StreamTwin {

  /** The `.stream` id part of a member's base path. */
  def streamIdPath(path: String): String = s"$path.stream"

  /** Is `id` already committed?  The id part carries batch_id STATS
    * in its commit entries (round 13 — statsCols adoption, VERDICT-r12
    * ask #4), so at streaming cadence — one generation per folded
    * batch between checkpoints — the dup-check drops every generation
    * whose recorded [min, max] id range misses `id` AT THE LOG: the
    * common fresh-id case reads ZERO files instead of listing one per
    * batch since the last checkpoint.  Generations without stats
    * (pre-r13 logs) are always kept — the check stays exact. */
  def seenBatch(snap: CommitLog.Snapshot, path: String, id: Long): Boolean =
    snap.readWhere(streamIdPath(path), "batch_id",
        Some(id.toString), Some(id.toString))
      .exists(_.filter(col("batch_id") === id).limit(1).count() > 0)

  /** Commit `id` as one more part of the SAME transaction — the
    * atomicity that makes the dup-check exact.  batch_id stats ride
    * in the entry (see seenBatch). */
  def commitBatchId(t: CommitLog.Txn, path: String, id: Long): Unit =
    t.append(t.spark.range(1).select(lit(id).as("batch_id")),
      streamIdPath(path), statsCols = Seq("batch_id"))

  /** The whole id'd-refresh SHAPE in one place (round 13 — ask #3
    * rolled the rung out to the full twin matrix, and nine verbatim
    * copies of the dup-check would drift): skip when `batchId` is
    * already committed, otherwise run the member's verb body and
    * commit the id in the SAME transaction.  The dup-check snapshot
    * is taken only on the id'd path — a plain (batchId = None)
    * refresh pays no extra log listing (review r12b).  Returns false
    * iff the batch was skipped as a replay. */
  def refreshTxnWith(spark: SparkSession, path: String,
      batchId: Option[Long])(body: CommitLog.Txn => Unit): Boolean = {
    val seen = batchId.exists(id =>
      seenBatch(CommitLog.snapshot(spark, path), path, id))
    if (seen) return false
    CommitLog.transaction(spark, path) { t =>
      body(t)
      batchId.foreach(id => commitBatchId(t, path, id))
    }
    true
  }

  /** Compact-side fold: the id part collapses to one generation
    * WITHOUT forgetting ids — replay protection survives compaction.
    * Call inside the member's compact transaction with the snapshot
    * the compact itself pinned. */
  def compactIds(snap: CommitLog.Snapshot, t: CommitLog.Txn, path: String): Unit =
    snap.readOpt(streamIdPath(path)).foreach(ids =>
      t.replace(ids.distinct(), streamIdPath(path), statsCols = Seq("batch_id")))

  /** The foreachBatch wrapper: lineage guard at start, fast-skip +
    * record per trigger, count-triggered log checkpoint behind.
    * `fold(spark, batch, id)` runs the member's refreshTxn with the
    * id — which must commit it via `commitBatchId` in the same txn. */
  def exactlyOnce(events: DataFrame, path: String, checkpointEvery: Int)(
      fold: (SparkSession, DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(checkpointEvery > 0,
      s"checkpointEvery must be positive, got $checkpointEvery")
    val markers = s"$path.batchid"
    BatchMarkers.ensureLineage(events.sparkSession, s"$path.checkpoint", markers)
    events.writeStream.outputMode("append")
      .option("checkpointLocation", s"$path.checkpoint")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val s = batch.sparkSession
        // idle-trigger guard (the sketch/Edge/Mg twins' convention)
        if (id > BatchMarkers.lastBatchId(s, markers) && !batch.isEmpty) {
          fold(s, batch, id)
          BatchMarkers.record(s, markers, id)
          if (CommitLog.markerCount(s, path) > checkpointEvery)
            CommitLog.checkpoint(s, path)
        }
      }
      .start()
  }
}
