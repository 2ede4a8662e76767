package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.operators.{TrainPrep, TrainWarehouse}

/** The materialized training set must (a) reproduce the inline
  * funnel ∧ chunk ∧ shard composition exactly and (b) serve one
  * reader's shard with PARTITION PRUNING — the layout exists so a
  * training reader touches 1/shards of the files, not the corpus. */
class TrainWarehouseSpec extends GraftSpec {

  private lazy val path = graft.sources.Materialized
    .pathFor("train_warehouse_spec", Dir)(
      TrainWarehouse.materialize(spark, Dir, _))

  test("read-back equals the inline funnel ∧ chunk ∧ shard composition") {
    val survivors = sources.Tables(spark, Dir).documents
      .join(TrainPrep.corpusFunnel(spark, Dir)
        .filter(col("keep") === 1).select(col("doc_id")), Seq("doc_id"))
    val inline = TrainPrep.chunkDocsOf(survivors)
      .join(TrainPrep.shardLayoutOf(survivors, 8), Seq("doc_id"))
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
        col("chunk_text"), col("shard"), col("pos"))
      .collect().map(_.toSeq).toSet
    val stored = TrainWarehouse.read(spark, path)
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
        col("chunk_text"), col("shard"), col("pos"))
      .collect().map(_.toSeq).toSet
    assert(stored.nonEmpty, "warehouse materialized no chunks")
    assert(stored == inline)
    // the funnel actually gated: fewer docs at rest than in the corpus
    val atRest = TrainWarehouse.shardLayout(spark, path).count()
    val corpus = sources.Tables(spark, Dir).documents.count()
    assert(atRest < corpus, s"funnel kept all $corpus docs — gates inert")
  }

  test("one reader's shard read prunes to exactly one partition") {
    val df = TrainWarehouse.readShard(spark, path, shard = 3L)
    val scan = df.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f }
      .getOrElse(fail("no FileSourceScanExec in plan"))
    val allParts = scan.relation.location.listFiles(Nil, Nil).length
    val prunedParts =
      scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters).length
    assert(allParts == 8, s"expected 8 shard partitions, got $allParts")
    assert(prunedParts == 1,
      s"shard read should prune to 1 partition, scanned $prunedParts of $allParts")
    assert(df.count() > 0)
  }

  test("excising materialization trains on cleaned text, consistently sharded") {
    val p = java.nio.file.Files
      .createTempDirectory("graft-tw-excise-").toString + "/data"
    TrainWarehouse.materialize(spark, Dir, p, exciseSpans = true)
    val survivors = sources.Tables(spark, Dir).documents
      .join(TrainPrep.corpusFunnel(spark, Dir)
        .filter(col("keep") === 1).select(col("doc_id")), Seq("doc_id"))
    val excised = dedup.Dedup.substringExciseOf(survivors, n = 8)
      .select(col("doc_id"), col("excised_text").as("text"))
    val inline = TrainPrep.chunkDocsOf(excised)
      .join(TrainPrep.shardLayoutOf(excised, 8), Seq("doc_id"))
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
        col("chunk_text"), col("shard"), col("pos"))
      .collect().map(_.toSeq).toSet
    val stored = TrainWarehouse.read(spark, p)
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
        col("chunk_text"), col("shard"), col("pos"))
      .collect().map(_.toSeq).toSet
    assert(stored.nonEmpty && stored == inline)
    // excision strictly reduces the training token volume vs the
    // plain warehouse (this corpus has cross-doc duplicated spans)
    val plainTokens = TrainWarehouse.read(spark, path)
      .agg(sum(col("n_tokens"))).head().getLong(0)
    val excisedTokens = TrainWarehouse.read(spark, p)
      .agg(sum(col("n_tokens"))).head().getLong(0)
    assert(excisedTokens < plainTokens,
      s"excision removed nothing: $excisedTokens vs $plainTokens")
  }

  test("per-shard ordinals are dense from 1 and the layout is hash-stable") {
    val layout = TrainWarehouse.shardLayout(spark, path).collect()
    layout.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      val ps = rows.map(_.getAs[Long]("pos")).sorted
      assert(ps.head == 1L && ps.last == ps.length.toLong,
        "shard ordinals must be dense 1..n")
    }
    // re-materializing yields the identical layout (content-derived,
    // not partitioning- or run-dependent)
    val p2 = java.nio.file.Files
      .createTempDirectory("graft-tw-rerun-").toString + "/data"
    TrainWarehouse.materialize(spark, Dir, p2)
    val again = TrainWarehouse.shardLayout(spark, p2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == layout.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
  }
}
