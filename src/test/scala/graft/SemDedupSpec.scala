package graft

import org.apache.spark.sql.functions._
import graft.functions.Exact.roundx
import graft.functions.VectorFunctions._
import graft.similarity.SemDedup

/** SemDeDup's survivor rule, verified against independently recomputed
  * in-cluster cosines: a vector is dropped iff it has a lower-id
  * in-cluster neighbor at cosine ≥ tau.  Two invariants cover both
  * directions (no over-keeping, no over-dropping), plus determinism.
  */
class SemDedupSpec extends GraftSpec {

  private val Tau = 0.4

  test("semdedup keeps exactly the vectors with no lower-id near neighbor in-cluster") {
    val out = SemDedup.semDedup(spark, Dir).localCheckpoint()
    val e = graft.sources.Tables(spark, Dir).embeddings
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    // reproduce the operator's normalization exactly (materialized nrm
    // leaf, then elementwise divide) so threshold comparisons agree
    val vn = e.select(col("vec_id"), col("v"), norm(col("v")).as("nrm"))
      .localCheckpoint()
      .select(col("vec_id"), transform(col("v"), x => x / col("nrm")).as("vn"))
    val j = out.join(vn, Seq("vec_id"))
    val near = j.select(col("cid"), col("vec_id").as("a_id"), col("vn").as("va"))
      .join(j.select(col("cid"), col("vec_id").as("b_id"),
        col("kept").as("b_kept"), col("vn").as("vb")), Seq("cid"))
      .filter(col("a_id") < col("b_id"))
      .filter(roundx(dot(col("va"), col("vb")), 6) >= Tau)
      .localCheckpoint()
    // completeness: no KEPT vector has a lower-id in-cluster near
    // neighbor (subsumes "kept vectors are pairwise < tau in-cluster")
    assert(near.filter(col("b_kept") === 1).count() == 0,
      "a kept vector has a lower-id near neighbor in its cluster")
    // soundness: every dropped vector is witnessed by such a neighbor
    val witnessed = near.select(col("b_id")).distinct().count()
    val dropped = out.filter(col("kept") === 0).count()
    assert(witnessed == dropped,
      s"$dropped dropped but only $witnessed have a near-neighbor witness")
    assert(out.count() ==
      graft.sources.Tables(spark, Dir).embeddings.count())
  }

  test("semdedup is deterministic across runs") {
    val a = SemDedup.semDedup(spark, Dir)
    val b = SemDedup.semDedup(spark, Dir)
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("at-rest probe equals the inline sweep under the frozen codebook") {
    val path = SemDedup.ivfPath(spark, Dir)
    val probe = SemDedup.semDedupProbe(spark, Dir, path).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cid"), r.getAs[Long]("kept")))
      .toSet
    // parity baseline: the FULL corpus swept with the warehouse's own
    // frozen centroids (same assignment, same cosine arithmetic),
    // restricted to the incoming ids the probe reports
    val e = graft.sources.Tables(spark, Dir).embeddings
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val inline = SemDedup.semDedupWithCentroids(e,
        graft.similarity.IvfWarehouse.centroids(spark, path), 0.4)
      .filter(col("vec_id") % 10 >= 8).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cid"), r.getAs[Long]("kept")))
      .toSet
    assert(probe == inline,
      s"probeOnly=${(probe -- inline).take(5)} inlineOnly=${(inline -- probe).take(5)}")
    assert(probe.nonEmpty && probe.exists(_._3 == 0L),
      "no incoming vector was dropped — the sweep path went unexercised")
  }

  test("planted well-separated corpus: the batch genuinely SKIPS untouched lists") {
    import spark.implicits._
    // three axis-aligned clusters, 10 base vectors each; the batch
    // draws from cluster 0 ONLY, so a correct probe must read 1 of
    // the 3 cid partitions (the registered split's batch touches
    // every list at test SF — this is where skipping is exercised)
    def vec(axis: Int, jitter: Double): Seq[Double] =
      (0 until 8).map(d => if (d == axis) 10.0 + jitter else jitter / 10)
    val base = (0 until 30).map(i => (i.toLong, vec(i % 3, (i / 3).toDouble / 10)))
    val path = java.nio.file.Files
      .createTempDirectory("graft-semdedup-planted").resolve("idx").toString
    graft.similarity.IvfWarehouse.materializeFrom(
      base.toDF("vec_id", "v"), path, k = 3)
    val batch = Seq((101L, vec(0, 0.0)), (102L, vec(0, 0.35)))
      .toDF("vec_id", "v")
    val out = SemDedup.probeBatch(spark, batch, path, tau = 0.4).collect()
    assert(out.map(_.getAs[Long]("vec_id")).toSet == Set(101L, 102L))
    // in-cluster cosine ≈ 1 ≥ τ against lower-id base members → dropped
    assert(out.forall(_.getAs[Long]("kept") == 0L),
      s"batch vectors survived against same-cluster base members: ${out.toSeq}")
    // the pruning: the batch's one cid of three
    val assigned = graft.similarity.Knn.assignTo(batch,
      graft.similarity.IvfWarehouse.centroids(spark, path))
    val cids = assigned.select(col("cid")).distinct()
      .collect().map(_.getAs[Int]("cid"))
    assert(cids.length == 1, s"planted batch scattered over cids ${cids.toSeq}")
    val df = SemDedup.standingLists(spark, path, cids)
    val scan = df.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no FileSourceScanExec in plan"))
    val allParts = scan.relation.location.listFiles(Nil, Nil).length
    val pruned =
      scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters).length
    assert(allParts == 3 && pruned == 1,
      s"scan read $pruned of $allParts partitions for a 1-cluster batch")
  }

  test("the probe's posting-list scan prunes to exactly the batch's cid partitions") {
    val path = SemDedup.ivfPath(spark, Dir)
    val assigned = graft.similarity.Knn.assignTo(
        graft.sources.Tables(spark, Dir).embeddings
          .filter(col("vec_id") % 10 >= 8)
          .select(col("vec_id"), toDouble(col("embedding")).as("v")),
        graft.similarity.IvfWarehouse.centroids(spark, path))
    val batchCids = assigned.select(col("cid")).distinct()
      .collect().map(_.getAs[Int]("cid"))
    val df = SemDedup.standingLists(spark, path, batchCids)
    val scan = df.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no FileSourceScanExec in plan"))
    val allParts = scan.relation.location.listFiles(Nil, Nil).length
    val pruned =
      scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters).length
    assert(allParts > 1, s"expected a cid-partitioned layout, got $allParts")
    assert(pruned == batchCids.length && pruned <= allParts,
      s"scan read $pruned of $allParts partitions for ${batchCids.length} batch cids")
    // the pruning is only meaningful if a probe CAN skip lists: on a
    // tiny batch the assertion below degrades gracefully (documented)
    if (batchCids.length == allParts)
      info("batch touches every list at this SF — pruning exercised structurally only")
  }
}
