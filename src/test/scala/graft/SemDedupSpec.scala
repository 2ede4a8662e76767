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
}
