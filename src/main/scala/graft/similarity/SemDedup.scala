package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Exact.roundx
import graft.functions.VectorFunctions._
import graft.sources.Tables

/** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
  * web-scale through semantic deduplication"): k-means the embedding
  * space, then remove near-duplicates WITHIN clusters only — the
  * observation being that semantic dups land in the same cluster, so
  * the quadratic pair stage shrinks from O(n²) to Σ|cluster|², with K
  * chosen to keep clusters bounded (the paper runs K=11k on LAION;
  * K scales with the corpus so cluster size stays roughly constant).
  *
  * Spark shapes: the codebook comes from the spherical trainer
  * (Kmeans.train — bounded-sample training is the documented scale
  * path there); assignment is the broadcast argmin; the pair stage is
  * a self-equi-join ON cid — a shuffle keyed by cluster id, pairs
  * generated only inside a partition's cluster.  At 100 TB the within-
  * cluster stage composes with the hyperplane-LSH banding used by
  * Dedup.cosinePairs (band WITHIN cid) if clusters outgrow the
  * quadratic budget — same candidate/verify split, keys become
  * (cid, band, bkey).
  *
  * Survivor rule: keep a vector iff it has NO lower-id in-cluster
  * neighbor at cosine ≥ tau (min-id survivor — this dedup family's
  * convention, cf. Dedup.exact's min(doc_id); the paper keeps the
  * member closest to the centroid, a 1-line swap of the ordering key).
  * Two invariants follow and are spec-asserted (SemDedupSpec): every
  * dropped vector has a lower-id in-cluster neighbor ≥ tau, and kept
  * vectors are pairwise < tau within every cluster.
  *
  * No SQL oracle (iterative k-means is not DuckDB-expressible) —
  * rows-only driver check + the invariant spec.
  */
object SemDedup {

  def semDedup(spark: SparkSession, dir: String,
      k: Int = 16, iters: Int = 2, tau: Double = 0.4): DataFrame = {
    val e = Tables(spark, dir).embeddings
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val (cents, _) = Kmeans.train(e, k, iters)
    val assigned = Kmeans.assign(Kmeans.normalize(e), cents)
      .select(col("vec_id"), col("cid"), col("vn"))
      .localCheckpoint() // reused by both pair sides + the final flag join
    // vn is unit-norm, so dot == cosine; rounded like the cosine-pair
    // family so threshold comparisons are partition-order-stable
    val pairs = assigned.select(col("cid"), col("vec_id").as("a_id"), col("vn").as("va"))
      .join(assigned.select(col("cid"), col("vec_id").as("b_id"), col("vn").as("vb")), Seq("cid"))
      .filter(col("a_id") < col("b_id"))
      .filter(roundx(dot(col("va"), col("vb")), 6) >= tau)
    val dropped = pairs.select(col("b_id").as("vec_id")).distinct()
      .withColumn("dropped", lit(1L))
    assigned.select(col("vec_id"), col("cid"))
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"),
        when(col("dropped").isNull, 1L).otherwise(0L).as("kept"))
  }
}
