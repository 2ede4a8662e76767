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

  /** `d_semdedup_probe`: SemDeDup AT REST — the incoming crawl batch
    * swept against the IVF warehouse's FROZEN coarse centroids and
    * standing posting lists, the production shape the inline query's
    * per-run k-means re-train stands in for: clusters are trained at
    * ingest (IvfWarehouse stores the codebook; refresh assigns with it
    * — FAISS's add-with-frozen-coarse-quantizer contract), and a sweep
    * over a batch reads ONLY the cid partitions the batch lands in.
    *
    * Plan: the batch assigns to the frozen centroids (broadcast
    * argmin — Knn.assignTo, bit-identical to the assignment that
    * produced the lists); its distinct cids become a literal `isin`
    * predicate, so the posting-list scan PRUNES partitions
    * (SemDedupSpec listFiles-asserts ≤ |batch cids| of K); the pair
    * stage joins (standing ∪ batch) × batch ON cid — never corpus ×
    * corpus, and never a list the batch doesn't touch.  Survivor rule
    * unchanged (min-id): an incoming vector is kept iff NO lower-id
    * same-cluster vector — standing or incoming — sits at cosine ≥
    * tau.  Output = (vec_id, cid, kept) for the batch only.
    *
    * NO oracle (trained coarse quantizer — the s_knn_ivf stance);
    * SemDedupSpec pins probe == `semDedupWithCentroids` (the inline
    * full-corpus sweep under the SAME frozen codebook) restricted to
    * the batch, plus the partition pruning.
    *
    * 100 TB: per crawl batch this reads |batch cids|/K of the index
    * and scores Σ|touched list| × |batch-in-list| pairs; within-list
    * growth composes with the cosinePairs banding (band WITHIN cid)
    * exactly as the inline query's Scaladoc describes. */
  def semDedupProbe(spark: SparkSession, dir: String, path: String,
      tau: Double = 0.4): DataFrame =
    probeBatch(spark,
      Tables(spark, dir).embeddings
        .filter(pmod(col("vec_id"), lit(10L)) >= 8)
        .select(col("vec_id"), toDouble(col("embedding")).as("v")),
      path, tau)

  /** The sweep for an arbitrary incoming (vec_id, v) batch — also the
    * planted-corpus pruning spec's entry point (the registered split's
    * batch touches every list at test SF, so genuine skipping is
    * exercised on a constructed well-separated layout). */
  private[graft] def probeBatch(spark: SparkSession, incoming: DataFrame,
      path: String, tau: Double): DataFrame = {
    val assigned = Knn.assignTo(incoming, IvfWarehouse.centroids(spark, path))
      .withColumn("nrm", norm(col("v")))
      .localCheckpoint() // feeds cid list, pair side, and output rows
    // driver-side METADATA (≤ K ints) — what builds the pruning literal
    val batchCids = assigned.select(col("cid")).distinct()
      .collect().map(_.getAs[Int]("cid"))
    val standing = standingLists(spark, path, batchCids)
    keptFlags(
      standing.unionByName(assigned.select(col("vec_id"), col("v"), col("cid"), col("nrm"))),
      assigned, tau)
  }

  /** The pruned posting-list read (exposed so the spec can assert the
    * pruned file listing on exactly the frame the probe scans). */
  private[graft] def standingLists(spark: SparkSession, path: String,
      cids: Array[Int]): DataFrame =
    graft.sources.CommitLog.snapshot(spark, path).read(path)
      .filter(col("cid").isin(cids.toIndexedSeq.map(Integer.valueOf): _*))
      .select(col("vec_id"), col("v"), col("cid"))
      .withColumn("nrm", norm(col("v")))

  /** Inline parity baseline: the FULL corpus swept under a FROZEN
    * codebook (assignment and cosine arithmetic exactly the probe's).
    * Restricted to the batch ids, this must equal `semDedupProbe` row
    * for row — every lower-id candidate of a batch vector shares its
    * cid, and the probe's pool contains that cid's full membership. */
  private[graft] def semDedupWithCentroids(e: DataFrame, cents: DataFrame,
      tau: Double): DataFrame = {
    val assigned = Knn.assignTo(e, cents)
      .withColumn("nrm", norm(col("v")))
      .localCheckpoint()
    keptFlags(assigned, assigned, tau)
  }

  /** The survivor sweep shared by the probe and its parity baseline:
    * `targets` are flagged kept/dropped against lower-id same-cid
    * neighbors drawn from `pool` (pool ⊇ targets).  Cosine is the
    * engine-standard rounded dot/(‖a‖·‖b‖) — one arithmetic form on
    * both paths, so parity is bit-exact. */
  private def keptFlags(pool: DataFrame, targets: DataFrame,
      tau: Double): DataFrame = {
    val pairs = pool
      .select(col("cid"), col("vec_id").as("a_id"), col("v").as("va"), col("nrm").as("na"))
      .join(targets.select(col("cid"), col("vec_id").as("b_id"),
        col("v").as("vb"), col("nrm").as("nb")), Seq("cid"))
      .filter(col("a_id") < col("b_id"))
      .filter(roundx(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6) >= tau)
    val dropped = pairs.select(col("b_id").as("vec_id")).distinct()
      .withColumn("dropped", lit(1L))
    targets.select(col("vec_id"), col("cid"))
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"),
        when(col("dropped").isNull, 1L).otherwise(0L).as("kept"))
  }

  /** The Materialized warehouse path the registered probe serves from:
    * IVF layout over the BASE split (vec_id ≡ 0..7 mod 10 — the
    * warehouse family's split), built once per JVM per source dir. */
  def ivfPath(spark: SparkSession, dir: String): String =
    graft.sources.Materialized.pathFor("ivf_semdedup", dir) { p =>
      IvfWarehouse.materializeFrom(
        Tables(spark, dir).embeddings
          .filter(pmod(col("vec_id"), lit(10L)) < 8)
          .select(col("vec_id"), toDouble(col("embedding")).as("v")),
        p, k = 16)
    }
}
