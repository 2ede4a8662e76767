package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Exact.{avgx, roundx, sumx}
import graft.functions.VectorFunctions._
import graft.sources.Tables

/** Spherical k-means trainer for the IVF coarse quantizer — the step
  * that turns `Knn.coarseQuantizer`'s single Lloyd refinement into a
  * converged codebook (Lloyd 1982; spherical variant Dhillon & Modha
  * 2001, the cosine-objective form FAISS trains IVF lists with).
  *
  * Spark shapes per iteration: assignment is a broadcast of the K-row
  * centroid table + one codegen'd dot per (row × centroid) + a
  * groupBy(vec_id) argmin; refinement is posexplode + groupBy(cid, dim)
  * — a shuffle bounded by K×dims groups.  The convergence scalars
  * (cost, moved) are driver-side METADATA reads per round, like any
  * iterative-algorithm convergence check (same pattern as
  * Dedup.connectedComponents); the data path never collects.
  *
  * Determinism for the registered query: vectors are pre-normalized so
  * the refinement mean is a plain per-dim average, every mean/sum runs
  * through the Exact DECIMAL route, and per-row costs are rounded
  * before summing — bit-identical history across partitionings.
  *
  * Scale note: at corpus scale a codebook is trained on a bounded
  * SAMPLE (FAISS trains IVF on ~10⁶ vectors regardless of corpus
  * size) — pass `e.sample(...)` in; the loop itself only ever
  * materializes (vec_id, vn, cid) via localCheckpoint, never lineage
  * that grows with iterations.
  */
object Kmeans {

  /** Train K centroids for `iters` rounds over e(vec_id, v).
    * Returns (centroids(cid, cv), history(iter, cost, n_moved)) where
    * cost = Σ (1 − cos(v, centroid)) after each assignment. */
  /** Pre-normalize ONCE: |vn| = 1 turns the cosine objective into a
    * plain dot and makes the spherical refinement a per-dim mean.
    * ONE checkpointed step (optimization r15): NormalizeArr computes
    * x/|x| natively in a single codegen pass, so the old two-step
    * checkpoint dance (materialize `nrm` as a leaf so CollapseProject
    * could not re-inline the norm per element) collapses to one
    * materialization — bit-identical vn values
    * (ExpressionPropertySpec).  The checkpoint itself stays: trainers
    * re-read vn every iteration. */
  private[similarity] def normalize(e: DataFrame): DataFrame =
    e.select(col("vec_id"), graft.functions.VectorFunctions.normalize(col("v")).as("vn"))
      .localCheckpoint()

  /** Assignment step over normalized vectors: broadcast the K-row
    * centroid table, one codegen'd dot per (row × centroid), argmin
    * via min(struct).  Shared with SemDedup's cluster assignment. */
  private[similarity] def assign(eN: DataFrame, cents: DataFrame): DataFrame =
    eN.crossJoin(broadcast(cents))
      .withColumn("dist", -dot(col("vn"), col("cv")) / norm(col("cv")))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("dist"), col("cid"))).as("best"), first(col("vn")).as("vn"))
      .select(col("vec_id"), col("vn"),
        col("best.cid").as("cid"), col("best.dist").as("dist"))

  def train(e: DataFrame, k: Int, iters: Int): (DataFrame, DataFrame) = {
    val spark = e.sparkSession
    import spark.implicits._

    val eN = normalize(e)

    def assignC(cents: DataFrame): DataFrame = assign(eN, cents)

    // spherical refinement: mean DIRECTION of each cluster's members
    // (exact DECIMAL means — centroid values independent of partitioning)
    def refine(assigned: DataFrame): DataFrame =
      assigned.select(col("cid"), posexplode(col("vn")).as(Seq("dim", "x")))
        .groupBy(col("cid"), col("dim")).agg(avgx(col("x")).as("m"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("cid"), transform(col("dm"), s => s.getField("m")).as("cv"))

    var cents = eN.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cid"), col("vn").as("cv"))
    var prev: Option[DataFrame] = None
    val hist = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Long)]
    for (it <- 1 to iters) {
      val a = assignC(cents).localCheckpoint()
      val cost = a.agg(sumx(roundx(lit(1.0) + col("dist"), 6)))
        .collect()(0).getDouble(0)
      val moved = prev match {
        case None => a.count()
        case Some(p) =>
          a.select(col("vec_id"), col("cid"))
            .join(p.select(col("vec_id"), col("cid").as("pcid")), Seq("vec_id"))
            .filter(col("cid") =!= col("pcid")).count()
      }
      hist += ((it.toLong, cost, moved))
      prev = Some(a)
      if (it < iters) cents = refine(a).localCheckpoint()
    }
    (cents, hist.toSeq.toDF("iter", "cost", "n_moved"))
  }

  /** Registered query: trainer telemetry over the embeddings table —
    * one row per iteration (cost strictly through the Exact route, so
    * rows are stable across runs).  No SQL oracle (iterative k-means
    * is not expressible as a DuckDB query); KmeansSpec asserts the
    * Lloyd invariants instead. */
  def kmeansHistory(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val (_, hist) = train(e, k = 16, iters = 4)
    hist.select(col("iter"), roundx(col("cost"), 6).as("cost"), col("n_moved"))
  }
}
