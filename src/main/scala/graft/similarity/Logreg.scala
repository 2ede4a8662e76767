package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Exact.{roundx, sumx}
import graft.functions.VectorFunctions._
import graft.sources.Tables

/** Distributed logistic-regression trainer + scorer — the QUALITY
  * CLASSIFIER of a training-data pipeline: GPT-3's CommonCrawl filter
  * was exactly this shape (a linear classifier scoring every document,
  * Brown et al. 2020 appendix A; CCNet's fastText filter is the same
  * idea, Wenzek et al. 2020), and at 100 TB the scoring pass is a pure
  * broadcast-free scan while training runs on a bounded labeled set.
  *
  * Spark shapes, per GD iteration (full-batch gradient descent on the
  * convex log-loss):
  *  - the weight vector is a PLAN LITERAL (dims+1 doubles) — scoring
  *    costs one codegen'd dot per row, no join, no broadcast table;
  *  - the gradient is Σ (p−y)·x per dim: per-row error computed once
  *    in the Project BELOW the posexplode (ridden as an attribute
  *    reference — the alongside-explode re-evaluation trap), then ONE
  *    partial-aggregated shuffle bounded by dims groups;
  *  - the driver holds dims+1 doubles and the loss scalar per round —
  *    K-row metadata, the Kmeans-history pattern, never data.
  *
  * Determinism: per-row gradient/loss terms are rounded (roundx, 9 dp)
  * and summed through the Exact DECIMAL route, so sums are independent
  * of partitioning and the trained weights — hence every score — are
  * bit-identical across runs and cluster layouts.  LogregSpec also
  * pins one GD step against a single-machine reference computation.
  *
  * Scale note: like the k-means/PQ codebooks, production training uses
  * a bounded labeled sample (a classifier is trained on 10⁴–10⁶ labels
  * regardless of corpus size — pass a sampled frame in); SCORING is
  * the corpus-scale pass, and it is scan-speed.
  */
object Logreg {

  /** Normalize + binary-label the embeddings table: y = 1 iff label
    * == target (one-vs-rest on the synthetic cluster labels — the
    * "curated domain vs rest" stand-in). */
  private def prepared(spark: SparkSession, dir: String, target: Int): DataFrame =
    Tables(spark, dir).embeddings
      .select(col("vec_id"), toDouble(col("embedding")).as("v"),
        col("label").cast("long").as("label"),
        when(col("label") === target, 1.0).otherwise(0.0).as("y"))
      .withColumn("nrm", norm(col("v")))
      .localCheckpoint() // materialized leaf: keep nrm out of the transform lambda
      .select(col("vec_id"), col("label"), col("y"),
        transform(col("v"), x => x / col("nrm")).as("vn"))

  /** One scoring expression: sigmoid(w·x + b) with w, b plan literals. */
  private def scoreCol(w: Array[Double], b: Double) =
    lit(1.0) / (lit(1.0) + exp(-(dot(col("vn"), lit(w)) + lit(b))))

  /** Full-batch GD for `iters` rounds at rate `lr`.  Returns
    * ((weights, bias), history(iter, loss)). */
  def train(eN: DataFrame, dims: Int, iters: Int, lr: Double)
      : ((Array[Double], Double), Seq[(Long, Double)]) = {
    val n = eN.count().toDouble
    var w = Array.fill(dims)(0.0)
    var b = 0.0
    val hist = Seq.newBuilder[(Long, Double)]
    for (it <- 1 to iters) {
      // error once per ROW in the project below the explode; the
      // exploded frame then carries it as an attribute reference
      val scored = eN.select((scoreCol(w, b) - col("y")).as("err"),
        (-when(col("y") === 1.0, log(greatest(scoreCol(w, b), lit(1e-12))))
          .otherwise(log(greatest(lit(1.0) - scoreCol(w, b), lit(1e-12))))).as("ll"),
        col("vn"))
      // one shuffle, dims groups: per-dim gradient, with the bias
      // gradient and loss folded in (read off the dim-0 row — err/ll
      // appear once per dim, so their dim-0 sum is the row sum)
      val g = scored
        .select(col("err"), col("ll"), posexplode(col("vn")).as(Seq("dim", "x")))
        .groupBy(col("dim"))
        .agg(sumx(roundx(col("err") * col("x"), 9)).as("gsum"),
          sumx(roundx(col("err"), 9)).as("esum"),
          sumx(roundx(col("ll"), 9)).as("lsum"))
        .collect()
      val gd = g.map(r => r.getAs[Int]("dim") ->
        ((r.getAs[Double]("gsum"), r.getAs[Double]("esum"), r.getAs[Double]("lsum")))).toMap
      w = Array.tabulate(dims)(j => w(j) - lr * gd(j)._1 / n)
      b = b - lr * gd(0)._2 / n
      hist += ((it.toLong, gd(0)._3 / n))
    }
    ((w, b), hist.result())
  }

  private val Dims = 64
  private val Iters = 8
  private val Lr = 5.0
  private val Target = 0

  /** Registered query: trainer telemetry, one row per GD round.  (No
    * SQL oracle — an iterative trainer is not a DuckDB query; LogregSpec
    * asserts monotone loss, a single-step gradient parity against a
    * single-machine reference, determinism, and score separation.) */
  def logregHistory(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val eN = prepared(spark, dir, Target).localCheckpoint()
    val (_, hist) = train(eN, Dims, Iters, Lr)
    hist.toDF("iter", "loss")
      .select(col("iter"), roundx(col("loss"), 6).as("loss"))
  }

  /** Registered query: the corpus-scale scoring pass — every vector's
    * quality score under the trained weights (one codegen'd dot per
    * row, weights as plan literals; zero joins, zero shuffles). */
  def logregScore(spark: SparkSession, dir: String): DataFrame = {
    val eN = prepared(spark, dir, Target).localCheckpoint()
    val ((w, b), _) = train(eN, Dims, Iters, Lr)
    eN.select(col("vec_id"), col("label"), col("y").cast("long").as("y"),
      roundx(scoreCol(w, b), 6).as("score"),
      (scoreCol(w, b) > 0.5).cast("long").as("predicted"))
  }
}
