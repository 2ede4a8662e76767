package graft.similarity

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.Exact.roundx
import graft.functions.VectorFunctions._
import graft.sources.Tables

/** Principal-component analysis over the `embeddings` table, and the
  * dimension-reduction ANN path it enables.
  *
  * Three registered members:
  *  - `s_embed_cov`: the population covariance matrix of the 64
  *    embedding dimensions — the distributed statistic everything else
  *    derives from, and the one leg that is EXACTLY SQL-expressible,
  *    so it carries the family's DuckDB oracle.
  *  - `s_pca`: eigen-decomposition of that matrix (eigenvalues +
  *    explained-variance ratios).  The matrix is 64×64 = 4 KB — driver
  *    metadata, like the PQ codebooks — so the eigensolver is a plain
  *    deterministic Jacobi on the driver; the DATA pass is the
  *    covariance aggregation above.
  *  - `s_knn_pca`: brute KNN behind a PCA shortlist — project to the
  *    top `R` components (a contraction, so projected L2 distance
  *    lower-bounds true L2 distance), take the `Shortlist` nearest in
  *    the reduced space, re-rank those exactly.  (The constants'
  *    values and the measured recall ladder live on their definitions
  *    below — the doc stays parameter-agnostic so it can't drift.)
  *    The third ANN family
  *    (alongside LSH buckets and IVF/PQ): dimension reduction rather
  *    than space partitioning or code compression.
  *
  * Exactness discipline (the d_corpus_stats lesson): float sums are
  * order-dependent, so the covariance QUANTIZES each element to a
  * 1e-6 fixed-point long (floor(x·1e6 + 0.5) — floor, not round, so
  * both engines break .5 identically) and aggregates the integer
  * moments exactly as DECIMAL(38,0); the single double division and
  * 9-dp round happen once at the end.  n·Σxy − Σx·Σy keeps centering
  * out of the per-row path entirely (no mean subtraction before the
  * aggregate — the mean is implicit in the moment identity).
  *
  * 100 TB: one scan; the triangle Generate emits 2 080 rows per vector
  * but partial aggregation collapses them map-side, so only
  * 2 080 groups × partitions cross the wire, independent of corpus
  * size.  Dimension sums ride the same shape (64 groups).  At extreme
  * width (d ≫ 10³, where d² explodes the Generate) the swap-in is a
  * native matrix-accumulating TypedImperativeAggregate; at d = 64 the
  * declarative form stays whole-stage-codegen'd and oracle-shaped.
  */
object Pca {

  val Dims = 64
  /** Fixed-point quantization: 1e-6 resolution on elements in [-1, 1]. */
  private val Scale = 1e6
  /** Retained components for the ANN path.  MEASURED recall@10 ladder
    * on the worst-case random sf0.1 corpus (no low-rank structure —
    * every extra component buys signal): (R=8, C=50) 0.1,
    * (8, 250) 0.4, (16, 50) 0.3, (16, 250) 0.8, (24, 250) 1.0.
    * Default (16, 250): pq_refined-parity recall with 16-dim L2 per
    * shortlist candidate — 4× less per-pair math than the 64-dim
    * brute dot — and the same 250-vector exact stage.  Real
    * embedding distributions are low-rank and sit far above this
    * floor at R=8. */
  private[graft] val R = 16
  /** Shortlist width for the exact re-rank (the pq_refined depth). */
  private[graft] val Shortlist = 250

  /** `s_embed_cov`: upper-triangle (i ≤ j) population covariance of
    * the embedding dimensions.  Columns (i, j, cov); 2 080 rows. */
  def embedCov(spark: SparkSession, dir: String): DataFrame =
    covFrom(Tables(spark, dir).embeddings)

  /** ALL covariance moments as ONE (i, j, m) frame from ONE corpus
    * scan, in exact quantized-integer DECIMAL(38,0) arithmetic:
    *   (i, j≥i, Σxixj)  the 2 080 triangle products,
    *   (i, −1,  Σxi)    the 64 dimension sums,
    *   (−1, −1, n)      the row count
    * — sentinel rows instead of separate aggregations, because at
    * 100 TB "three tiny side frames" would mean three more passes
    * over the corpus (the first cut of this operator did exactly
    * that; the formatted plan showed four parquet scans).  Moments
    * are ASSOCIATIVE sums, which is what makes PcaWarehouse's
    * incremental refresh bit-equal to a one-shot rebuild. */
  private[graft] def moments(emb: DataFrame): DataFrame = {
    // per-row moment contributions: 2 080 + 64 + 1 structs from the
    // native CovMoments expression (one tight loop over the quantized
    // vector — the HOF-lambda form was interpreted and measured 4 s /
    // 5 000 vectors), exploded then map-side partially aggregated —
    // only the 2 145-group frame crosses the wire, independent of
    // corpus size
    import org.apache.spark.sql.GraftBridge
    val m = GraftBridge.column(graft.functions.CovMoments(
      GraftBridge.expression(col("embedding")), Dims))
    emb.select(explode(m).as("t"))
      .groupBy(col("t.i").cast("long").as("i"), col("t.j").cast("long").as("j"))
      .agg(sum(col("t.p").cast("decimal(38,0)")).as("m"))
  }

  private[graft] def covFrom(emb: DataFrame): DataFrame =
    // the checkpoint pins the 2 145-row aggregate (metadata-scale) so
    // the three moment slices below don't re-run the corpus scan
    covFromMoments(moments(emb).localCheckpoint())

  /** Final covariance from a (possibly delta-summed) moment frame. */
  private[graft] def covFromMoments(m: DataFrame): DataFrame = {
    val sxy = m.filter(col("j") >= 0).select(col("i"), col("j"), col("m").as("sxy"))
    val dims = m.filter(col("j") === -1 && col("i") >= 0)
    val n = m.filter(col("i") === -1).select(col("m").cast("long").as("n"))
    sxy
      .join(broadcast(dims.select(col("i"), col("m").as("sxi"))), Seq("i"))
      .join(broadcast(dims.select(col("i").as("j"), col("m").as("sxj"))), Seq("j"))
      .crossJoin(broadcast(n))
      // exact integer numerator n·Σxy − Σxi·Σxj, ONE double division,
      // one 9-dp roundx (the DuckDB-round mirror — Spark's own round
      // disagrees near decimal ties) — hash-stable across engines
      .select(col("i"), col("j"),
        roundx((col("n") * col("sxy") - col("sxi") * col("sxj")).cast("double") /
          (col("n").cast("double") * col("n") * lit(Scale * Scale)), 9).as("cov"))
  }

  /** Collected full symmetric covariance matrix — 64×64 doubles of
    * driver metadata (the PQ-codebook pattern). */
  private[graft] def covMatrix(spark: SparkSession, dir: String): Array[Array[Double]] = {
    val a = Array.ofDim[Double](Dims, Dims)
    embedCov(spark, dir).collect().foreach { r =>
      val (i, j, c) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2))
      a(i)(j) = c
      a(j)(i) = c
    }
    a
  }

  /** Deterministic cyclic Jacobi eigensolver for a symmetric matrix:
    * fixed sweep order, fixed convergence threshold, no randomness.
    * Returns (eigenvalues, eigenvectors as rows), sorted by eigenvalue
    * descending, each vector sign-fixed (largest-|component| entry
    * positive, lowest index on ties) so output is unique. */
  private[graft] def jacobiEigen(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 100 && off > 1e-14) {
      off = 0.0
      for (p <- 0 until n; q <- p + 1 until n) {
        off += a(p)(q) * a(p)(q)
        if (math.abs(a(p)(q)) > 1e-18) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          val apq = a(p)(q)
          a(p)(p) -= t * apq
          a(q)(q) += t * apq
          a(p)(q) = 0.0
          a(q)(p) = 0.0
          for (k <- 0 until n if k != p && k != q) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = c * akp - s * akq; a(p)(k) = a(k)(p)
            a(k)(q) = s * akp + c * akq; a(q)(k) = a(k)(q)
          }
          for (k <- 0 until n) {
            val vkp = v(k)(p); val vkq = v(k)(q)
            v(k)(p) = c * vkp - s * vkq
            v(k)(q) = s * vkp + c * vkq
          }
        }
      }
      sweep += 1
    }
    val pairs = (0 until n).map { i =>
      val vec = Array.tabulate(n)(k => v(k)(i))
      val big = vec.indices.maxBy(k => (math.abs(vec(k)), -k))
      (a(i)(i), if (vec(big) < 0) vec.map(-_) else vec)
    }.sortBy(-_._1) // stable sort: equal eigenvalues keep Jacobi order
    (pairs.map(_._1).toArray, pairs.map(_._2).toArray)
  }

  /** `s_pca`: top-R eigenvalues of the embedding covariance with
    * explained-variance ratios.  Columns (component, eigenvalue,
    * explained).  No SQL oracle (iterative eigensolver) — PcaSpec pins
    * the eigen-invariants: A·v = λ·v residuals, orthonormality,
    * descending order, Σλ = trace. */
  def pcaComponents(spark: SparkSession, dir: String): DataFrame =
    componentsOf(spark, covMatrix(spark, dir))

  /** Eigen table from a collected covariance matrix — shared by the
    * inline query and PcaWarehouse.pcaProbe (bit-equal input ⇒
    * bit-equal output: Jacobi is deterministic). */
  private[graft] def componentsOf(spark: SparkSession,
      cov: Array[Array[Double]]): DataFrame = {
    val (evals, _) = jacobiEigen(cov)
    val trace = (0 until Dims).map(i => cov(i)(i)).sum
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    import spark.implicits._
    (0 until R).map(i => (i.toLong, r6(evals(i)), r6(evals(i) / trace)))
      .toDF("component", "eigenvalue", "explained")
  }

  /** `s_knn_pca`: top-10 cosine neighbors of vec_id 0 behind a PCA
    * shortlist.  Projection weights and the query's projected point
    * are plan LITERALS (driver metadata, like planeWeights); the scan
    * side pays R dot products per row, the shortlist cut compiles to
    * TakeOrderedAndProject, and only `Shortlist` vectors reach the
    * exact stage — which scores with the IDENTICAL rounded-cosine
    * expression as s_knn_brute, so stage-2 scores are bit-equal
    * (spec-pinned).
    *
    * Recall is heuristic, not bounded: the projection contracts L2
    * (‖P(a−b)‖ ≤ ‖a−b‖) but the final metric is cosine, and on a
    * random corpus (no low-rank structure — PCA's worst case, the PQ
    * caveat verbatim) an R-dim shortlist misses some true neighbors
    * (the measured ladder on `R`'s definition); recall@10 rides the
    * BENCH `ann` key like every other approximate path. */
  def knnPca(spark: SparkSession, dir: String): DataFrame =
    knnPcaWith(spark, dir, R, Shortlist)

  private[graft] def knnPcaWith(spark: SparkSession, dir: String,
      nComponents: Int, shortlist: Int): DataFrame = {
    val t = Tables(spark, dir)
    val cov = covMatrix(spark, dir)
    val (_, evecs) = jacobiEigen(cov)
    val pcs = (0 until nComponents).map(r => evecs(r).toSeq)

    val e = t.embeddings
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    // projection: R literal-weight dots per row (centering shifts both
    // sides of the L2 difference equally, so it cancels — skip it)
    val proj = e.withColumn("p", array(pcs.map(w =>
      dot(col("v"), typedLit(w).cast("array<double>"))): _*))
    val qp = proj.filter(col("vec_id") === 0)
      .select(col("p").as("qp"), col("v").as("qv"), norm(col("v")).as("qnrm"))

    val short = proj.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qp))
      .withColumn("d2", aggregate(zip_with(col("p"), col("qp"),
        (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x))
      .orderBy(col("d2"), col("vec_id"))
      .limit(shortlist)
      .select(col("vec_id"))

    e.join(broadcast(short), Seq("vec_id"))
      .crossJoin(broadcast(qp.select(col("qv"), col("qnrm"))))
      .withColumn("cos",
        roundx(dot(col("v"), col("qv")) / (norm(col("v")) * col("qnrm")), 6))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
      .select(col("vec_id"), col("cos").as("cosine"))
  }
}
