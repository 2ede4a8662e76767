package graft

import org.apache.spark.sql.functions._

import graft.similarity.Pca

/** PCA family invariants.
  *
  *  - covariance: exact parity with a driver-side naive recomputation
  *    of the SAME fixed-point moment identity (the quantized integer
  *    path is exact up to one double division + 9-dp round, so the
  *    distributed aggregate must agree to the last bit);
  *  - eigensolver: A·v = λ·v residuals, orthonormality, descending
  *    order, Σλ = trace — the invariants that make an iterative
  *    no-oracle leg verifiable without a reference implementation;
  *  - ANN path: stage 2 must score with s_knn_brute's exact rounded
  *    cosine (bit-equality on shared ids), and the output is a
  *    deterministic 10-row frame.
  */
class PcaSpec extends GraftSpec {

  test("s_embed_cov equals the naive fixed-point covariance, bit for bit") {
    val got = Pca.embedCov(spark, Dir).collect()
      .map(r => ((r.getLong(0).toInt, r.getLong(1).toInt), r.getDouble(2))).toMap
    assert(got.size == 64 * 65 / 2)
    assert(got.keys.forall { case (i, j) => i <= j })

    val rows = spark.read.parquet(s"$Dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(_.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong).toArray)
    val n = rows.length
    val sx = Array.tabulate(64)(i => rows.map(r => BigInt(r(i))).sum)
    // the roundx mirror (half away from zero on the binary value)
    def r9(x: Double): Double = {
      val v = math.abs(x) * 1e9
      val fl = math.floor(v)
      math.signum(x) * (if (v - fl >= 0.5) fl + 1 else fl) / 1e9
    }
    for (i <- 0 until 64; j <- i until 64) {
      val sxy = rows.map(r => BigInt(r(i)) * BigInt(r(j))).sum
      val num = BigInt(n) * sxy - sx(i) * sx(j)
      val expect = r9(num.toDouble / (n.toDouble * n * 1e12))
      assert(math.abs(got((i, j)) - expect) <= 1e-15,
        s"cov($i,$j): got ${got((i, j))}, naive $expect")
    }
    // diagonal entries are variances
    assert((0 until 64).forall(i => got((i, i)) >= 0.0))
  }

  test("jacobi eigensolver: residuals, orthonormality, order, trace") {
    val a = Pca.covMatrix(spark, Dir)
    val (evals, evecs) = Pca.jacobiEigen(a)
    val n = a.length
    assert(evals.length == n && evecs.length == n)
    // descending eigenvalues
    assert(evals.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    // Σλ = trace
    val trace = (0 until n).map(i => a(i)(i)).sum
    assert(math.abs(evals.sum - trace) <= 1e-9, s"Σλ=${evals.sum} trace=$trace")
    // A·v = λ·v for the top components (the ones the ANN path uses)
    for (r <- 0 until Pca.R) {
      val v = evecs(r)
      val av = Array.tabulate(n)(i => (0 until n).map(k => a(i)(k) * v(k)).sum)
      val res = math.sqrt(av.zip(v).map { case (x, y) => val d = x - evals(r) * y; d * d }.sum)
      assert(res <= 1e-8, s"component $r residual $res")
    }
    // orthonormal rows
    for (r <- 0 until Pca.R; s <- r until Pca.R) {
      val d = evecs(r).zip(evecs(s)).map { case (x, y) => x * y }.sum
      val want = if (r == s) 1.0 else 0.0
      assert(math.abs(d - want) <= 1e-10, s"<v$r,v$s>=$d")
    }
  }

  test("s_pca: R rows, ratios in [0,1], mass descending") {
    val r = Pca.pcaComponents(spark, Dir).collect()
    assert(r.length == Pca.R)
    val ratios = r.map(_.getDouble(2))
    assert(ratios.forall(x => x >= 0.0 && x <= 1.0))
    assert(ratios.sliding(2).forall(p => p(0) >= p(1)))
    assert(r.map(_.getLong(0)).toSeq == (0L until Pca.R.toLong))
  }

  test("s_knn_pca: stage-2 cosines bit-equal to brute, deterministic 10 rows") {
    val pca = Pca.knnPca(spark, Dir).collect()
    assert(pca.length == 10)
    // every id must carry the identical rounded cosine — stage 2
    // evaluates the same expression tree as the brute baseline (the
    // top-10 oracle alone wouldn't cover ids outside brute's cut)
    val bruteAll = {
      import graft.functions.VectorFunctions._
      import graft.functions.Exact.roundx
      val t = graft.sources.Tables(spark, Dir)
      val q = t.embeddings.filter(col("vec_id") === 0)
        .select(toDouble(col("embedding")).as("qv"))
        .withColumn("qnrm", norm(col("qv")))
      t.embeddings.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
        .crossJoin(broadcast(q))
        .withColumn("cos", roundx(dot(col("v"), col("qv")) / (norm(col("v")) * col("qnrm")), 6))
        .select(col("vec_id"), col("cos")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    pca.foreach { r =>
      assert(bruteAll(r.getLong(0)) == r.getDouble(1),
        s"vec ${r.getLong(0)}: pca ${r.getDouble(1)} vs exact ${bruteAll(r.getLong(0))}")
    }
    // deterministic across plans
    val again = Pca.knnPca(spark, Dir).collect()
    assert(pca.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      again.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }
}
