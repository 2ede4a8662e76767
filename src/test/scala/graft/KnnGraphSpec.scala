package graft

import org.apache.spark.sql.functions._

import graft.similarity.Knn

/** kNN-graph invariants: the brute graph's shape and agreement with
  * the single-query baseline; the LSH-blocked graph's exactly-once
  * emission, bit-exact cosines, and measured recall floor.
  */
class KnnGraphSpec extends GraftSpec {

  private lazy val brute = Knn.knnGraph(spark, Dir).collect()
  private lazy val lsh = Knn.knnGraphLsh(spark, Dir).collect()

  test("brute graph: k rows per vector, ranks dense, vec-0 slice equals s_knn_brute") {
    val n = spark.read.parquet(s"$Dir/embeddings.parquet").count()
    val byVec = brute.groupBy(_.getLong(0))
    assert(byVec.size == n, "every vector gets a neighborhood")
    byVec.foreach { case (v, rows) =>
      assert(rows.length == 5, s"vec $v has ${rows.length} neighbors")
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to 5L), s"vec $v ranks not dense")
    }
    val zero = brute.filter(_.getLong(0) == 0).sortBy(_.getLong(3))
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val single = Knn.bruteForce(spark, Dir).collect().take(5)
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(zero == single, "graph slice for vec 0 diverged from s_knn_brute")
  }

  test("lsh graph: exactly-once pairs, cosines bit-equal to exact, recall floor") {
    // no (vec, neighbor) emitted twice — each pair can match at most
    // one probe bucket by construction
    val keys = lsh.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length == keys.length, "duplicate graph edge emitted")
    // emitted cosines are the exact rounded values (collect the small
    // test corpus and recompute on the driver)
    val vecs = spark.read.parquet(s"$Dir/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val x = d / (math.sqrt(na) * math.sqrt(nb))
      math.signum(x) * (math.floor(math.abs(x) * 1e6 + 0.5)) / 1e6
    }
    lsh.foreach { r =>
      val want = cos(vecs(r.getLong(0)), vecs(r.getLong(1)))
      assert(math.abs(r.getDouble(2) - want) <= 1e-9,
        s"edge (${r.getLong(0)},${r.getLong(1)}): ${r.getDouble(2)} vs $want")
    }
    // measured recall floor on the worst-case random corpus: blocked
    // candidates are a strict subset, so per-vector recall < 1 is
    // expected — but the multi-probe union must keep the MEAN above
    // a degenerate floor (bucket collapse would send this to ~0)
    val bruteSet = brute.map(r => (r.getLong(0), r.getLong(1))).toSet
    val hit = keys.count(bruteSet.contains)
    val recall = hit.toDouble / bruteSet.size
    assert(recall >= 0.15, s"mean graph recall $recall collapsed")
  }

  test("incremental refresh equals the direct build, row for row") {
    val inc = Knn.knnGraphRefresh(spark, Dir).collect().map(_.toSeq).toSet
    val full = brute.map(_.toSeq).toSet
    assert(inc == full, "incremental graph diverged from the direct build")
    // the fold must actually change neighborhoods vs the base-only
    // graph (otherwise the merge path went untested): some standing
    // vector must have picked up a batch neighbor
    val batchNeighbor = inc.exists(r =>
      r(0).asInstanceOf[Long] % 10 < 8 && r(1).asInstanceOf[Long] % 10 >= 8)
    assert(batchNeighbor, "no standing neighborhood was upgraded by the batch")
  }

  test("streaming graph refresh: two micro-batches equal the one-shot fold row for row") {
    // the merge property is batching-invariant: the 20% incoming split
    // arrives as TWO micro-batches here but ONE fold in
    // knnGraphRefresh — the final graphs must still agree exactly
    // (which also transitively pins the streamed graph to the direct
    // build via the refresh-equality test above)
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val raw = s.read.parquet(s"$Dir/embeddings.parquet")
    val g = new graft.similarity.StreamingKnnGraph(
      Knn.graphVecs(raw.filter(col("vec_id") % 10 < 8)))
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val query = g.start(stream.toDF().toDF("vec_id", "embedding"))
    try {
      def batch(m: Int) = raw.filter(col("vec_id") % 10 === m).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
      stream.addData(batch(8))
      query.processAllAvailable()
      stream.addData(batch(9))
      query.processAllAvailable()
      val streamed = g.snapshot.collect().map(_.toSeq).toSet
      val oneFold = Knn.knnGraphRefresh(spark, Dir).collect().map(_.toSeq).toSet
      assert(streamed == oneFold,
        "streamed graph diverged from the one-fold batch refresh")
    } finally query.stop()
  }

  test("mutual filter keeps exactly the reciprocated edges, canonical") {
    val mutual = Knn.knnGraphMutual(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val edges = brute.map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = edges.filter { case (a, b) => a < b && edges.contains((b, a)) }
    assert(mutual == expect, "mutual set diverged from reciprocated-edge definition")
    assert(mutual.nonEmpty, "no mutual edges on this corpus — filter untestable")
  }

  test("clustering: planted chains resolve to min-labeled components; corpus edges never span clusters") {
    import spark.implicits._
    // two planted mutual-edge chains over six vectors — CC must find
    // exactly the two groups with min-member labels and correct sizes
    val nodes = (0L until 6L).toDF("vec_id")
    val edges = Seq((0L, 1L), (1L, 2L), (3L, 4L), (4L, 5L)).toDF("a_id", "b_id")
    val got = Knn.clusterOfEdges(nodes, edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((0L, 0L, 3L), (1L, 0L, 3L), (2L, 0L, 3L),
      (3L, 3L, 3L), (4L, 3L, 3L), (5L, 3L, 3L)),
      s"planted cliques mislabeled: $got")
    // the registered query agrees with an independently-derived CC
    // over the mutual edge set on the real corpus
    val mutual = Knn.knnGraphMutual(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val clusters = Knn.clusterMutualKnn(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    mutual.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"edge ($a,$b) spans clusters") }
    // labels are min member ids: every cluster id labels itself
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min == cid, s"cluster $cid label is not its min member") }
  }

  test("lsh clustering: planted separated clusters match the exact path's labels") {
    import spark.implicits._
    // two tight direction clusters in 8 dims: A near e1, B near e3,
    // 6 vectors each (cluster size = k+1, so every exact top-5 stays
    // in-cluster); in-cluster cosine ≈ 1 vs cross ≈ 0, and near-
    // identical directions share hyperplane signatures, so the LSH
    // blocks find the same mutual edges and CC the same clusters
    val vecs = (0L until 12L).map { i =>
      val v = Array.fill(8)(0.0f)
      if (i < 6) { v(0) = 1.0f; v(1) = 0.01f * (i + 1) }
      else { v(2) = 1.0f; v(3) = 0.01f * (i - 5) }
      (i, v)
    }.toDF("vec_id", "embedding")
    val nodes = vecs.select(col("vec_id"))
    def labels(edges: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Knn.clusterOfEdges(nodes, edges).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exactG = Knn.knnGraphOf(Knn.graphVecs(vecs), 5)
    val lshG = Knn.knnGraphLshOf(vecs, 5)
    val exact = labels(Knn.mutualOf(exactG))
    val lsh = labels(Knn.mutualOf(lshG))
    assert(exact == lsh, s"lsh clusters diverge: exact=$exact lsh=$lsh")
    assert(exact.values.toSet == Set(0L, 6L),
      s"planted clusters mislabeled: ${exact.values.toSet}")
    // real corpus: every cluster id labels its own min member
    val real = Knn.clusterMutualKnnLsh(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    real.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min == cid, s"lsh cluster $cid label not min member") }
  }

  test("pagerank: cycle fixed point, star ordering, mass conservation, determinism") {
    import spark.implicits._
    val C = graft.similarity.Centrality
    // directed 6-cycle with out-degree 1: uniform rank 1.0 is the
    // exact fixed point (0.15 + 0.85·1 = 1) — every iterate stays there
    val cycle = (0L until 6L).map(i => (i, (i + 1) % 6)).toDF("src", "dst")
    val cr = C.pageRank(spark, cycle, outDeg = 1).collect()
    assert(cr.length == 6 && cr.forall(_.getDouble(1) == 1.0),
      s"cycle ranks ${cr.map(_.getDouble(1)).toSeq}")
    // star: leaves 1..5 all point at 0, hub points back at 1 (keeps
    // out-degree 1 everywhere): the hub must dominate every leaf
    val star = ((1L to 5L).map(i => (i, 0L)) :+ (0L, 1L)).toDF("src", "dst")
    val sr = C.pageRank(spark, star, outDeg = 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert((2L to 5L).forall(l => sr(0L) > sr(l)), s"hub not dominant: $sr")
    // registered query: deterministic across runs, ranks positive,
    // mass ≈ n (damped chains conserve up to the 9-dp round)
    val a = C.graphCentrality(spark, Dir).collect()
    val b = C.graphCentrality(spark, Dir).collect()
    assert(a.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      b.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    assert(a.length == 20 && a.forall(_.getDouble(1) > 0))
    assert(a.map(_.getDouble(1)).sliding(2).forall(p => p(0) >= p(1)))
  }
}
