package graft

import graft.similarity.Bm25

/** BM25 + RRF fusion: the distributed inverted-index plan is pinned
  * against a from-scratch single-machine BM25 (the LogregSpec
  * reference-parity pattern), and the fusion against hand-computed
  * reciprocal-rank sums over the two legs' outputs. */
class Bm25Spec extends GraftSpec {

  private val K = 10

  private lazy val out = Bm25.bm25(spark, Dir, nQueries = 3, k = K).collect()

  test("matches a single-machine BM25 reference on every scored pair") {
    val docs = sources.Tables(spark, Dir).documents
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val n = docs.size
    val avgdl = docs.values.map(_.size).sum.toDouble / n
    val tf = docs.map { case (id, ws) => id -> ws.groupBy(identity).map { case (w, g) => w -> g.size } }
    val df = docs.values.flatMap(_.distinct).groupBy(identity).map { case (w, g) => w -> g.size }
    def score(q: Long, d: Long): Double = {
      val terms = (tf(q).keySet & tf(d).keySet).toSeq
      val parts = terms.map { t =>
        val idf = math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
        val x = idf * ((tf(d)(t) * 2.2) /
          (tf(d)(t) + 1.2 * (0.25 + 0.75 * (docs(d).size / avgdl))))
        // mirror roundx(·,9) + DECIMAL(30,6) quantization
        BigDecimal(math.rint(x * 1e9) / 1e9).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }
      parts.sum.toDouble
    }
    assert(out.nonEmpty)
    out.foreach { r =>
      val (q, d, got) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val want = math.rint(score(q, d) * 1e4) / 1e4
      assert(got == want, s"bm25($q,$d): got $got want $want")
    }
  }

  test("top-k is k rows per query, self excluded, rank-ordered by score") {
    val byQ = out.groupBy(_.getLong(0))
    byQ.foreach { case (q, rows) =>
      assert(rows.length <= K)
      assert(!rows.exists(_.getLong(1) == q), s"query $q retrieved itself")
      val sorted = rows.sortBy(_.getLong(3))
      assert(sorted.map(r => (-r.getDouble(2), r.getLong(1))).toSeq ==
        sorted.map(r => (-r.getDouble(2), r.getLong(1))).sortBy(identity).toSeq,
        s"query $q rank order violates (score desc, doc_id)")
    }
  }

  test("rrf fusion equals hand-computed reciprocal-rank sums of the two legs") {
    val fused = Bm25.hybridRrf(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getLong(3)))).toMap
    assert(fused.nonEmpty)
    val lex = Bm25.bm25(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val vec = similarity.Knn.knnBatch(spark, Dir, 10, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    fused.foreach { case (key, (rrf, nLegs)) =>
      val ranks = Seq(lex.get(key), vec.get(key)).flatten
      assert(ranks.size == nLegs, s"$key n_legs")
      val want = ranks.map { r =>
        BigDecimal(math.rint(1.0 / (60 + r) * 1e9) / 1e9)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
      assert(rrf == math.rint(want * 1e6) / 1e6, s"$key rrf $rrf want $want")
    }
    // a doc found by BOTH legs at equal rank outranks a doc found by one
    val both = fused.filter(_._2._2 == 2)
    info(s"pairs on both legs: ${both.size} of ${fused.size}")
  }
}
