package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusStats

/** The distributed BPE trainer must reproduce the single-machine
  * reference algorithm (Sennrich et al. 2016) EXACTLY: same pair
  * counts, same tie-breaks, same greedy left-to-right merges. */
class BpeSpec extends GraftSpec {

  /** Reference implementation: in-memory, one machine, no Spark. */
  private def refBpe(texts: Seq[String], rounds: Int): Seq[(Long, String, String, Long)] = {
    var docs = texts.map(_.split(" ").toVector)
    val hist = Seq.newBuilder[(Long, String, String, Long)]
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      docs.foreach { d =>
        d.indices.dropRight(1).foreach { i =>
          counts((d(i), d(i + 1))) = counts.getOrElse((d(i), d(i + 1)), 0L) + 1
        }
      }
      if (counts.isEmpty || counts.values.max < 2) done = true
      else {
        val ((a, b), n) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        hist += ((r + 1L, a, b, n))
        docs = docs.map { d =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < d.length) {
            if (i + 1 < d.length && d(i) == a && d(i + 1) == b) {
              out += s"$a $b"; i += 2
            } else { out += d(i); i += 1 }
          }
          out.result()
        }
        r += 1
      }
    }
    hist.result()
  }

  test("merge sequence equals the reference on a corpus with overlap traps") {
    val s = spark
    import s.implicits._
    // "x x x" exercises greedy non-overlap; "p q" vs "q p" exercises
    // the lexicographic tie-break; later rounds must treat merged
    // tokens ("p q") as single symbols
    val texts = Seq(
      "x x x x x", "p q r p q r", "q p q p", "p q p q",
      "r p q x x", "p q r x")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = CorpusStats.bpeMergesOf(s, docs, rounds = 6).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val want = refBpe(texts, rounds = 6)
    assert(got == want, s"\ngot:  $got\nwant: $want")
    assert(got.nonEmpty)
  }

  /** Reference encode: apply merges in rank order, each greedily
    * left to right — the loop BpeEncode runs natively. */
  private def refEncode(toks: Vector[String], merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(toks) { case (d, (a, b)) =>
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < d.length) {
        if (i + 1 < d.length && d(i) == a && d(i + 1) == b) {
          out += s"$a $b"; i += 2
        } else { out += d(i); i += 1 }
      }
      out.result()
    }

  test("BpeEncode equals chained BpeMergePair and the reference encode") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      "x x x x x", "p q r p q r", "q p q p", "p q p q",
      "r p q x x", "p q r x", "x")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = refBpe(texts, rounds = 5).map(h => (h._2, h._3))
    assert(merges.size >= 3, "trap corpus should yield several merges")
    val native = docs.select(col("doc_id"),
        graft.functions.BpeEncode(split(col("text"), " "), merges).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    val chained = merges.foldLeft(
        docs.select(col("doc_id"), split(col("text"), " ").as("toks"))) {
        case (df, (a, b)) =>
          df.select(col("doc_id"), graft.functions.BpeMergePair(col("toks"), a, b).as("toks"))
      }.collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    val ref = texts.zipWithIndex
      .map { case (t, i) => i.toLong -> refEncode(t.split(" ").toVector, merges) }.toMap
    assert(native == chained)
    assert(native == ref)
  }

  test("greedy rank-map apply == the R-sweep on trained merges; fallback engages otherwise") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(toks: Seq[String]): ArrayData =
      ArrayData.toArrayData(toks.map(UTF8String.fromString).toArray)
    def strs(a: ArrayData): Vector[String] =
      (0 until a.numElements()).map(i => a.getUTF8String(i).toString).toVector
    val texts = Seq(
      "x x x x x", "p q r p q r", "q p q p", "p q p q",
      "r p q x x", "p q r x", "x", "", "p", "p q")
    val merges = refBpe(texts.filter(_.nonEmpty), rounds = 6).map(h => (h._2, h._3))
    val expr = graft.functions.BpeEncode(
      org.apache.spark.sql.catalyst.expressions.Literal(null), merges)
    // a real trainer's list is training-ordered: the greedy path runs
    assert(expr.trainingOrdered, "trained merges must validate as training-ordered")
    texts.foreach { t =>
      val in = arr(if (t.isEmpty) Seq.empty else t.split(" ").toSeq)
      assert(strs(expr.compute(in)) == strs(expr.computeSweep(in)),
        s"greedy != sweep on '$t'")
    }
    // a hand-built list that VIOLATES training order (rank 0 consumes
    // rank 1's output) — here greedy-by-rank and the sweep genuinely
    // differ, so compute must take the sweep fallback: on [z, a, b]
    // the sweep passes rank 0 before "a b" exists (answer [z, "a b"]);
    // greedy would merge rank 1 first and then rank 0 ([z a b])
    val bad = Seq(("z", "a b"), ("a", "b"))
    val badExpr = graft.functions.BpeEncode(
      org.apache.spark.sql.catalyst.expressions.Literal(null), bad)
    assert(!badExpr.trainingOrdered)
    val zab = arr(Seq("z", "a", "b"))
    assert(strs(badExpr.compute(zab)) == Vector("z", "a b"),
      "non-training-ordered list must keep the sweep semantics")
    assert(strs(badExpr.compute(zab)) == strs(badExpr.computeSweep(zab)))
  }

  test("t_bpe_encode counts are consistent and the stream hash is deterministic") {
    val out = CorpusStats.bpeEncode(spark, Dir, rounds = 4)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // merges only ever shrink a doc, and every doc survives encoding
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1) && r.getLong(2) >= 1))
    assert(rows.exists(r => r.getLong(2) < r.getLong(1)),
      "4 corpus merges must compress at least one doc")
    val again = CorpusStats.bpeEncode(spark, Dir, rounds = 4).collect()
    assert(rows.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("merge sequence equals the reference on the real sf0.001 corpus") {
    val docs = sources.Tables(spark, Dir).documents
    val texts = docs.select(col("doc_id"), col("text"))
      .collect().sortBy(_.getLong(0)).map(_.getString(1)).toSeq
    val got = CorpusStats.bpeMerges(spark, Dir, rounds = 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == refBpe(texts, rounds = 4))
    assert(got.size == 4, s"corpus should support 4 merge rounds, got ${got.size}")
  }
}
