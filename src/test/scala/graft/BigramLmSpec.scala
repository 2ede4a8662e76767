package graft

import org.apache.spark.sql.functions._

import graft.operators.BigramLm

/** Stupid-backoff bigram LM invariants: every scoring branch (first
  * token / bigram hit / backoff) checked against a hand-computed
  * mirror on a controlled corpus, held-out unseen-word smoothing, and
  * the registered query's shape on the real table.
  */
class BigramLmSpec extends GraftSpec {

  private def r9(x: Double): Double = {
    val v = math.abs(x) * 1e9
    val fl = math.floor(v)
    math.signum(x) * (if (v - fl >= 0.5) fl + 1 else fl) / 1e9
  }
  private def r6(x: Double): Double = {
    val v = math.abs(x) * 1e6
    val fl = math.floor(v)
    math.signum(x) * (if (v - fl >= 0.5) fl + 1 else fl) / 1e6
  }

  test("all three branches match the hand mirror on a controlled corpus") {
    import spark.implicits._
    // base docs 0, 1 (mod 10 < 8); held-out doc 8 carries unseen 'z'
    val docs = Seq((0L, "a b a b"), (1L, "a b c"), (8L, "a z"))
      .toDF("doc_id", "text")
    val got = BigramLm.perplexityBigramOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap

    // nb = 7 base tokens, V = {a,b,c,z} = 4 → denom 11
    // c1: a=3 b=3 c=1;  c2: (a,b)=3 (b,a)=1 (b,c)=1
    val denom = 11.0
    // the engine path: 9-dp token round, DECIMAL(30,6) sum (≈ 6-dp per
    // token — values here sit nowhere near a .5 tie), mean, 6-dp round
    def mean(xs: Seq[Double]): Double = r6(xs.map(x => r6(r9(x))).sum / xs.size)
    // doc 0 "a b a b": first=Laplace(a), then hits (a,b) (b,a) (a,b)
    val d0 = mean(Seq(-math.log(4 / denom), -math.log(3.0 / 3), -math.log(1.0 / 3),
      -math.log(3.0 / 3)))
    assert(got(0L)._1 == 4 && got(0L)._2 == 3)
    assert(math.abs(got(0L)._3 - d0) <= 1e-6, s"doc0 nll ${got(0L)._3} vs $d0")
    // doc 1 "a b c": Laplace(a), hit (a,b), hit (b,c)
    val d1 = mean(Seq(-math.log(4 / denom), -math.log(3.0 / 3), -math.log(1.0 / 3)))
    assert(got(1L)._1 == 3 && got(1L)._2 == 2)
    assert(math.abs(got(1L)._3 - d1) <= 1e-6)
    // doc 8 "a z": Laplace(a); (a,z) unseen → backoff to α·Laplace(z),
    // z itself unseen in base → c1 = 0
    val d8 = mean(Seq(-math.log(4 / denom), -math.log(0.4 * 1 / denom)))
    assert(got(8L)._1 == 2 && got(8L)._2 == 0)
    assert(math.abs(got(8L)._3 - d8) <= 1e-6, s"doc8 nll ${got(8L)._3} vs $d8")
  }

  test("held-out docs smooth instead of diverging; hits bounded by n-1") {
    val r = BigramLm.perplexityBigram(spark, Dir)
    val rows = r.collect()
    assert(rows.length == 500)
    assert(rows.forall(!_.isNullAt(3)), "null nll")
    assert(rows.forall(x => x.getDouble(3) > 0.0), "nll must be positive")
    // a doc can hit at most one bigram per adjacent pair
    assert(rows.forall(x => x.getLong(2) <= x.getLong(1) - 1))
    // MEASURED, not assumed: on this random word-soup corpus bigram
    // context carries no signal, so mean bigram nll lands a hair ABOVE
    // unigram (3.4086 vs 3.4067 — the α backoff penalty with nothing
    // to win back; the simhash "by measurement" precedent).  The
    // operator invariant worth pinning is that context is at least
    // OBSERVED — most adjacent pairs of base docs recur and hit c2
    val hitFrac = rows.map(x => x.getLong(2).toDouble).sum /
      rows.map(x => (x.getLong(1) - 1).toDouble).sum
    assert(hitFrac > 0.5, s"bigram hit fraction $hitFrac — model saw no context")
  }
}
