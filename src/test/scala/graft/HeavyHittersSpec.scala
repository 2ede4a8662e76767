package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.words
import graft.operators.CorpusStats

/** Misra–Gries heavy hitters vs the exact token counts.  The MG
  * guarantees hold under ANY partitioning/merge order, so this is the
  * honest contract to pin (the surviving set below the guarantee line
  * is merge-order-dependent and deliberately NOT asserted):
  *  - coverage: every token with true count > n/(k+1) is reported;
  *  - estimates are lower bounds, short by at most n/(k+1);
  *  - at most k rows come back.
  */
class HeavyHittersSpec extends GraftSpec {

  private val K = 32

  test("MG summary covers all true heavy hitters with bounded underestimates") {
    val docs = graft.sources.Tables(spark, Dir).documents
    val exact = docs.select(explode(words(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getAs[String]("token") -> r.getAs[Long]("cnt")).toMap
    val n = exact.values.sum
    val bound = n.toDouble / (K + 1)

    val got = CorpusStats.heavyHitters(spark, Dir, K)
      .collect().map(r => r.getAs[String]("token") -> r.getAs[Long]("est_count")).toMap
    assert(got.size <= K, s"summary returned ${got.size} > k=$K rows")

    val trueHeavy = exact.filter { case (_, c) => c > bound }.keySet
    assert(trueHeavy.nonEmpty, "degenerate corpus: no token above n/(k+1)")
    val missed = trueHeavy -- got.keySet
    assert(missed.isEmpty, s"MG missed true heavy hitters: $missed")

    got.foreach { case (t, est) =>
      val truth = exact.getOrElse(t, 0L)
      assert(est <= truth, s"$t estimate $est exceeds true count $truth")
      assert(truth - est <= bound + 1e-9,
        s"$t underestimate ${truth - est} exceeds n/(k+1)=$bound")
    }
  }

  test("graft_mg_topk is registered for SQL users") {
    graft.sources.Tables(spark, Dir).documents.createOrReplaceTempView("docs_mg")
    val rows = spark.sql(
      """SELECT h.token, h.est FROM (
        |  SELECT explode(graft_mg_topk(split(text, ' '), 8)) AS h FROM docs_mg
        |) t""".stripMargin).collect()
    assert(rows.nonEmpty && rows.length <= 8)
  }
}
