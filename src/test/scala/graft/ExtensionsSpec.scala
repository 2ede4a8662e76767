package graft

import org.apache.spark.sql.functions._
import graft.functions.{MinHashSig, SimHash64}
import graft.functions.TextFunctions.words

/** GraftExtensions: the SQL surface of the native expression layer.
  * SQL calls must produce IDENTICAL results to the Column API — they
  * build the same expression trees. */
class ExtensionsSpec extends GraftSpec {

  test("graft_dot and graft_cosine are callable from SQL") {
    val r = spark.sql(
      "SELECT graft_dot(array(1d,2d,3d), array(4d,5d,6d)) AS d, " +
        "graft_roundx(graft_cosine(array(1d,2d), array(1d,2d)), 9) AS c").head()
    assert(r.getDouble(0) == 32.0)
    assert(r.getDouble(1) == 1.0)
  }

  test("graft_gram_hashes_pos and graft_top_token_count match the Column API") {
    val docs = sources.Tables(spark, Dir).documents.limit(50)
      .select(col("doc_id"), words(col("text")).as("ws"))
    docs.createOrReplaceTempView("ext_docs_pos")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_gram_hashes_pos(ws, 3) AS gp,
        |       graft_top_token_count(ws) AS tc FROM ext_docs_pos""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
    val viaCol = docs.select(col("doc_id"),
      graft.functions.GramHashes.positional(col("ws"), 3).as("gp"),
      graft.functions.TopTokenCount(col("ws")).as("tc"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
    assert(viaSql.toSeq == viaCol.toSeq)
  }

  test("graft_bpe_merge rewrites greedily left-to-right, non-overlapping") {
    val r = spark.sql(
      "SELECT graft_bpe_merge(array('x','x','x','y'), 'x', 'x') AS m").head()
    assert(r.getSeq[String](0) == Seq("x x", "x", "y"))
    // pair is a plan constant: non-literal args must be rejected
    intercept[Exception] {
      spark.sql("SELECT graft_bpe_merge(array('a'), concat('a',''), 'b')").head()
    }
  }

  test("graft_simhash/graft_minhash match the Column API row for row") {
    val docs = sources.Tables(spark, Dir).documents.limit(50)
      .select(col("doc_id"), words(col("text")).as("ws"))
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_simhash(ws) AS sh, graft_minhash(ws, 3, 128) AS mh,
        |       graft_minhash_bands(ws, 3, 128, 32) AS mb
        |FROM ext_docs""".stripMargin)
    val viaCol = docs.select(col("doc_id"), SimHash64(col("ws")).as("sh"),
      MinHashSig(col("ws"), 3, 128).as("mh"),
      MinHashSig.bandHashes(col("ws"), 3, 128, 32).as("mb"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
    val one = viaSql.head()
    assert(one.getSeq[Long](2).length == 128 && one.getSeq[Long](3).length == 32)
  }

  test("round-3 gram/signature functions are callable from SQL and match the Column API") {
    val docs = sources.Tables(spark, Dir).documents.limit(50)
      .select(col("doc_id"), words(col("text")).as("ws"))
    docs.createOrReplaceTempView("ext_docs3")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_dupgram_frac(ws, 2) AS df,
        |       graft_gram_hashes(ws, 3) AS gh
        |FROM ext_docs3""".stripMargin)
    val viaCol = docs.select(col("doc_id"),
      graft.functions.DupGramFrac(col("ws"), 2).as("df"),
      graft.functions.GramHashes(col("ws"), 3).as("gh"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
    // wide signature + band agreement: a signature always agrees with
    // itself at band 0
    val r = spark.sql(
      """SELECT graft_first_matching_band(
        |  graft_hyperplane_sig(array(1d,2d,3d), 128, 3),
        |  graft_hyperplane_sig(array(1d,2d,3d), 128, 3), 8, 16) AS b""".stripMargin).head()
    assert(r.getLong(0) == 0L)
  }

  test("graft_roundx rounds the binary value (DuckDB semantics)") {
    // 307.03/8 = 38.378749999…; Spark's round() says 38.3788 (decimal
    // shortest-repr), binary rounding must say 38.3787
    val r = spark.sql(
      "SELECT graft_roundx(307.03d/8, 4) AS gx, round(307.03d/8, 4) AS sp").head()
    assert(r.getDouble(0) == 38.3787)
    assert(r.getDouble(1) == 38.3788)
  }

  test("graft_sumx aggregates order-independently in SQL") {
    val r = spark.sql(
      "SELECT graft_sumx(x) AS s FROM VALUES (0.1d),(0.2d),(0.3d) AS t(x)").head()
    assert(r.getDouble(0) == 0.6)
  }

  test("graft_kll sketch/merge/quantile compose in SQL within the rank bound") {
    // 0..9999 in two sketched halves, merged: p50 must land within the
    // k=200 rank bound (~1.3%) of 5000.  Deliberately the NATURAL call
    // forms — a bare 0.5 (DECIMAL literal) and a raw BIGINT column —
    // pinning the construction-time double coercion a review flagged
    val r = spark.sql(
      """SELECT graft_kll_quantile(graft_kll_merge(sk, 200), 0.5) AS p50
        |FROM (SELECT graft_kll_sketch(id, 200) AS sk
        |FROM range(10000) GROUP BY id % 2)""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 5000.0) <= 200.0,
      s"merged p50 ${r.getDouble(0)} outside rank bound")
  }

  test("shape parameters must be integer literals") {
    val err = intercept[Exception] {
      spark.sql("SELECT graft_minhash(array('a','b','c','d'), 3, id + 1) " +
        "FROM range(1)").collect()
    }
    assert(err.getMessage.contains("literal") ||
      err.getCause != null && err.getCause.getMessage.contains("literal"))
  }
}
