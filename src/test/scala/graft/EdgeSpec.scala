package graft

import org.apache.spark.sql.functions._

/** Degenerate-input behavior of the iterative/pairwise operators —
  * the shapes a refactor breaks silently: empty edge sets, corpora
  * with no qualifying pairs, single-element inputs. */
class EdgeSpec extends GraftSpec {

  test("connected components with no edges: every node is its own group") {
    val s = spark
    import s.implicits._
    val nodes = Seq(1L, 2L, 3L).toDF("doc_id")
    val pairs = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    val out = dedup.Dedup.connectedComponents(nodes, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("ngram pipeline with no shared shingles emits no pairs") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b c d"), (2L, "e f g h")).toDF("doc_id", "text")
    assert(dedup.Dedup.ngramStages(docs, maxDfRatio = 0.5).pairs.count() == 0)
  }

  test("cosine pairs over a single vector is empty") {
    val s = spark
    import s.implicits._
    val e = Seq((0L, Seq.fill(64)(1.0))).toDF("vec_id", "v")
    assert(dedup.Dedup.cosinePairsFrom(e, 0.4, 2, 32).count() == 0)
  }

  test("frame sampling of an empty payload emits no rows (not an error)") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, ""), (2L, "abcd")).toDF("doc_id", "text")
    val f = multimodal.Multimodal.frameSampleOf(docs).collect()
    // empty doc contributes nothing; the sequence() boundary must not throw
    assert(f.map(_.getAs[Long]("doc_id")).toSet == Set(2L))
  }

  test("full-word 64-bit bands bucket correctly (mask must not wrap to 0)") {
    val s = spark
    import s.implicits._
    // two identical vectors + one orthogonal: with (1L<<64)-1 == 0 as
    // the mask every row would land in bucket 0 and the orthogonal
    // vector would become a candidate of everything
    val e = Seq(
      (0L, Seq.fill(64)(1.0)), (1L, Seq.fill(64)(1.0)),
      (2L, (0 until 64).map(i => if (i % 2 == 0) 1.0 else -1.0))
    ).toDF("vec_id", "v")
    val out = dedup.Dedup.cosinePairsFrom(e, threshold = 0.99,
        bitsPerBand = 64, bands = 2)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((0L, 1L)))
    intercept[IllegalArgumentException] {
      graft.functions.FirstMatchingBand(col("x"), col("y"), 65, 1)
    }
  }

  test("excision passes short docs (< n words, no grams) through intact") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "")).toDF("doc_id", "text")
    val out = dedup.Dedup.substringExciseOf(docs, n = 8).collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    // identical 3-word docs: no 8-gram exists, so nothing is flagged —
    // exact dedup owns them, excision must not touch them
    assert(out == Map(1L -> "a b c", 2L -> "a b c", 3L -> ""))
  }

  test("identical-corpus dedup collapses to one group") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "x y z w v"), (2L, "x y z w v"), (3L, "x y z w v"))
      .toDF("doc_id", "text")
    val pairs = dedup.Dedup.ngramStages(docs, maxDfRatio = 1.0).pairs
      .select(col("a_id"), col("b_id"))
    val groups = dedup.Dedup.connectedComponents(
        docs.select(col("doc_id")), pairs)
      .select(col("group_id")).distinct().count()
    assert(groups == 1)
  }

  test("MG with k=1 over one repeated token reports it exactly") {
    val s = spark
    import s.implicits._
    val out = Seq("x x x x", "x x").toDF("text")
      .agg(functions.MisraGries(split(col("text"), " "), 1).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.token"), col("h.est")).collect()
    // a single-token stream is the one input where k=1 is lossless
    assert(out.length == 1 && out(0).getString(0) == "x" && out(0).getLong(1) == 6L)
  }

  test("range search above the max cosine returns empty, not an error") {
    assert(similarity.Knn.rangeSearch(spark, Dir, tau = 1.01).count() == 0)
    assert(similarity.Knn.rangeSearchLsh(spark, Dir, tau = 1.01).count() == 0)
  }

  test("pq refine with a corpus-wide shortlist degenerates to exact brute force") {
    // shortlist >= n makes stage 1 a no-op filter — the two-stage
    // result must then equal brute force row for row, which pins the
    // stage-2 arithmetic mirror end to end
    val refined = similarity.Pq.pqRefine(spark, Dir, shortlist = 1000000)
      .collect().map(_.toSeq).toSeq
    val brute = similarity.Knn.bruteForce(spark, Dir)
      .collect().map(_.toSeq).toSeq
    assert(refined == brute)
  }

  test("domain cap larger than any source keeps every document") {
    val n = sources.Tables(spark, Dir).documents.count()
    assert(operators.TrainPrep.domainCap(spark, Dir, cap = 1000000).count() == n)
  }

  test("domain mix with all weight on one source keeps exactly that source") {
    val out = operators.TrainPrep.domainMix(spark, Dir,
        targets = Map("src0" -> 1000L), defaultTarget = 0L)
      .localCheckpoint()
    // zero-weight sources divide to keep_ppm 0 — and the m_scaled min
    // over (tokens*1e6 div 0) must not throw or win the min
    assert(out.filter(col("source") === "src0").filter(col("kept") === 0).count() == 0 ||
      out.filter(col("source") === "src0" && col("keep_ppm") < 1000000L).count() == 0)
    assert(out.filter(col("source") =!= "src0" && col("kept") === 1).count() == 0)
  }
}
