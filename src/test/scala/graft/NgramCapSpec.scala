package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Hot-shingle frequency cap (Dedup.ngramStages maxDfRatio) under an
  * adversarial boilerplate corpus, and exact-verified MinHash parity
  * with the AllPairs path.
  *
  * The adversarial corpus: 60 docs that are 18 words of shared
  * boilerplate plus a 4-word unique tail.  Their prefix windows are
  * 5 slots wide but only 4 unique-derived shingles exist per doc, so
  * one HOT shingle (the same one in every doc, by the global rarity
  * order) lands in every prefix — without the cap the candidate join
  * emits a collision for every one of the C(60,2)=1770 doc pairs,
  * none of which verifies (pairwise J = 16/24 ≈ 0.67 < 0.8).  With
  * the cap those collisions never materialize, and the one TRUE
  * near-dup pair (rare-shingle docs, J = 16/18 ≈ 0.89) is still
  * found because its shingles sit far below the cap.
  */
class NgramCapSpec extends GraftSpec {
  import spark.implicits._

  private lazy val corpus = {
    val boiler = (1 to 18).map(i => s"s$i").mkString(" ")
    val hotDocs = (0 until 60).map { i =>
      (i.toLong, boiler + " " + (1 to 4).map(j => s"u${i}_$j").mkString(" "))
    }
    val rare = (1 to 18).map(i => s"r$i").mkString(" ")
    val rareDocs = Seq((1000L, rare + " xx"), (1001L, rare + " yy"))
    (hotDocs ++ rareDocs).toDF("doc_id", "text")
  }

  test("uncapped prefix index explodes on boilerplate; cap bounds it") {
    val noCap = Dedup.ngramStages(corpus, maxDfRatio = 1.0)
    val capped = Dedup.ngramStages(corpus, maxDfRatio = 0.1)
    val noCapCollisions = noCap.collisions.count()
    val cappedCollisions = capped.collisions.count()
    assert(noCapCollisions >= 1770, s"expected hot-shingle blowup, got $noCapCollisions")
    assert(cappedCollisions < 100, s"cap failed to bound collisions: $cappedCollisions")
  }

  test("capped and uncapped outputs both equal the exact answer") {
    val expected = Set((1000L, 1001L, 0.8889))
    def resultSet(maxDf: Double) =
      Dedup.ngramStages(corpus, maxDfRatio = maxDf).pairs.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(resultSet(1.0) == expected)
    assert(resultSet(0.1) == expected)
  }

  test("minhashVerified matches the AllPairs ngram result exactly") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val allPairs = pairs(Dedup.ngramJaccard(spark, Dir))
    val viaLsh = pairs(Dedup.minhashVerified(spark, Dir))
    assert(allPairs.nonEmpty)
    assert(viaLsh == allPairs,
      s"minhash-LSH candidates missed ${(allPairs -- viaLsh).size} verified pairs")
  }

  // SimhashRecallSpec: d_dedup_simhash_verified is no-oracle BY
  // MEASUREMENT (true J>=0.8 pairs reach simhash hamming 9-11 on the
  // driver testdata, past the 4x15 pigeonhole's hamming<=3 guarantee —
  // a naive-join oracle would flake on the tail).  What the operator
  // DOES guarantee, asserted here: exact precision (output ⊆ the
  // AllPairs truth set, jaccard values identical), every miss sits in
  // the uncovered tail (hamming > 3 — a miss at <=3 would be an
  // implementation bug, not a sketch limit), and a recall floor.
  test("simhash-verified: exact precision, misses only in the hamming>3 tail") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val allPairs = pairs(Dedup.ngramJaccard(spark, Dir))
    val viaSimhash = pairs(Dedup.simhashVerified(spark, Dir))
    assert(allPairs.nonEmpty)
    assert((viaSimhash -- allPairs).isEmpty,
      s"verify stage must be exact; extras: ${viaSimhash -- allPairs}")
    val missedKeys = (allPairs -- viaSimhash).map(p => (p._1, p._2))
    if (missedKeys.nonEmpty) {
      // every miss must be pigeonhole-uncovered: hamming > 3
      val sk = graft.sources.Tables(spark, Dir).documents
        .select(col("doc_id"), graft.functions.SimHash64(
          graft.functions.TextFunctions.words(col("text"))).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      missedKeys.foreach { case (a, b) =>
        val h = java.lang.Long.bitCount(sk(a) ^ sk(b))
        assert(h > 3, s"pair ($a,$b) at hamming $h escaped — banding bug")
      }
    }
    val recall = (allPairs.size - missedKeys.size).toDouble / allPairs.size
    assert(recall >= 0.9, s"simhash-verified recall floor broken: $recall")
  }
}
