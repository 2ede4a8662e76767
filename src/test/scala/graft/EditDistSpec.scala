package graft

import org.apache.spark.sql.functions._
import graft.dedup.EditDist

/** d_dedup_editdist: the Ed-Join staged plan must equal the naive
  * all-pairs levenshtein join exactly, including the micro-doc stratum
  * the gram count bound cannot cover. */
class EditDistSpec extends GraftSpec {
  import spark.implicits._

  private def naive(docs: org.apache.spark.sql.DataFrame, d: Int) = {
    val t = docs.select(col("doc_id"), col("text"), length(col("text")).as("len"))
    t.as("a").join(t.as("b"), col("a.doc_id") < col("b.doc_id") &&
        abs(col("a.len") - col("b.len")) <= d)
      .withColumn("ed", levenshtein(col("a.text"), col("b.text")))
      .filter(col("ed") <= d)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("ed").cast("bigint").as("ed"))
  }

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("staged pairs equal the naive join on the corpus") {
    val docs = graft.sources.Tables(spark, Dir).documents
    val staged = asSet(EditDist.stages(docs, d = 10).pairs)
    val expected = asSet(naive(docs, d = 10))
    assert(expected.nonEmpty, "corpus has no ed<=10 pairs - test is vacuous")
    assert(staged == expected,
      s"missed ${(expected -- staged).size}, extra ${(staged -- expected).size}")
  }

  test("micro-doc stratum: zero-shared-gram pairs within budget are found") {
    // two wholly different 10-char strings: ed = 10 <= d, but they share
    // no char gram — only the quadratic short stratum can emit this pair
    val docs = Seq(
      (1L, "abcdefghij"), (2L, "klmnopqrst"),
      (3L, "the quick brown fox jumps over the lazy dog again and again")
    ).toDF("doc_id", "text")
    val got = asSet(EditDist.stages(docs, d = 10).pairs)
    assert(got == asSet(naive(docs, d = 10)))
    assert(got.contains((1L, 2L, 10L)))
  }

  test("exact duplicates and boundary distances carry the exact ed") {
    val base = "a document long enough that every gram is rare here ok"
    val docs = Seq(
      (1L, base), (2L, base),                        // ed 0
      (3L, base + " plus exactly ten!"),             // +18 chars: ed 18 > 10, dropped
      (4L, base.replace("rare", "ra-e"))             // 1 substitution
    ).toDF("doc_id", "text")
    val got = asSet(EditDist.stages(docs, d = 10).pairs)
    assert(got == asSet(naive(docs, d = 10)))
    assert(got.contains((1L, 2L, 0L)) && got.contains((1L, 4L, 1L)))
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("prefix index is bounded: q*d+1 rows per doc regardless of length") {
    val docs = graft.sources.Tables(spark, Dir).documents
    val st = EditDist.stages(docs, d = 10)
    // collisions only reference indexed rows; the candidate side never
    // exceeds nDocs * (q*d+1) rows, so collision count is bounded by
    // rare-gram bucket sizes, not document length
    val n = st.collisions.count()
    val naivePairs = naive(docs, 10).count()
    assert(n > 0 && naivePairs > 0)
  }
}
