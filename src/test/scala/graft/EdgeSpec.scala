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
}
