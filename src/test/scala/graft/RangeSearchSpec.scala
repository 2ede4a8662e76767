package graft

import org.apache.spark.sql.functions._
import graft.similarity.Knn

/** Range (radius) search: the LSH-banded plan must reproduce the
  * brute-force scan exactly on the fixed corpus + hyperplane seed —
  * that equality is what licenses holding s_range_search_lsh to the
  * same exact DuckDB oracle as s_range_search (the d_neardup_cosine
  * pairing).  Plus the structural properties a radius operator owes:
  * every returned pair clears the threshold (precision is exact by
  * construction) and the exactly-once band predicate emits no
  * duplicate (query, vector) rows.
  */
class RangeSearchSpec extends GraftSpec {

  test("LSH range search equals the brute-force scan on fixed data") {
    val brute = Knn.rangeSearch(spark, Dir).localCheckpoint()
    val lsh = Knn.rangeSearchLsh(spark, Dir).localCheckpoint()
    assert(brute.count() > 0, "degenerate: empty truth set proves nothing")
    assert(lsh.except(brute).count() == 0, "LSH returned a non-true pair")
    assert(brute.except(lsh).count() == 0, "LSH missed a true pair (recall < 1)")
  }

  test("every returned row clears the threshold; no duplicate (query, vector) rows") {
    val lsh = Knn.rangeSearchLsh(spark, Dir).localCheckpoint()
    assert(lsh.filter(col("cosine") < 0.3).count() == 0)
    assert(lsh.filter(col("query_id") === col("vec_id")).count() == 0)
    assert(lsh.groupBy(col("query_id"), col("vec_id"))
      .count().filter(col("count") > 1).count() == 0,
      "first-matching-band predicate emitted a pair twice")
  }
}
