package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.toDouble
import graft.similarity.Kmeans

/** Lloyd invariants of the spherical k-means trainer — the properties
  * a value-level oracle can't express (iterative training isn't a SQL
  * query): monotone cost, full first-round assignment, a live codebook,
  * and bit-deterministic history across runs. */
class KmeansSpec extends GraftSpec {

  private def embeddings = graft.sources.Tables(spark, Dir).embeddings
    .select(col("vec_id"), toDouble(col("embedding")).as("v"))

  test("cost is monotonically non-increasing across iterations") {
    val (_, hist) = Kmeans.train(embeddings, k = 16, iters = 4)
    val rows = hist.orderBy(col("iter")).collect()
    assert(rows.length == 4)
    val costs = rows.map(_.getAs[Double]("cost"))
    costs.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-9, s"cost increased: ${costs.mkString(", ")}")
    }
    assert(rows(0).getAs[Long]("n_moved") == embeddings.count(),
      "first iteration must assign every vector")
  }

  test("codebook has K centroids and every cluster is non-empty") {
    val (cents, _) = Kmeans.train(embeddings, k = 16, iters = 3)
    assert(cents.count() == 16)
    // final assignment against the trained codebook covers all 16 cids
    val assigned = embeddings.crossJoin(broadcast(cents))
      .withColumn("dist",
        -graft.functions.VectorFunctions.dot(col("v"), col("cv")))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("dist"), col("cid"))).as("best"))
      .select(col("best.cid").as("cid"))
    assert(assigned.distinct().count() == 16)
  }

  test("history is bit-deterministic across runs") {
    val a = Kmeans.kmeansHistory(spark, Dir).orderBy(col("iter")).collect()
    val b = Kmeans.kmeansHistory(spark, Dir).orderBy(col("iter")).collect()
    assert(a.toSeq == b.toSeq)
  }
}
