package graft

import org.apache.spark.sql.functions._

import graft.similarity.EmbedDrift

/** Drift-monitor invariants: a hand-computed controlled corpus (clean
  * half-unit values so quantization is exact), the planted-shift
  * detection story, the zero-variance NULL guard, and the registered
  * query's shape on the real table.
  */
class EmbedDriftSpec extends GraftSpec {

  test("hand mirror on a controlled corpus; zero-variance dim yields NULL z") {
    import spark.implicits._
    // base ids 0,1 (mod 10 < 8); incoming id 8.  dim0 drifts by +1.5,
    // dim1 is constant everywhere (var_base = 0 → NULL drift_z)
    val emb = Seq(
      (0L, Seq(0.5f, 1.0f)), (1L, Seq(1.5f, 1.0f)), (8L, Seq(2.5f, 1.0f)))
      .toDF("vec_id", "embedding")
    val r = EmbedDrift.driftOf(emb).orderBy("i").collect()
    assert(r.length == 2)
    val d0 = r(0)
    assert(d0.getLong(1) == 2 && d0.getLong(2) == 1)        // n_base, n_inc
    assert(d0.getDouble(3) == 1.0 && d0.getDouble(4) == 2.5) // means
    assert(d0.getDouble(5) == 0.25 && d0.getDouble(6) == 0.0) // variances
    assert(d0.getDouble(7) == 1.5)                           // mean_delta
    assert(d0.getDouble(8) == 3.0)                           // 1.5 / 0.5
    val d1 = r(1)
    assert(d1.getDouble(7) == 0.0)
    assert(d1.isNullAt(8), "zero-variance base must yield NULL drift_z")
  }

  test("streaming drift vs the moments index equals the batch operator") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val path = java.nio.file.Files
      .createTempDirectory("graft-driftwh-").toString + "/data"
    graft.similarity.PcaWarehouse.materialize(spark, Dir, path)
    val incoming = graft.sources.Tables(s, Dir).embeddings
      .filter(pmod(col("vec_id"), lit(10L)) >= 8)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val stream = MemoryStream[(Long, Seq[Float])]
    val got = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val query = graft.similarity.EmbedDrift.streamingDrift(stream.toDF()
      .withColumnRenamed("_1", "vec_id").withColumnRenamed("_2", "embedding"), path) {
      out => got ++= out.collect().map(_.toSeq)
    }
    try {
      stream.addData(incoming.toIndexedSeq) // ONE batch = the full incoming split
      query.processAllAvailable()
    } finally query.stop()
    val want = graft.similarity.EmbedDrift.embedDrift(spark, Dir)
      .collect().map(_.toSeq)
    assert(got.toSet == want.toSet,
      "streamed drift diverged from the batch operator")
    assert(got.size == 64)
  }

  test("real table: 64 dims, split sizes add up, no spurious drift") {
    val t = graft.sources.Tables(spark, Dir)
    val total = t.embeddings.count()
    val r = EmbedDrift.embedDrift(spark, Dir).collect()
    assert(r.length == 64)
    assert(r.forall(x => x.getLong(1) + x.getLong(2) == total))
    // same-distribution splits: z should be small everywhere (both
    // halves draw from one generator) — a loose sanity bound, not a
    // statistical claim
    assert(r.forall(x => !x.isNullAt(8) && x.getDouble(8) < 1.0),
      "same-distribution splits showing unit-scale drift")
  }
}
