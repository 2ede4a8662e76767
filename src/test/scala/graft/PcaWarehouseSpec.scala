package graft

import org.apache.spark.sql.functions._

import graft.similarity.{Pca, PcaWarehouse}

/** PcaWarehouse contracts: the refresh fold is BIT-EQUAL to a
  * one-shot rebuild (associative integer moments — the strongest
  * equality in the warehouse matrix), the eigen probe rides the same
  * equality, and compaction merges deltas without perturbing probes.
  */
class PcaWarehouseSpec extends GraftSpec {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-pcawh-$tag-").toString + "/data"

  private def covMap(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
    df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

  test("materialize(base) + refresh(incoming) == one-shot moments over the union, bit for bit") {
    val path = tmp("refresh")
    val e = graft.sources.Tables(spark, Dir).embeddings
    PcaWarehouse.materialize(spark, Dir, path)
    PcaWarehouse.refresh(spark, e.filter(pmod(col("vec_id"), lit(10L)) >= 8), path)

    val got = covMap(PcaWarehouse.cov(spark, path))
    val want = covMap(Pca.covFrom(e))
    assert(got.size == 64 * 65 / 2 && want.size == got.size)
    assert(got == want, "warehouse cov diverged from one-shot")
    // delta layout really is append-only: two generations of rows
    // (2080 triangle + 64 dim sentinels + 1 count row each)
    assert(spark.read.parquet(path).count() == 2 * 2145)
  }

  test("pca probe equals the inline eigensolve over the full table") {
    val path = PcaWarehouse.builtPath(spark, Dir)
    val got = PcaWarehouse.pcaProbe(spark, Dir, path).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    val want = Pca.pcaComponents(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got == want)
  }

  test("compact merges deltas to one row per key; probes bit-identical") {
    val path = tmp("compact")
    val e = graft.sources.Tables(spark, Dir).embeddings
    PcaWarehouse.materializeFrom(e.filter(col("vec_id") % 2 === 0), path)
    PcaWarehouse.refresh(spark, e.filter(col("vec_id") % 2 === 1), path)
    val before = covMap(PcaWarehouse.cov(spark, path))
    PcaWarehouse.compact(spark, path)
    assert(spark.read.parquet(path).count() == 2145)
    assert(covMap(PcaWarehouse.cov(spark, path)) == before)
    // idempotent
    PcaWarehouse.compact(spark, path)
    assert(covMap(PcaWarehouse.cov(spark, path)) == before)
  }

  test("streaming refresh: any batching folds to the one-shot index, bit for bit") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val path = tmp("stream")
    val e = graft.sources.Tables(s, Dir).embeddings
    val rows = e.collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val stream = MemoryStream[(Long, Seq[Float])]
    val query = PcaWarehouse.streamingRefresh(stream.toDF()
      .withColumnRenamed("_1", "vec_id").withColumnRenamed("_2", "embedding"), path)
    try {
      val (b1, b2) = rows.splitAt(rows.length / 3)
      stream.addData(b1.toIndexedSeq)
      query.processAllAvailable()
      stream.addData(b2.toIndexedSeq)
      query.processAllAvailable()
    } finally query.stop()
    // associativity is the whole contract: the streamed index must
    // serve the identical covariance to the inline one-shot
    assert(covMap(PcaWarehouse.cov(spark, path)) == covMap(Pca.covFrom(e)))
  }
}
