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
    assert(graft.sources.CommitLog.snapshot(spark, path).read(path).count() == 2 * 2145)
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
    assert(graft.sources.CommitLog.snapshot(spark, path).read(path).count() == 2145)
    assert(covMap(PcaWarehouse.cov(spark, path)) == before)
    // idempotent
    PcaWarehouse.compact(spark, path)
    assert(covMap(PcaWarehouse.cov(spark, path)) == before)
  }

  test("ANN leg: frozen projection bit-equality, dup at projection-distance 0, exact stage 2") {
    import org.apache.spark.sql.functions.pmod
    val path = tmp("ann")
    val e = graft.sources.Tables(spark, Dir).embeddings
    PcaWarehouse.materialize(spark, Dir, path)
    PcaWarehouse.trainProjector(spark, path)
    PcaWarehouse.refreshAnn(spark, e.filter(pmod(col("vec_id"), lit(10L)) < 8), path)
    PcaWarehouse.refreshAnn(spark, e.filter(pmod(col("vec_id"), lit(10L)) >= 8), path)
    // plant an exact duplicate of vec 0 as a refreshed-in newcomer:
    // the frozen projector must map identical input to the identical
    // projection (the index-level "duplicate sits at distance 0")
    val dup = e.filter(col("vec_id") === 0)
      .select((col("vec_id") + 99999L).as("vec_id"), col("embedding"))
    PcaWarehouse.refreshAnn(spark, dup, path)
    val proj = graft.sources.CommitLog.snapshot(spark, path)
      .read(path + ".proj").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(proj(99999L) == proj(0L), "duplicate projection differs from original")

    // standing refreshed rows are bit-equal to a frozen re-projection
    val again = PcaWarehouse.projectWith(
      e.filter(pmod(col("vec_id"), lit(10L)) >= 8),
      PcaWarehouse.projector(spark, path)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    again.foreach { case (id, p) =>
      assert(proj(id) == p, s"vec $id projection drifted from frozen") }

    // stage 2 emits the EXACT rounded cosine for every id it returns
    val r = PcaWarehouse.annProbe(spark, Dir, path).collect()
    assert(r.length == 10 && r.map(_.getLong(0)).distinct.length == 10)
    val exact = {
      import graft.functions.Exact.roundx
      import graft.functions.VectorFunctions._
      import org.apache.spark.sql.functions.broadcast
      val ev = e.select(col("vec_id"), toDouble(col("embedding")).as("v"))
      val q = ev.filter(col("vec_id") === 0)
        .select(col("v").as("qv"), norm(col("v")).as("qnrm"))
      ev.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
        .select(col("vec_id"),
          roundx(dot(col("v"), col("qv")) / (norm(col("v")) * col("qnrm")), 6).as("cos"))
        .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    }
    r.foreach(x => assert(exact(x.getLong(0)) == x.getDouble(1),
      s"vec ${x.getLong(0)}: probe ${x.getDouble(1)} vs exact ${exact(x.getLong(0))}"))
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

  test("RETRACT: negated moments == rebuild-on-survivors covariance, bit-for-bit") {
    val emb = sources.Tables(spark, Dir).embeddings
    val retracted = java.nio.file.Files
      .createTempDirectory("graft-pw-retr-").resolve("m").toString
    graft.similarity.PcaWarehouse.materializeFrom(
      emb.filter(pmod(col("vec_id"), lit(10L)) < 8), retracted)
    graft.similarity.PcaWarehouse.refresh(spark,
      emb.filter(pmod(col("vec_id"), lit(10L)) >= 8), retracted)
    graft.similarity.PcaWarehouse.retract(spark,
      emb.filter(pmod(col("vec_id"), lit(3L)) === 0), retracted)
    val rebuilt = java.nio.file.Files
      .createTempDirectory("graft-pw-rebuilt-").resolve("m").toString
    graft.similarity.PcaWarehouse.materializeFrom(
      emb.filter(pmod(col("vec_id"), lit(3L)) =!= 0), rebuilt)
    def covRows(p: String): Set[Seq[Any]] =
      graft.similarity.PcaWarehouse.cov(spark, p).collect().map(_.toSeq).toSet
    val r = covRows(retracted)
    assert(r.nonEmpty && r == covRows(rebuilt),
      "retracted covariance diverges from the rebuild on survivors — " +
        "the exact-forgetting claim fails")
  }
}
