package graft

import org.apache.spark.sql.functions._
import graft.dedup.MinHashWarehouse
import graft.operators.LmWarehouse
import graft.similarity.Bm25Warehouse

/** Incremental warehouse refresh — the last step of the crawl loop:
  * folding an accepted batch into each index at rest must be
  * indistinguishable from re-materializing the whole index over
  * base ∪ batch.  Probes after refresh are compared bit-for-bit
  * against probes of the one-shot reference index. */
class WarehouseRefreshSpec extends GraftSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/index"

  private lazy val docs = sources.Tables(spark, Dir).documents
  private lazy val base = docs.filter(pmod(col("doc_id"), lit(10)) < 8)
  private lazy val batchA = docs.filter(pmod(col("doc_id"), lit(10)) === 8)
  private lazy val probeB = docs.filter(pmod(col("doc_id"), lit(10)) === 9)
    .select(col("doc_id"), col("text"))

  test("minhash: refresh(batch) probe == one-shot(base ∪ batch) probe") {
    // the generated corpus has ZERO cross-generation (B→A) near-dup
    // pairs (measured), so plant one: an A-batch doc that exactly
    // duplicates a B doc — after refresh, B MUST match it at J = 1.0
    val planted = probeB.orderBy(col("doc_id")).limit(1)
      .select(lit(1000008L).as("doc_id"), col("text"))
    val batch = batchA.select(col("doc_id"), col("text")).unionByName(planted)
    val inc = tmp("graft-mhw-inc-")
    MinHashWarehouse.materialize(spark, Dir, inc)
    MinHashWarehouse.refresh(batch, inc)
    val ref = tmp("graft-mhw-ref-")
    // one-shot reference: same union, ids shifted so the internal
    // base filter keeps them (doc_id*10 ≡ 0 mod 10), then unshifted
    MinHashWarehouse.materializeFrom(
      base.select(col("doc_id"), col("text")).unionByName(batch)
        .withColumn("doc_id", col("doc_id") * 10), ref)
    def probe(path: String, unshift: Boolean) = {
      val out = MinHashWarehouse.probeAgainst(spark, probeB, path)
      (if (unshift)
        out.withColumn("base_id", (col("base_id") / 10).cast("long"))
      else out)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    val got = probe(inc, unshift = false)
    assert(got.nonEmpty, "vacuous: generation B matched nothing")
    assert(got == probe(ref, unshift = true))
    // the refreshed index must surface matches against APPENDED docs,
    // not just the standing base
    assert(got.exists(p => p._2 == 1000008L && p._3 == 1.0),
      "B did not match the planted appended doc: refresh not exercised")
  }

  test("bm25: refresh(batch) probe == one-shot(base ∪ batch) probe, bit-exact") {
    val inc = tmp("graft-bm25w-inc-")
    Bm25Warehouse.materialize(spark, Dir, inc)
    Bm25Warehouse.refresh(spark, batchA, inc)
    val ref = tmp("graft-bm25w-ref-")
    Bm25Warehouse.materializeFrom(spark, base.unionByName(batchA), ref)
    val queries = probeB.filter(col("doc_id") < 1000)
      .select(col("doc_id").as("query_id"),
        explode(graft.functions.TextFunctions.words(col("text"))).as("term"))
      .distinct()
    def run(path: String) = Bm25Warehouse.probe(spark, path, queries)
      .collect().map(_.toSeq).toSet
    val got = run(inc)
    assert(got.nonEmpty)
    assert(got == run(ref))
    // refreshed docs are retrievable: some result doc is an A-doc
    assert(got.exists(_(1).asInstanceOf[Long] % 10 == 8),
      "no appended doc retrieved: refresh not exercised")
  }

  test("lm: refresh(batch) probe == one-shot(base ∪ batch) probe, bit-exact") {
    val inc = tmp("graft-lmw-inc-")
    LmWarehouse.materialize(spark, Dir, inc)
    LmWarehouse.refresh(spark, batchA, inc)
    val ref = tmp("graft-lmw-ref-")
    LmWarehouse.materializeFrom(base.unionByName(batchA), ref)
    val probeDocs = probeB.filter(col("doc_id") < 1000)
    def run(path: String) = LmWarehouse.probe(spark, path, probeDocs)
      .collect().map(_.toSeq).toSet
    val got = run(inc)
    assert(got.nonEmpty)
    assert(got == run(ref))
  }

  test("lm: double refresh accumulates (stats and counts fold twice)") {
    val inc = tmp("graft-lmw-inc2-")
    LmWarehouse.materialize(spark, Dir, inc)
    LmWarehouse.refresh(spark, batchA, inc)
    LmWarehouse.refresh(spark, probeB, inc)
    val ref = tmp("graft-lmw-ref2-")
    LmWarehouse.materializeFrom(
      base.select(col("doc_id"), col("text"))
        .unionByName(batchA.select(col("doc_id"), col("text")))
        .unionByName(probeB), ref)
    import spark.implicits._
    val oov = Seq((1L, "zzq1 zzq2 zzq3")).toDF("doc_id", "text")
    // the UNK mass depends ONLY on (nb, v): equality here pins the
    // incrementally-maintained stats to the one-shot truth
    val a = LmWarehouse.probe(spark, inc, oov).collect().map(_.toSeq)
    val b = LmWarehouse.probe(spark, ref, oov).collect().map(_.toSeq)
    assert(a.sameElements(b))
  }
}
