package graft

import org.apache.spark.sql.functions._
import graft.dedup.MinHashWarehouse
import graft.functions.VectorFunctions.toDouble
import graft.operators.LmWarehouse
import graft.similarity.{Bm25Warehouse, IvfWarehouse, LshWarehouse, PqWarehouse}

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

  private lazy val vecs = sources.Tables(spark, Dir).embeddings
    .select(col("vec_id"), toDouble(col("embedding")).as("v"))
  private lazy val vBase = vecs.filter(pmod(col("vec_id"), lit(10)) < 8)
  private lazy val vBatch = vecs.filter(pmod(col("vec_id"), lit(10)) >= 8)
    // fresh ids so batch rows are distinguishable appends, plus a
    // planted exact duplicate of query vector 0 — after refresh the
    // serving path MUST surface it at cosine 1.0
    .select((col("vec_id") + 100000L).as("vec_id"), col("v"))
    .unionByName(vecs.filter(col("vec_id") === 0)
      .select(lit(200000L).as("vec_id"), col("v")))

  test("lsh: refresh(batch) probe == one-shot(base ∪ batch) probe") {
    val inc = tmp("graft-lshw-inc-")
    LshWarehouse.materializeFrom(vBase, inc)
    LshWarehouse.refresh(vBatch, inc)
    val ref = tmp("graft-lshw-ref-")
    LshWarehouse.materializeFrom(vBase.unionByName(vBatch), ref)
    def run(path: String) = LshWarehouse.rangeProbe(spark, path)
      .collect().map(_.toSeq).toSet
    val got = run(inc)
    assert(got.nonEmpty)
    assert(got == run(ref))
    // the planted duplicate of query 0 is an appended row at cosine 1.0
    assert(got.contains(Seq(0L, 200000L, 1.0)),
      "appended exact-dup not surfaced by the range probe")
  }

  test("ivf: appended rows are the frozen-centroid assignment; probe serves them") {
    val inc = tmp("graft-ivfw-inc-")
    IvfWarehouse.materializeFrom(vBase, inc)
    def snap() = sources.CommitLog.snapshot(spark, inc)
    val before = snap().read(inc)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    IvfWarehouse.refresh(spark, vBatch, inc)
    val after = snap().read(inc)
      .select(col("vec_id"), col("cid"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cid")).toMap
    assert(before.subsetOf(after.keySet), "standing rows lost by refresh")
    // appended assignments == the same frozen-centroid argmin inline
    val expected = graft.similarity.Knn
      .assignTo(vBatch, snap().read(inc + ".centroids"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cid")).toMap
    expected.foreach { case (id, cid) =>
      assert(after.get(id).contains(cid), s"vec $id: cid ${after.get(id)} != $cid")
    }
    // the planted exact dup of query 0 must serve at cosine 1.0 (the
    // query's own standing row, also at 1.0, wins the id tiebreak)
    val qv = vecs.filter(col("vec_id") === 0).head().getSeq[Double](1).toArray
    val top = IvfWarehouse.probe(spark, inc, qv).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.take(2).toSet == Set((0L, 1.0), (200000L, 1.0)),
      s"planted dup not served at cosine 1.0: ${top.take(3).toSeq}")
  }

  test("ivf: retract == rebuild-on-survivors under the frozen quantizer; compact is probe-bit-invariant") {
    val qv = vecs.filter(col("vec_id") === 0).head().getSeq[Double](1).toArray
    def run(path: String) = IvfWarehouse.probe(spark, path, qv, k = 10)
      .collect().map(_.toSeq).toSeq

    val p = tmp("graft-ivfw-retr-")
    IvfWarehouse.materializeFrom(vBase, p)
    IvfWarehouse.refresh(spark, vBatch, p)
    val full = run(p)
    // the slice over the INDEX's own id set (vBatch ids are shifted)
    val removed = vBase.select(col("vec_id"))
      .unionByName(vBatch.select(col("vec_id")))
      .filter(pmod(col("vec_id"), lit(13)) === 4)
    IvfWarehouse.retract(removed, p)
    val got = run(p)
    assert(got != full, "degenerate: the retraction removed no served vector")
    assert(got.forall(r => r(0).asInstanceOf[Long] % 13 != 4),
      "a tombstoned vector still serves")

    // reference: the SAME frozen centroids, posting lists re-assigned
    // from the survivors only (FAISS remove_ids semantics) — written
    // through the same committed layout the probe reads
    val ref = tmp("graft-ivfw-retr-ref-")
    val pSnap = sources.CommitLog.snapshot(spark, p)
    val survivors = vBase.unionByName(vBatch)
      .join(removed, Seq("vec_id"), "left_anti")
    sources.CommitLog.transaction(spark, ref) { t =>
      t.replace(graft.similarity.Knn.assignTo(survivors,
        pSnap.read(p + ".centroids")), ref, Seq("cid"))
      t.replace(pSnap.read(p + ".centroids"), ref + ".centroids")
    }
    assert(got == run(ref),
      "retracted probe diverges from rebuild-on-survivors under the frozen quantizer")

    // physical purge: bit-invariant probe, no tombstoned row on disk
    IvfWarehouse.compact(spark, p)
    assert(run(p) == got, "compact changed the probe")
    assert(sources.CommitLog.snapshot(spark, p).read(p)
      .filter(pmod(col("vec_id"), lit(13)) === 4).count() == 0,
      "compact left tombstoned postings behind")
  }

  test("pq: appended codes equal the frozen-codebook encoding; probe stays pruned") {
    val inc = tmp("graft-pqw-inc-")
    // PqWarehouse.materialize trains from the dir's full corpus; here
    // build base-only via the same internals: materialize to a temp
    // then re-materialize is overkill — instead materialize full-dir
    // and refresh a DISJOINT synthetic batch (ids offset, incl. the
    // planted dup), asserting append-exactness and serving
    PqWarehouse.materialize(spark, Dir, inc)
    def pqSnap() = sources.CommitLog.snapshot(spark, inc)
    val before = pqSnap().read(inc)
      .select(col("vec_id")).distinct().collect().map(_.getLong(0)).toSet
    PqWarehouse.refresh(spark, vBatch, inc)
    val rows = pqSnap().read(inc)
      .select(col("vec_id"), col("m"), col("code"), col("cid"))
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("m")) ->
        (r.getAs[Int]("code"), r.getAs[Int]("cid"))).toMap
    assert(before.subsetOf(rows.keys.map(_._1).toSet), "standing rows lost")
    // appended codes == frozen-codebook encode + frozen-centroid assign
    val cb = pqSnap().read(inc + ".codebook")
    val cents = pqSnap().read(inc + ".centroids")
    val expCodes = graft.similarity.Pq.encodeWith(vBatch, cb)
      .collect().map(r => (r.getLong(0), r.getAs[Int]("m")) -> r.getAs[Int]("code")).toMap
    val expCids = graft.similarity.Knn.assignTo(vBatch, cents)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cid")).toMap
    expCodes.foreach { case ((id, m), code) =>
      assert(rows.get((id, m)).contains((code, expCids(id))),
        s"vec $id m=$m: ${rows.get((id, m))} != (${code}, ${expCids(id)})")
    }
    // the planted dup codes identically to vec 0 (same vector, same
    // frozen codebook) — the strongest deterministic claim ADC allows
    (0 until 8).foreach { m =>
      assert(rows((200000L, m))._1 == rows((0L, m))._1,
        s"planted dup codes differ from vec 0 at m=$m")
    }
    // probe still prunes cid partitions after the append
    val qv = vecs.filter(col("vec_id") === 0).head().getSeq[Double](1).toArray
    val probe = PqWarehouse.probe(spark, inc, qv, excludeId = 0L)
    val physical = probe.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters") && physical.contains("cid"))
    assert(probe.collect().length == 10)
  }

  test("pq: retract == codes re-encoded from the survivors under frozen quantizers; compact physical") {
    val qv = vecs.filter(col("vec_id") === 0).head().getSeq[Double](1).toArray
    def run(path: String) = PqWarehouse
      .probe(spark, path, qv, k = 10, excludeId = 0L)
      .collect().map(_.toSeq).toSeq
    val p = tmp("graft-pqw-retr-")
    PqWarehouse.materialize(spark, Dir, p)
    val full = run(p)
    // remove every served non-query vector's residue class so the
    // retraction visibly bites
    val victim = full.head(0).asInstanceOf[Long]
    val removed = vecs.filter(pmod(col("vec_id"), lit(13)) === victim % 13)
      .filter(col("vec_id") =!= 0).select(col("vec_id"))
    PqWarehouse.retract(removed, p)
    val got = run(p)
    assert(got != full, "degenerate: the retraction removed no served vector")
    val removedIds = removed.collect().map(_.getLong(0)).toSet
    assert(got.forall(r => !removedIds(r(0).asInstanceOf[Long])),
      "a tombstoned vector still serves")
    // reference: survivors re-encoded/assigned with the SAME frozen
    // codebook + centroids, written through the committed layout
    val ref = tmp("graft-pqw-retr-ref-")
    val pSnap = sources.CommitLog.snapshot(spark, p)
    val survivors = vecs.join(removed, Seq("vec_id"), "left_anti")
    sources.CommitLog.transaction(spark, ref) { t =>
      t.replace(graft.similarity.Pq.encodeWith(survivors, pSnap.read(p + ".codebook"))
        .join(graft.similarity.Knn.assignTo(survivors, pSnap.read(p + ".centroids"))
          .select(col("vec_id"), col("cid")), Seq("vec_id")), ref, Seq("cid"))
      t.replace(pSnap.read(p + ".codebook"), ref + ".codebook")
      t.replace(pSnap.read(p + ".centroids"), ref + ".centroids")
    }
    assert(got == run(ref),
      "retracted PQ probe diverges from rebuild-on-survivors under frozen quantizers")
    // physical purge, probe-bit-invariant
    PqWarehouse.compact(spark, p)
    assert(run(p) == got, "compact changed the probe")
    assert(sources.CommitLog.snapshot(spark, p).read(p)
      .join(removed, Seq("vec_id"), "left_semi").count() == 0,
      "compact left tombstoned codes behind")
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
