package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.operators.{BalanceWarehouse, RichlistWarehouse, Staking}
import graft.sources.Tables

/** The top-k warehouse contract — the order-statistic shape:
  * refresh is bit-equal to rebuild by the truncation-semilattice
  * identity topK(A ∪ B) == topK(topK(A) ∪ topK(B)); the probe equals
  * the inline q_richlist row-for-row (the verbatim-oracle claim); a
  * retraction missing every buffer is pure tombstone (NO upstream
  * read — plan-asserted); a retraction hitting a buffer refills ONLY
  * the dirty denoms and still equals the rebuild-on-survivors; compact
  * is probe-invariant and physically truncates.
  */
class RichlistWarehouseSpec extends GraftSpec {

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-richw-$tag").resolve("idx").toString

  private def allRows = RichlistWarehouse.rowsOf(
    spark, Dir, Tables(spark, Dir).customer)

  private def topkRows(path: String): Set[(String, Long, String, Double)] =
    RichlistWarehouse.mergedTopK(spark, path).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .toSet

  /** 100 accounts in one denom, bal == custkey — K=20 TRUNCATES (the
    * real-data SF has ~6 accounts per denom, so truncation semantics
    * need a planted frame; the oracle-share tests below stay on the
    * real tables). */
  private def planted = {
    val s = spark
    import s.implicits._
    (1L to 100L).map(k => ("D", k, s"acc$k", k.toDouble))
      .toDF("denom", "custkey", "name", "bal")
  }

  test("refresh equals the one-shot rebuild — the truncation-semilattice identity") {
    // split so each batch's OWN top-20 is a strict subset of its rows
    // and the merged top-20 draws from both (evens 82..100 + odds 81..99)
    val a = tmp("refresh")
    RichlistWarehouse.refresh(planted.filter(col("custkey") % 2 === 0), a)
    RichlistWarehouse.refresh(planted.filter(col("custkey") % 2 === 1), a)
    val one = tmp("oneshot")
    RichlistWarehouse.refresh(planted, one)
    assert(topkRows(a) == topkRows(one),
      "merged buffers diverge from the one-shot top-K")
    assert(topkRows(a).map(_._2) == (81L to 100L).toSet,
      "planted top-20 should be custkeys 81..100")
    // and the same identity on the real tables (arbitrary batching)
    val ra = tmp("refresh-real")
    RichlistWarehouse.refresh(
      allRows.filter(pmod(col("custkey"), lit(10L)) < 8), ra)
    RichlistWarehouse.refresh(
      allRows.filter(pmod(col("custkey"), lit(10L)) >= 8), ra)
    val rone = tmp("oneshot-real")
    RichlistWarehouse.refresh(allRows, rone)
    assert(topkRows(ra) == topkRows(rone))
  }

  test("probe equals the inline q_richlist row-for-row") {
    val path = RichlistWarehouse.builtPath(spark, Dir)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq
    assert(rows(RichlistWarehouse.probe(spark, path)) ==
      rows(Staking.richlist(spark, Dir)),
      "warehouse-served richlist diverges from inline")
  }

  test("the probe merge scans ONLY the warehouse — zero customer scans") {
    val path = RichlistWarehouse.builtPath(spark, Dir)
    val scans = RichlistWarehouse.mergedTopK(spark, path)
      .queryExecution.sparkPlan.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    val roots = scans.flatMap(_.relation.location.rootPaths).map(_.toString)
    assert(roots.forall(_.contains(path)), s"unexpected scan roots: $roots")
  }

  test("clean retract (no buffer hit) is pure tombstone — no upstream read, still exact") {
    val p = tmp("clean")
    RichlistWarehouse.refresh(planted, p)
    // remove accounts 1..5 — truncated away, far below the buffer
    val victims = planted.filter(col("custkey") <= 5).localCheckpoint()
    val before = topkRows(p)
    // upstream frame that THROWS if evaluated: a poisoned filter makes
    // any scan fail loudly — the clean path must never touch it
    val poisoned = planted.filter(
      udf((k: Long) => {
        if (k >= Long.MinValue)
          throw new IllegalStateException("clean retract read upstream")
        true
      }).apply(col("custkey")))
    RichlistWarehouse.retract(spark, victims, p, upstream = poisoned)
    assert(topkRows(p) == before,
      "a below-buffer retraction changed the top-K")
    // totals DID move: share denominator excludes the victims' 1+..+5
    val share = RichlistWarehouse.probe(spark, p)
      .filter(col("c_custkey") === 100L).collect().head.getAs[Double]("share")
    val expected = planted.filter(col("custkey") > 5)
      .agg(graft.functions.Exact.sumx(col("bal")).as("t"))
      .select(graft.functions.Exact.roundx(lit(100.0) / col("t"), 8).as("s"))
      .collect().head.getDouble(0)
    assert(share == expected, s"share $share != $expected after clean retract")
  }

  test("dirty retract refills the affected denom and equals rebuild-on-survivors") {
    val p = tmp("dirty")
    RichlistWarehouse.refresh(planted, p)
    // remove the 3 RICHEST accounts — the buffer loses rows, and the
    // true survivors' top-20 needs custkeys 78..80, which truncation
    // already discarded: only the pruned refill can restore them
    val top3 = planted.filter(col("custkey") >= 98).localCheckpoint()
    RichlistWarehouse.retract(spark, top3, p, upstream = planted)
    val rebuilt = tmp("dirty-ref")
    RichlistWarehouse.refresh(planted.filter(col("custkey") < 98), rebuilt)
    assert(topkRows(p) == topkRows(rebuilt),
      "dirty retract diverges from rebuild on the survivors")
    assert(topkRows(p).map(_._2) == (78L to 97L).toSet,
      "promotion failed: survivors' top-20 should be custkeys 78..97")
  }

  test("registered retracted probe equals the inline richlist over the survivors") {
    val path = RichlistWarehouse.builtRetractedPath(spark, Dir)
    val survivors = Tables(spark, Dir).customer
      .filter(!BalanceWarehouse.isRetractedCust)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq
    val inline = {
      val total = survivors.agg(
        graft.functions.Exact.sumx(col("c_acctbal")).as("total_bal"))
      survivors.orderBy(col("c_acctbal").desc, col("c_custkey")).limit(20)
        .crossJoin(broadcast(total))
        .select(col("c_custkey"), col("c_name"),
          graft.functions.Exact.roundx(col("c_acctbal"), 2).as("balance"),
          graft.functions.Exact.roundx(col("c_acctbal") / col("total_bal"), 8)
            .as("share"))
    }
    assert(rows(RichlistWarehouse.probe(spark, path)) == rows(inline),
      "retracted probe diverges from the survivors' inline richlist")
  }

  test("streaming refresh across micro-batches equals the one-shot fold") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = planted.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val p = tmp("stream")
    val mem = MemoryStream[(String, Long, String, Double)]
    val q = RichlistWarehouse.streamingRefresh(
      mem.toDF().toDF("denom", "custkey", "name", "bal"), p)
    try {
      // uneven split so each micro-batch's own top-K truncates
      val (b1, b2) = rows.splitAt(rows.length / 3)
      mem.addData(b1.toIndexedSeq)
      q.processAllAvailable()
      mem.addData(b2.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    val oneShot = tmp("stream-ref")
    RichlistWarehouse.refresh(planted, oneShot)
    assert(topkRows(p) == topkRows(oneShot),
      "streamed fold diverges from one-shot")
    // and the probe's share denominator folded exactly
    def shares(path: String) = RichlistWarehouse.probe(spark, path)
      .collect().map(_.toString).toSeq
    assert(shares(p) == shares(oneShot))
  }

  test("compact is probe-bit-invariant and physically truncates to K per denom") {
    val p = tmp("compact")
    RichlistWarehouse.refresh(planted.filter(col("custkey") % 2 === 0), p)
    RichlistWarehouse.refresh(planted.filter(col("custkey") % 2 === 1), p)
    val top1 = planted.filter(col("custkey") === 100).localCheckpoint()
    RichlistWarehouse.retract(spark, top1, p, upstream = planted)
    val before = RichlistWarehouse.probe(spark, p).collect().toSeq
    def bufRows() = sources.CommitLog.snapshot(spark, p).read(p + ".buf").count()
    val preBuf = bufRows()
    RichlistWarehouse.compact(spark, p)
    assert(RichlistWarehouse.probe(spark, p).collect().toSeq == before,
      "compaction changed the probe")
    val postBuf = bufRows()
    assert(postBuf < preBuf, s"compact did not shrink the buffer ($preBuf -> $postBuf)")
    assert(sources.CommitLog.snapshot(spark, p).readOpt(p + ".tomb").isEmpty,
      "compact left tombstones")
  }
}
