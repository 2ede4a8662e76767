package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.operators.JoinViewWarehouse
import graft.sources.Tables

/** The join-view warehouse contract: any interleaving of order/line
  * batch refreshes equals the one-shot rebuild bit-for-bit (the
  * sequenced delta rule), retraction composes through the same rule
  * (rebuild-on-survivors, and a late line batch for a retracted
  * order contributes nothing), the probe plan reads ONLY the view
  * deltas, compaction is probe-bit-invariant, and the streaming twin
  * folds micro-batches to the same state. */
class JoinViewWarehouseSpec extends GraftSpec {

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-jvw-$tag").resolve("idx").toString

  private def viewOf(path: String): Set[(String, Long, java.math.BigDecimal, Long)] =
    sources.CommitLog.snapshot(spark, path).read(path)
      .groupBy(col("prio"), col("year"))
      .agg(sum(col("rev")).as("rev"), sum(col("n")).as("n"))
      .filter(col("n") =!= 0)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2), r.getLong(3)))
      .toSet

  private def t = Tables(spark, Dir)

  test("any interleaving of batch refreshes equals the one-shot rebuild bit-for-bit") {
    val ref = tmp("oneshot")
    JoinViewWarehouse.materializeFrom(t.orders, t.lineitem, ref)
    val expected = viewOf(ref)
    assert(expected.nonEmpty)

    // lines-first (the builtPath sequencing)
    val a = tmp("lines-first")
    JoinViewWarehouse.materializeFrom(
      t.orders.filter(JoinViewWarehouse.isBaseOrder),
      t.lineitem.filter(JoinViewWarehouse.isBaseLine), a)
    JoinViewWarehouse.refreshLines(spark,
      t.lineitem.filter(!JoinViewWarehouse.isBaseLine), a)
    JoinViewWarehouse.refreshOrders(spark,
      t.orders.filter(!JoinViewWarehouse.isBaseOrder), a)
    assert(viewOf(a) == expected, "lines-first sequencing diverges from rebuild")

    // orders-first — the opposite interleaving covers the same three
    // delta terms in the other association
    val b = tmp("orders-first")
    JoinViewWarehouse.materializeFrom(
      t.orders.filter(JoinViewWarehouse.isBaseOrder),
      t.lineitem.filter(JoinViewWarehouse.isBaseLine), b)
    JoinViewWarehouse.refreshOrders(spark,
      t.orders.filter(!JoinViewWarehouse.isBaseOrder), b)
    JoinViewWarehouse.refreshLines(spark,
      t.lineitem.filter(!JoinViewWarehouse.isBaseLine), b)
    assert(viewOf(b) == expected, "orders-first sequencing diverges from rebuild")
  }

  test("refreshBoth (one-txn both sides) equals the sequenced delta rule bit-for-bit") {
    val ref = tmp("both-ref")
    JoinViewWarehouse.materializeFrom(t.orders, t.lineitem, ref)
    val p = tmp("both")
    // first window IS the build (empty-base rule collapse), second is
    // the general three-term fold — both cross-cutting splits, so an
    // order's lines can straddle the windows in either direction
    JoinViewWarehouse.refreshBoth(spark,
      t.orders.filter(JoinViewWarehouse.isBaseOrder),
      t.lineitem.filter(JoinViewWarehouse.isBaseLine), p)
    JoinViewWarehouse.refreshBoth(spark,
      t.orders.filter(!JoinViewWarehouse.isBaseOrder),
      t.lineitem.filter(!JoinViewWarehouse.isBaseLine), p)
    assert(viewOf(p) == viewOf(ref), "refreshBoth diverges from rebuild")
  }

  test("recent-years probe skips pre-window generations AT THE LOG and stays exact (r13)") {
    val path = JoinViewWarehouse.builtYearlyPath(spark, Dir)
    val snap = sources.CommitLog.snapshot(spark, path)
    // the latest year answers from the log (zero scans)
    val latest = snap.statsMax(path, "year").get.toLong
    val cutoff = (latest - 1).toString
    val (kept, pruned) = snap.partitionGens(path, "year", Some(cutoff), None)
    assert(pruned.nonEmpty, "a multi-year corpus must have prunable years")
    assert(kept.size <= 2, s"trailing-2 window must keep at most 2 gens: $kept")
    // the pruned generations never reach the plan
    val probe = JoinViewWarehouse.recentYears(spark, path, years = 2)
    val files = probe.inputFiles.toSeq
    val keptDirs = kept.map(g => s"/gen-$g/")
    assert(files.nonEmpty && files.forall(f => keptDirs.exists(f.contains)),
      s"pruned year generations leaked into the probe scan: $files")
    // exactness: the skip-served window equals the full-fold probe
    // under the identical filter
    val want = JoinViewWarehouse.probe(spark, path)
      .filter(col("year") >= (latest - 1)).collect().map(_.toString).toSet
    assert(probe.collect().map(_.toString).toSet == want && want.nonEmpty,
      "log-skipped window diverges from the full fold")
  }

  test("recentYears: empty-after-retraction serves the empty frame; never-built stays loud (r13)") {
    val p = tmp("recent-empty")
    val o1 = t.orders.filter(year(col("o_orderdate")) === 1995).localCheckpoint()
    val l1 = t.lineitem.join(o1.select(col("o_orderkey")),
      col("l_orderkey") === col("o_orderkey"), "left_semi").localCheckpoint()
    JoinViewWarehouse.materializeFrom(o1, l1, p)
    JoinViewWarehouse.retractOrders(spark, o1, p)
    // compact folds the fully-retracted view to a zero-row replace —
    // which records NO year stats by design: the probe must serve the
    // empty window, not throw (the TsWarehouse.recentWindow stance)
    JoinViewWarehouse.compact(spark, p)
    val win = JoinViewWarehouse.recentYears(spark, p, years = 2)
    assert(win.isEmpty, "empty-after-retraction must serve an empty window")
    assert(win.columns.toSeq ==
      Seq("o_orderpriority", "year", "revenue", "n_lines"))
    // a warehouse that was never built at all stays LOUD
    intercept[IllegalStateException](
      JoinViewWarehouse.recentYears(spark, tmp("never-built")))
  }

  test("recentYears: a fully-retracted newest year re-anchors on net rows (ADVICE r13 #1)") {
    val p = tmp("retracted-tail")
    def yearOf(y: Int) = {
      val o = t.orders.filter(year(col("o_orderdate")) === y).localCheckpoint()
      val l = t.lineitem.join(o.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi").localCheckpoint()
      (o, l)
    }
    val (o95, l95) = yearOf(1995)
    val (o96, l96) = yearOf(1996)
    JoinViewWarehouse.materializeFrom(o95, l95, p)
    JoinViewWarehouse.refreshBoth(spark, o96, l96, p)
    JoinViewWarehouse.retractOrders(spark, o96, p)
    // PRE-COMPACT: the stats anchor says 1996 (retraction generations
    // record the same years as the rows they negate), but 1996 has no
    // net rows — the dashboard window must re-anchor on 1995, not
    // silently frame an empty year
    val pre = JoinViewWarehouse.recentYears(spark, p, years = 1).collect()
    assert(pre.nonEmpty, "window silently framed on the retracted year")
    assert(pre.forall(_.getAs[Long]("year") == 1995L),
      s"expected a 1995-anchored window, got ${pre.toSeq}")
    // and it equals BOTH the post-compact answer for the same logical
    // state (compact re-records stats from survivors) and the
    // scan-fallback semantics — the three anchors agree by construction
    val preSet = pre.map(_.toString).toSet
    JoinViewWarehouse.compact(spark, p)
    val post = JoinViewWarehouse.recentYears(spark, p, years = 1).collect()
      .map(_.toString).toSet
    assert(preSet == post, "pre/post-compact anchor divergence")
  }

  test("retract ∘ refresh equals rebuild-on-survivors, and late lines for a retracted order fold to nothing") {
    val a = tmp("retract")
    JoinViewWarehouse.materializeFrom(
      t.orders.filter(JoinViewWarehouse.isBaseOrder),
      t.lineitem.filter(JoinViewWarehouse.isBaseLine), a)
    JoinViewWarehouse.refreshLines(spark,
      t.lineitem.filter(!JoinViewWarehouse.isBaseLine), a)
    JoinViewWarehouse.refreshOrders(spark,
      t.orders.filter(!JoinViewWarehouse.isBaseOrder), a)
    JoinViewWarehouse.retractOrders(spark,
      t.orders.filter(JoinViewWarehouse.isRetractedOrder), a)

    val ref = tmp("survivors")
    JoinViewWarehouse.materializeFrom(
      t.orders.filter(!JoinViewWarehouse.isRetractedOrder), t.lineitem, ref)
    assert(viewOf(a) == viewOf(ref), "retracted view diverges from rebuild-on-survivors")

    // a line batch arriving AFTER its order was retracted finds no
    // live O-side row (net-op 0 dropped) and contributes nothing
    val s = spark
    import s.implicits._
    val retractedKey = t.orders.filter(JoinViewWarehouse.isRetractedOrder)
      .select(col("o_orderkey")).head().getLong(0)
    val late = Seq((retractedKey, 1000.0, 0.1))
      .toDF("l_orderkey", "l_extendedprice", "l_discount")
    JoinViewWarehouse.refreshLines(spark, late, a)
    assert(viewOf(a) == viewOf(ref),
      "a late line batch for a retracted order changed the view")
  }

  test("the probe plan reads ONLY the view deltas — not orders, lineitem, or the side states") {
    val path = JoinViewWarehouse.builtPath(spark, Dir)
    val scans = JoinViewWarehouse.mergedView(spark, path)
      .queryExecution.sparkPlan.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, "expected a view-delta scan")
    val roots = scans.flatMap(_.relation.location.rootPaths).map(_.toString)
    assert(roots.forall(r => r.endsWith(path.split('/').last) || r.contains(path)),
      s"unexpected scan roots: $roots")
    assert(!roots.exists(r => r.endsWith(".o") || r.endsWith(".l")),
      "probe reads a side state")
    assert(!roots.exists(r => r.contains("orders") || r.contains("lineitem")),
      "probe re-reads a base table")
  }

  test("compaction is probe-bit-invariant and physically purges retracted keys") {
    val p = tmp("compact")
    JoinViewWarehouse.materializeFrom(
      t.orders.filter(JoinViewWarehouse.isBaseOrder),
      t.lineitem.filter(JoinViewWarehouse.isBaseLine), p)
    JoinViewWarehouse.refreshLines(spark,
      t.lineitem.filter(!JoinViewWarehouse.isBaseLine), p)
    JoinViewWarehouse.refreshOrders(spark,
      t.orders.filter(!JoinViewWarehouse.isBaseOrder), p)
    JoinViewWarehouse.retractOrders(spark,
      t.orders.filter(JoinViewWarehouse.isRetractedOrder), p)
    val before = viewOf(p)
    def deltaRows() = sources.CommitLog.snapshot(spark, p).read(p).count()
    val preRows = deltaRows()
    JoinViewWarehouse.compact(spark, p)
    assert(viewOf(p) == before, "compaction changed the merged view")
    assert(deltaRows() < preRows, "compaction did not merge deltas")
    // the O side holds no trace of the retracted orders
    val oKeys = sources.CommitLog.snapshot(spark, p).read(p + ".o").select(col("k"))
      .filter(pmod(col("k"), lit(7L)) === 0)
    assert(oKeys.count() == 0, "compacted O side still holds retracted keys")
  }

  test("CDC twin: an order update split across micro-batches, with a line batch landing between the halves, folds to the updated-orders rebuild") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    // the order whose priority the update corrects — ODD key, so its
    // remaining lines are exactly the ones landing BETWEEN the halves
    val target = t.orders.filter(pmod(col("o_orderkey"), lit(2L)) === 1)
      .orderBy(col("o_orderkey")).head()
    val k = target.getLong(0)
    val oldPrio = target.getString(5)
    val newPrio = if (oldPrio == "1-URGENT") "5-LOW" else "1-URGENT"
    // o_orderdate reads as TIMESTAMP_NTZ (LocalDateTime); the stream
    // carries an instant — same wall time under the UTC session tz
    val date = java.sql.Timestamp.valueOf(target.getAs[java.time.LocalDateTime](4))

    // base: all orders, HALF the lines; the other half splits around
    // the update so some of the target's lines land between the halves
    val lines = t.lineitem
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val p = tmp("cdc")
    JoinViewWarehouse.materializeFrom(t.orders,
      lines.filter(pmod(col("l_orderkey"), lit(2L)) === 0), p)

    val mem = MemoryStream[(Long, String, java.sql.Timestamp, Long)]
    val q = JoinViewWarehouse.streamingOrderChanges(
      mem.toDF().toDF("o_orderkey", "o_orderpriority", "o_orderdate", "op"), p)
    try {
      mem.addData((k, oldPrio, date, -1L)) // the update's first half
      q.processAllAvailable()
      // a line batch BETWEEN the halves — includes the target's lines
      JoinViewWarehouse.refreshLines(spark,
        lines.filter(pmod(col("l_orderkey"), lit(2L)) === 1), p)
      mem.addData((k, newPrio, date, 1L)) // the update's second half
      q.processAllAvailable()
    } finally q.stop()

    val ref = tmp("cdc-ref")
    val updatedOrders = t.orders.withColumn("o_orderpriority",
      when(col("o_orderkey") === k, lit(newPrio)).otherwise(col("o_orderpriority")))
    JoinViewWarehouse.materializeFrom(updatedOrders, lines, ref)
    assert(viewOf(p) == viewOf(ref), "CDC fold diverges from updated-orders rebuild")
  }

  test("streaming line refresh across micro-batches equals the one-shot fold") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = t.lineitem
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .limit(300).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val p = tmp("stream")
    // standing orders, no lines yet
    JoinViewWarehouse.materializeFrom(t.orders,
      t.lineitem.filter(lit(false)), p)
    val mem = MemoryStream[(Long, Double, Double)]
    val q = JoinViewWarehouse.streamingRefreshLines(
      mem.toDF().toDF("l_orderkey", "l_extendedprice", "l_discount"), p)
    try {
      val (b1, b2) = rows.splitAt(rows.length / 3)
      mem.addData(b1.toIndexedSeq)
      q.processAllAvailable()
      mem.addData(b2.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    val ref = tmp("stream-ref")
    JoinViewWarehouse.materializeFrom(t.orders,
      rows.toIndexedSeq.toDF("l_orderkey", "l_extendedprice", "l_discount"), ref)
    assert(viewOf(p) == viewOf(ref), "streamed fold diverges from one-shot")
  }
}
