package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.operators.QuantileWarehouse
import graft.sources.Tables

/** The gas-quantile histogram warehouse contract: refresh == one-shot
  * rebuild bit-for-bit (integer-count associativity), the quantile
  * tail reproduces hand-computed interpolated quantiles on planted
  * histograms, the window probe list-prunes the date-partitioned
  * layout to exactly its days and equals the quantiles of the
  * date-filtered events, probes never rescan events, compaction is
  * probe-invariant, and the streaming twin folds micro-batches to the
  * same histogram.  (The DuckDB row_number oracle is the driver-side
  * gate; these pins cover the warehouse mechanics it can't see.)
  */
class QuantileWarehouseSpec extends GraftSpec {

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-quantw-$tag").resolve("idx").toString

  private def histOf(path: String): Set[(String, String, Long, Long)] =
    QuantileWarehouse.histRead(spark, path).collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("refresh equals the one-shot rebuild bit-for-bit") {
    val e = Tables(spark, Dir).events
    val a = tmp("refresh")
    QuantileWarehouse.materializeFrom(e.filter(QuantileWarehouse.isBaseEvent), a)
    QuantileWarehouse.refresh(spark, e.filter(!QuantileWarehouse.isBaseEvent), a)
    val one = tmp("oneshot")
    QuantileWarehouse.materializeFrom(e, one)
    assert(histOf(a) == histOf(one), "refreshed histogram diverges from rebuild")
  }

  test("quantile tail: hand-computed interpolation on a planted histogram") {
    import spark.implicits._
    // denom "x": values 1,2,3,10 (quantized 1e4×) — n=4:
    //   p50: idx100=150 -> lo=1 rem=50 -> 2 + (3-2)*0.5  = 2.5
    //   p90: idx100=270 -> lo=2 rem=70 -> 3 + (10-3)*0.7 = 7.9
    //   p99: idx100=297 -> lo=2 rem=97 -> 3 + (10-3)*0.97 = 9.79
    // denom "y": single value 42 — all quantiles 42
    val hist = Seq(
      ("x", 10000L, 1L), ("x", 20000L, 1L), ("x", 30000L, 1L), ("x", 100000L, 1L),
      ("y", 420000L, 1L)).toDF("denom", "q", "c")
    val r = QuantileWarehouse.quantilesOfHist(hist).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getDouble(2), x.getDouble(3), x.getDouble(4)))
      .toSet
    assert(r == Set(("x", 4L, 2.5, 7.9, 9.79), ("y", 1L, 42.0, 42.0, 42.0)),
      s"planted quantiles wrong: $r")
  }

  test("window probe equals quantiles of the date-filtered events and prunes to its days") {
    val path = QuantileWarehouse.builtPath(spark, Dir)
    val (start, end) = ("2024-01-08", "2024-01-21")
    val probe = QuantileWarehouse.windowProbe(spark, path, start, end)
    val filtered = Tables(spark, Dir).events
      .filter(to_date(col("ts")).between(lit(start).cast("date"), lit(end).cast("date")))
    val direct = QuantileWarehouse.quantilesOfHist(
      QuantileWarehouse.deltas(filtered))
    assert(probe.collect().map(_.toString).toSet ==
      direct.collect().map(_.toString).toSet,
      "window probe diverges from direct quantiles of the window's events")
    // the probe's input read (pre-localCheckpoint plan cut): the date
    // filter must land in partitionFilters of the partitioned layout
    val windowRead = QuantileWarehouse.histRead(spark, path)
      .filter(col("date").between(lit(start).cast("date"), lit(end).cast("date")))
    // committed generation roots (CommitLog, r11): one scan per live
    // generation, each date-pruning its own partitions
    val scans = windowRead.queryExecution.sparkPlan.collect {
        case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains(path)) => f
      }
    assert(scans.nonEmpty, "no warehouse FileSourceScanExec in plan")
    val allParts = scans.map(_.relation.location.listFiles(Nil, Nil).length).sum
    val pruned = scans.map(s =>
      s.relation.location.listFiles(s.partitionFilters, s.dataFilters).length).sum
    assert(allParts >= 28, s"expected ~30 date partitions at rest, got $allParts")
    assert(pruned <= 14 * scans.length,
      s"14-day window probed $pruned of $allParts partitions")
  }

  test("window probe skips whole generations at the log under an ingest-cadence build (r12)") {
    val e = Tables(spark, Dir).events
    val week = floor((dayofmonth(col("ts")) - 1) / 7).cast("int")
    val p = tmp("skip")
    QuantileWarehouse.materializeFrom(e.filter(week === 0), p)
    (1 to 4).foreach(w => QuantileWarehouse.refresh(spark, e.filter(week === w), p))
    val (start, end) = ("2024-01-08", "2024-01-21")
    // the log proves weeks 0 (Jan 1-7), 3 (22-28), 4 (29-30) empty for
    // the window — dropped BEFORE any file listing; weeks 1-2 survive
    val (kept, pruned) = sources.CommitLog.snapshot(spark, p)
      .partitionGens(p, "date", Some(start), Some(end))
    assert(kept == Seq(1L, 2L) && pruned == Seq(0L, 3L, 4L),
      s"expected log-level skip of weeks 0,3,4: kept=$kept pruned=$pruned")
    val probe = QuantileWarehouse.windowProbe(spark, p, start, end)
    // rows: identical to the mod-10 build's window probe (same events)
    val want = QuantileWarehouse.windowProbe(spark,
      QuantileWarehouse.builtPath(spark, Dir), start, end)
    assert(probe.collect().map(_.toString).toSet ==
      want.collect().map(_.toString).toSet,
      "log-skipped window probe diverges from the unskipped build's")
    // the skipped generations never reach the plan
    val files = QuantileWarehouse.histReadWindow(spark, p, start, end).inputFiles
    assert(files.nonEmpty &&
      files.forall(f => f.contains("/gen-1/") || f.contains("/gen-2/")),
      s"pruned generations leaked into the window read: ${files.toSeq}")
  }

  test("the probe scans ONLY the warehouse — zero events scans") {
    val path = QuantileWarehouse.builtPath(spark, Dir)
    val scans = QuantileWarehouse.histRead(spark, path)
      .queryExecution.sparkPlan.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, "expected a warehouse scan")
    val roots = scans.flatMap(_.relation.location.rootPaths).map(_.toString)
    assert(roots.forall(_.contains(path)), s"unexpected scan roots: $roots")
    assert(!roots.exists(_.contains("events")), "probe re-reads raw events")
  }

  test("compaction is probe-bit-invariant and leaves one row per key") {
    val e = Tables(spark, Dir).events
    val p = tmp("compact")
    QuantileWarehouse.materializeFrom(e.filter(QuantileWarehouse.isBaseEvent), p)
    QuantileWarehouse.refresh(spark, e.filter(!QuantileWarehouse.isBaseEvent), p)
    val before = histOf(p)
    val beforeQuants = QuantileWarehouse.probe(spark, p)
      .collect().map(_.toString).toSet
    def rawCount() = sources.CommitLog.snapshot(spark, p).read(p).count()
    val preCount = rawCount()
    QuantileWarehouse.compact(spark, p)
    val after = histOf(p)
    val postCount = rawCount()
    assert(before == after, "compaction changed the merged histogram")
    assert(postCount == after.size && postCount <= preCount,
      s"compact left $postCount rows for ${after.size} keys (pre $preCount)")
    assert(QuantileWarehouse.probe(spark, p).collect().map(_.toString).toSet
      == beforeQuants, "compaction changed probe output")
  }

  test("sketch lane: window quantiles land within the KLL rank bound of exact") {
    val path = QuantileWarehouse.sketchBuiltPath(spark, Dir)
    val (start, end) = ("2024-01-08", "2024-01-21")
    val got = QuantileWarehouse.sketchWindowProbe(spark, path, start, end)
      .collect().map(r => r.getString(0) ->
        Seq(0.5 -> r.getDouble(1), 0.9 -> r.getDouble(2), 0.99 -> r.getDouble(3)))
      .toMap
    assert(got.nonEmpty, "sketch window probe returned no denoms")
    val exact = Tables(spark, Dir).events
      .filter(to_date(col("ts")).between(lit(start).cast("date"), lit(end).cast("date")))
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).map { case (d, rs) => d -> rs.map(_.getDouble(1)).sorted }
    got.foreach { case (denom, quants) =>
      val vals = exact(denom)
      val n = vals.length.toDouble
      quants.foreach { case (p, v) =>
        // exact normalized rank of the reported value, vs the KLL
        // k=200 two-sided bound (~1.3%) + 1/n small-sample slack
        val rank = vals.count(_ <= v) / n
        assert(math.abs(rank - p) <= 0.02 + 1.0 / n,
          s"$denom p$p: reported $v has exact rank $rank (n=${n.toInt})")
      }
    }
    // zero events scans: the probe's input read is warehouse-only
    val roots = QuantileWarehouse.sketchRead(spark, path)
      .queryExecution.sparkPlan.collect {
        case f: FileSourceScanExec => f
      }.flatMap(_.relation.location.rootPaths).map(_.toString)
    assert(roots.nonEmpty && roots.forall(_.contains(path)),
      s"unexpected scan roots: $roots")
  }

  test("sketch lane streaming refresh keeps the rank bound across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val all = Tables(spark, Dir).events
      .select(col("ts").cast("string"), col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val p = tmp("skstream")
    val mem = MemoryStream[(String, String, Double)]
    val q = QuantileWarehouse.sketchStreamingRefresh(
      mem.toDF().toDF("ts", "event_type", "value")
        .withColumn("ts", col("ts").cast("timestamp")), p)
    try {
      val (b1, b2) = all.splitAt(all.length / 3)
      mem.addData(b1.toIndexedSeq)
      q.processAllAvailable()
      mem.addData(b2.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    // all-days window covers the full corpus: bound vs exact ranks
    val got = QuantileWarehouse.sketchWindowProbe(spark, p,
        "2024-01-01", "2024-12-31")
      .collect().map(r => r.getString(0) ->
        Seq(0.5 -> r.getDouble(1), 0.9 -> r.getDouble(2), 0.99 -> r.getDouble(3)))
      .toMap
    val exact = all.groupBy(_._2).map { case (d, rs) => d -> rs.map(_._3).sorted }
    got.foreach { case (denom, quants) =>
      val vals = exact(denom); val n = vals.length.toDouble
      quants.foreach { case (pq, v) =>
        val rank = vals.count(_ <= v) / n
        assert(math.abs(rank - pq) <= 0.02 + 1.0 / n,
          s"streamed $denom p$pq: $v has exact rank $rank") }
    }
  }

  test("streaming refresh across micro-batches equals the one-shot fold") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = Tables(spark, Dir).events
      .select(col("ts").cast("string"), col("event_type"), col("value"))
      .limit(300).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val p = tmp("stream")
    val mem = MemoryStream[(String, String, Double)]
    val q = QuantileWarehouse.streamingRefresh(
      mem.toDF().toDF("ts", "event_type", "value")
        .withColumn("ts", col("ts").cast("timestamp")), p)
    try {
      val (b1, b2) = rows.splitAt(rows.length / 3)
      mem.addData(b1.toIndexedSeq)
      q.processAllAvailable()
      mem.addData(b2.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    val oneShot = tmp("stream-ref")
    QuantileWarehouse.materializeFrom(
      rows.toIndexedSeq.toDF("ts", "event_type", "value")
        .withColumn("ts", col("ts").cast("timestamp")), oneShot)
    assert(histOf(p) == histOf(oneShot), "streamed fold diverges from one-shot")
  }

  test("streaming exactly-once: a redelivered committed batch folds nothing, even after compact") {
    def folded(path: String): Set[(String, String, Long, Long)] =
      QuantileWarehouse.histRead(spark, path)
        .groupBy(col("date"), col("denom"), col("q")).agg(sum(col("c")).as("c"))
        .collect()
        .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2),
          r.getLong(3))).toSet
    val e = Tables(spark, Dir).events
    val p = tmp("xonce")
    QuantileWarehouse.materializeFrom(e.filter(QuantileWarehouse.isBaseEvent), p)
    val batch = e.filter(!QuantileWarehouse.isBaseEvent)
    // first delivery folds
    assert(QuantileWarehouse.refreshTxn(spark, batch, p, batchId = Some(7L)))
    val after = folded(p)
    // the fold equals the mod-10 two-generation build (same events)
    assert(after == folded(QuantileWarehouse.builtPath(spark, Dir)),
      "id'd refresh diverges from the plain two-generation build")
    // redelivery: the committed `.stream` id makes the verb fold NOTHING
    assert(!QuantileWarehouse.refreshTxn(spark, batch, p, batchId = Some(7L)),
      "redelivered committed batch must skip")
    assert(folded(p) == after, "redelivery changed the histogram")
    // compaction folds the id part without forgetting ids
    QuantileWarehouse.compact(spark, p)
    assert(folded(p) == after, "compaction changed the histogram")
    assert(!QuantileWarehouse.refreshTxn(spark, batch, p, batchId = Some(7L)),
      "compaction forgot a committed batch id")
    // a genuinely new id still folds
    assert(QuantileWarehouse.refreshTxn(spark,
      e.filter(QuantileWarehouse.isBaseEvent).limit(50), p, batchId = Some(8L)))
  }

  test("RETRACT: negative deltas + compact == rebuild-on-survivors, bit-for-bit") {
    val e = Tables(spark, Dir).events
    val removed = e.filter(pmod(col("event_id"), lit(3L)) === 0)
    val retracted = Files.createTempDirectory("graft-qw-retr-").resolve("h").toString
    QuantileWarehouse.materializeFrom(
      e.filter(pmod(col("event_id"), lit(10L)) < 8), retracted)
    QuantileWarehouse.refresh(spark,
      e.filter(pmod(col("event_id"), lit(10L)) >= 8), retracted)
    QuantileWarehouse.retract(spark, removed, retracted)
    val rebuilt = Files.createTempDirectory("graft-qw-rebuilt-").resolve("h").toString
    QuantileWarehouse.materializeFrom(
      e.filter(pmod(col("event_id"), lit(3L)) =!= 0), rebuilt)
    def probeRows(p: String): Set[Seq[Any]] =
      QuantileWarehouse.probe(spark, p).collect().map(_.toSeq).toSet
    val r = probeRows(retracted)
    assert(r.nonEmpty && r == probeRows(rebuilt),
      "retracted quantiles diverge from the rebuild-on-survivors probe")
    // compact folds zero-count keys out: state == rebuild state
    QuantileWarehouse.compact(spark, retracted)
    QuantileWarehouse.compact(spark, rebuilt)
    def hist(p: String): Set[Seq[Any]] =
      QuantileWarehouse.histRead(spark, p).collect().map(_.toSeq).toSet
    assert(hist(retracted) == hist(rebuilt),
      "compacted retracted state diverges from the rebuild state")
    assert(probeRows(retracted) == r, "compact changed the probe")
  }
}
