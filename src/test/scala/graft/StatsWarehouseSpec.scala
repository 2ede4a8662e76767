package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, StatsWarehouse}
import graft.sources.Tables

/** The length-histogram warehouse contract: refresh == one-shot
  * rebuild bit-for-bit (integer-sum associativity), the
  * histogram-served profile equals the inline d_corpus_stats
  * row-for-row including the fixed-point percentile numerators (what
  * backs the verbatim oracle share), the probe plan never rescans
  * documents, compaction is probe-invariant, and the streaming twin
  * folds micro-batches to the same index.
  */
class StatsWarehouseSpec extends GraftSpec {

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-stw-$tag").resolve("idx").toString

  private def rowsOf(path: String): Set[(String, Long, Long, Long)] =
    graft.sources.CommitLog.snapshot(spark, path).read(path)
      .groupBy(col("lang"), col("nw"))
      .agg(sum(col("cnt")).as("cnt"), sum(col("ncs")).as("ncs"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  test("refresh equals the one-shot rebuild bit-for-bit") {
    val d = Tables(spark, Dir).documents
    val a = tmp("refresh")
    StatsWarehouse.materializeFrom(d.filter(StatsWarehouse.isBaseDoc), a)
    StatsWarehouse.refresh(spark, d.filter(!StatsWarehouse.isBaseDoc), a)
    val b = tmp("oneshot")
    StatsWarehouse.materializeFrom(d, b)
    assert(rowsOf(a) == rowsOf(b), "refreshed histogram diverges from rebuild")
  }

  test("histogram-served profile equals inline d_corpus_stats row-for-row") {
    val path = StatsWarehouse.builtPath(spark, Dir)
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))
    val probe = StatsWarehouse.statsProbe(spark, Dir, path)
      .collect().map(key).toSet
    val inline = CorpusStats.corpusStats(spark, Dir).collect().map(key).toSet
    assert(probe == inline,
      s"probeOnly=${probe -- inline} inlineOnly=${inline -- probe}")
    assert(probe.nonEmpty)
  }

  test("rank reconstruction matches the sorted-array pctx on a skewed planted corpus") {
    val s = spark
    import s.implicits._
    // heavy ties + a singleton lang: the two places rank arithmetic
    // can slip (repeated values spanning ranks; n = 1 clamps rank_hi)
    val docs = (1L to 9L).map(i =>
        (i, if (i <= 6) "a b c" else ("w " * i.toInt).trim, "en")) :+
      (10L, "solo", "xx")
    val df = docs.toDF("doc_id", "text", "lang")
    val inline = CorpusStats.corpusStatsOf(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val hist = StatsWarehouse.statsOfHist(
      df.select(col("lang"),
          size(split(col("text"), " ")).cast("long").as("nw"),
          length(col("text")).cast("long").as("nc"))
        .groupBy(col("lang"), col("nw"))
        .agg(count(lit(1)).as("cnt"), sum(col("nc")).as("ncs")))
      .collect().map(r => r.getString(0) -> r).toMap
    for (lang <- Seq("en", "xx"); c <- Seq("n_docs", "n_tokens", "min_tokens",
        "max_tokens", "p50_x100", "p90_x100", "p99_x100", "avg_chars_x10000"))
      assert(hist(lang).getAs[Long](c) == inline(lang).getAs[Long](c),
        s"$lang.$c: hist=${hist(lang).getAs[Long](c)} inline=${inline(lang).getAs[Long](c)}")
  }

  test("randomized corpora: rank reconstruction equals the sorted-array path (seeded)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42) // fixed seed — deterministic
    for (trial <- 1 to 5) {
      // skew knobs per trial: few/many docs, heavy ties, 1-3 langs
      val langs = Seq("aa", "bb", "cc").take(1 + rnd.nextInt(3))
      val docs = (1L to (1 + rnd.nextInt(40)).toLong).map { i =>
        val nw = 1 + rnd.nextInt(if (trial % 2 == 0) 4 else 30) // ties vs spread
        (i, Seq.fill(nw)("w").mkString(" "), langs(rnd.nextInt(langs.size)))
      }
      val df = docs.toDF("doc_id", "text", "lang")
      val inline = CorpusStats.corpusStatsOf(df).collect()
        .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
      val hist = StatsWarehouse.statsOfHist(
        df.select(col("lang"),
            size(split(col("text"), " ")).cast("long").as("nw"),
            length(col("text")).cast("long").as("nc"))
          .groupBy(col("lang"), col("nw"))
          .agg(count(lit(1)).as("cnt"), sum(col("nc")).as("ncs")))
        .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
      assert(hist == inline, s"trial $trial: hist=$hist inline=$inline")
    }
  }

  test("the probe-side merge scans ONLY the warehouse — zero documents scans") {
    val path = StatsWarehouse.builtPath(spark, Dir)
    val scans = StatsWarehouse.mergedHist(spark, path)
      .queryExecution.sparkPlan.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, "expected a warehouse scan")
    val roots = scans.flatMap(_.relation.location.rootPaths).map(_.toString)
    assert(roots.forall(_.contains(path)), s"unexpected scan roots: $roots")
    assert(!roots.exists(_.contains("documents")), "probe merge re-reads documents")
  }

  test("compaction is probe-bit-invariant and leaves one row per key") {
    val d = Tables(spark, Dir).documents
    val p = tmp("compact")
    StatsWarehouse.materializeFrom(d.filter(StatsWarehouse.isBaseDoc), p)
    StatsWarehouse.refresh(spark, d.filter(!StatsWarehouse.isBaseDoc), p)
    val before = rowsOf(p)
    val preCount = graft.sources.CommitLog.snapshot(spark, p).read(p).count()
    StatsWarehouse.compact(spark, p)
    val after = rowsOf(p)
    val postCount = graft.sources.CommitLog.snapshot(spark, p).read(p).count()
    assert(before == after, "compaction changed the merged histogram")
    assert(postCount == after.size && postCount < preCount,
      s"compact left $postCount rows for ${after.size} keys (pre $preCount)")
  }

  test("streaming refresh across micro-batches equals the one-shot fold") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = Tables(spark, Dir).documents
      .select(col("doc_id"), col("text"), col("lang"))
      .limit(200).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val p = tmp("stream")
    val mem = MemoryStream[(Long, String, String)]
    val q = StatsWarehouse.streamingRefresh(
      mem.toDF().toDF("doc_id", "text", "lang"), p)
    try {
      val (b1, b2) = rows.splitAt(rows.length / 3)
      mem.addData(b1.toIndexedSeq)
      q.processAllAvailable()
      mem.addData(b2.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    val oneShot = tmp("stream-ref")
    StatsWarehouse.materializeFrom(
      rows.toIndexedSeq.toDF("doc_id", "text", "lang"), oneShot)
    assert(rowsOf(p) == rowsOf(oneShot), "streamed fold diverges from one-shot")
  }

  test("RETRACT: negative deltas == rebuild-on-survivors, bit-for-bit on the merged state") {
    val docs = sources.Tables(spark, Dir).documents
    val retracted = java.nio.file.Files
      .createTempDirectory("graft-sw-retr-").resolve("h").toString
    graft.operators.StatsWarehouse.materializeFrom(
      docs.filter(pmod(col("doc_id"), lit(10L)) < 8), retracted)
    graft.operators.StatsWarehouse.refresh(spark,
      docs.filter(pmod(col("doc_id"), lit(10L)) >= 8), retracted)
    graft.operators.StatsWarehouse.retract(spark,
      docs.filter(pmod(col("doc_id"), lit(3L)) === 0), retracted)
    val rebuilt = java.nio.file.Files
      .createTempDirectory("graft-sw-rebuilt-").resolve("h").toString
    graft.operators.StatsWarehouse.materializeFrom(
      docs.filter(pmod(col("doc_id"), lit(3L)) =!= 0), rebuilt)
    def hist(p: String): Set[Seq[Any]] =
      graft.operators.StatsWarehouse.mergedHist(spark, p)
        .collect().map(_.toSeq).toSet
    assert(hist(retracted).nonEmpty && hist(retracted) == hist(rebuilt),
      "retracted stats state diverges from the rebuild on survivors")
    graft.operators.StatsWarehouse.compact(spark, retracted)
    assert(hist(retracted) == hist(rebuilt), "compact broke the retracted state")
  }
}
