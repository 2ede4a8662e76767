package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.dedup.{Dedup, MinHashWarehouse}

/** Incremental dedup against the MinHash index at rest: the probe
  * must agree pair-for-pair with the from-scratch verified path
  * restricted to cross-split pairs, and the historical side must be
  * served from the WAREHOUSE — the probe plan never re-reads the
  * corpus text for base docs.
  */
class MinHashWarehouseSpec extends GraftSpec {

  private lazy val path = {
    val p = java.nio.file.Files
      .createTempDirectory("graft-mhw-").toString + "/index"
    MinHashWarehouse.materialize(spark, Dir, p)
    p
  }

  test("retention drill: compact + vacuum retire dedup history; as-of behind is LOUD (r15 ask #6)") {
    // the member whose log grows with crawl history: every refresh /
    // takedown is a generation, and "which corpus did this run dedup
    // against" is a generation cut (d_dedup_asof).  Retention here is
    // the shared compact (a REPLACE generation) + vacuum — no extra
    // retire verb — and the contract to drill is the tokenizer's:
    // the head serves bit-identically after physical reclaim, while a
    // cut behind the horizon fails LOUDLY instead of reading reclaimed
    // directories or silently serving a partial corpus.
    val p = java.nio.file.Files
      .createTempDirectory("graft-mhw-ret-").toString + "/index"
    val docs = graft.sources.Tables(spark, Dir).documents
    MinHashWarehouse.materializeFrom(docs, p)                   // gen 0
    MinHashWarehouse.retract(                                    // gen 1
      docs.filter(MinHashWarehouse.isRetractedDoc).select(col("doc_id")), p)
    val incoming = docs.filter(!MinHashWarehouse.isBase)
    def probeRows() = MinHashWarehouse.probeAgainst(spark, incoming, p)
      .collect().map(_.toString).toSet
    // pre-retention: the as-of cut BEFORE the takedown still answers
    val preTakedown = MinHashWarehouse.probeAsOf(spark, incoming, p, 0)
      .collect().map(_.toString).toSet
    assert(preTakedown.nonEmpty, "degenerate: no pre-takedown matches")
    val head = probeRows()
    MinHashWarehouse.compact(spark, p)                           // the horizon
    graft.sources.CommitLog.vacuum(spark, p)
    assert(probeRows() == head,
      "head probe must be bit-identical through compact + vacuum")
    // history at or behind the compact horizon is retired for EVERY
    // reader — the gen-0 read now fails loudly
    intercept[IllegalStateException](
      MinHashWarehouse.probeAsOf(spark, incoming, p, 0))
  }

  test("incremental probe equals the from-scratch verified cross pairs") {
    val inc = MinHashWarehouse.incrementalDedup(spark, Dir, path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // minhashVerified emits a_id < b_id over the whole corpus; keep
    // cross-split pairs and orient them (new, base)
    val full = Dedup.minhashVerified(spark, Dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .flatMap { case (a, b, j) =>
        (a % 10 >= 8, b % 10 >= 8) match {
          case (true, false) => Some((a, b, j))
          case (false, true) => Some((b, a, j))
          case _             => None
        }
      }.toSet
    assert(inc.nonEmpty, "degenerate: no cross-split near-dup pairs at this SF")
    assert(inc == full)
  }

  test("probe plan reads no corpus text — only signed leaves and the warehouse") {
    val df = MinHashWarehouse.incrementalDedup(spark, Dir, path)
    // incoming text is read ONCE at signing (localCheckpoint leaf);
    // base text never — the probe plan itself contains no documents scan
    val docScans = df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("documents")) => f
    }
    assert(docScans.isEmpty,
      s"probe plan re-reads corpus text: ${docScans.length} documents scans")
    val whScans = df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("graft-mhw-")) => f
    }
    assert(whScans.nonEmpty, "base side must be served from the warehouse")
  }

  test("streaming probe across micro-batches equals the batch probe") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val incoming = sources.Tables(s, Dir).documents
      .filter(pmod(col("doc_id"), lit(10)) >= 8)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val stream = MemoryStream[(Long, String)]
    val out = MinHashWarehouse.streamingDedup(s, stream.toDF()
      .withColumnRenamed("_1", "doc_id").withColumnRenamed("_2", "text"), path)
    val query = out.writeStream.format("memory")
      .queryName("mhw_stream").outputMode("append").start()
    try {
      val (b1, b2) = incoming.splitAt(incoming.length / 2)
      stream.addData(b1.toIndexedSeq)
      query.processAllAvailable()
      stream.addData(b2.toIndexedSeq)
      query.processAllAvailable()
      val streamed = s.table("mhw_stream")
        .collect().map(_.toSeq).toSet
      val batch = MinHashWarehouse.incrementalDedup(s, Dir, path)
        .collect().map(_.toSeq).toSet
      assert(streamed.nonEmpty)
      assert(streamed == batch)
    } finally query.stop()
  }

  test("an empty incoming batch probes to an empty result, not an error") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val stream = MemoryStream[(Long, String)]
    val out = MinHashWarehouse.streamingDedup(s, stream.toDF()
      .withColumnRenamed("_1", "doc_id").withColumnRenamed("_2", "text"), path)
    val query = out.writeStream.format("memory")
      .queryName("mhw_empty").outputMode("append").start()
    try {
      query.processAllAvailable() // zero batches added
      assert(s.table("mhw_empty").count() == 0)
    } finally query.stop()
  }

  test("every emitted pair crosses the split, J >= 0.8, exactly once") {
    val rows = MinHashWarehouse.incrementalDedup(spark, Dir, path).collect()
    assert(rows.forall(r => r.getLong(0) % 10 >= 8 && r.getLong(1) % 10 < 8))
    assert(rows.forall(_.getDouble(2) >= 0.8))
    val keys = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length == keys.length, "duplicate candidate pair emitted")
  }

  test("RETRACT: probe-after-retract == probe-against-rebuild-on-(corpus ∖ removed)") {
    def pairs(p: String): Set[(Long, Long, Double)] =
      MinHashWarehouse.incrementalDedup(spark, Dir, p)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the registered build: full base index, then tombstone mod-7 docs
    val retracted = java.nio.file.Files
      .createTempDirectory("graft-mhw-retr-").toString + "/index"
    MinHashWarehouse.materializeRetracted(spark, Dir, retracted)
    // the reference: an index BUILT on the surviving base docs only
    val rebuilt = java.nio.file.Files
      .createTempDirectory("graft-mhw-rebuilt-").toString + "/index"
    MinHashWarehouse.materializeFrom(sources.Tables(spark, Dir).documents
      .filter(pmod(col("doc_id"), lit(10)) =!= 7), rebuilt)
    val retractedPairs = pairs(retracted)
    assert(retractedPairs == pairs(rebuilt),
      "tombstone pruning diverges from the physical rebuild")
    // the retraction actually bit: the full index finds mod-7 partners
    assert(pairs(path).exists(_._2 % 10 == 7),
      "degenerate: no mod-7 base partner exists at this SF — retraction untested")
    assert(retractedPairs.forall(_._2 % 10 != 7))
    // COMPACT physically removes tombstoned rows, probe-invariant
    // (reads go through the committed fold — round 12's CommitLog
    // retrofit; compact is now one transaction over both stores)
    def committed(part: String) =
      graft.sources.CommitLog.snapshot(spark, retracted).read(part)
    val docsBefore = committed(s"$retracted.docs").count()
    MinHashWarehouse.compact(spark, retracted)
    val docsAfter = committed(s"$retracted.docs").count()
    assert(docsAfter < docsBefore, "compact removed no tombstoned doc rows")
    assert(committed(retracted)
      .filter(pmod(col("doc_id"), lit(10)) === 7).count() == 0,
      "compact left tombstoned index rows behind")
    assert(pairs(retracted) == retractedPairs, "compact changed the probe result")
  }

  test("AS-OF: time travel over the gen log, tombstones takedown-time-filtered") {
    val s = spark
    val gen = MinHashWarehouse.builtGenPath(s, Dir)
    val batch = sources.Tables(s, Dir).documents
      .filter(pmod(col("doc_id"), lit(10)) >= 8)
    def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // asOf(1) == the standing full-base probe (matches against the
    // later-removed mod-7 docs INCLUDED — the pre-takedown snapshot)
    val asOf1 = pairsOf(MinHashWarehouse.probeAsOf(s, batch, gen, 1))
    val standing = pairsOf(MinHashWarehouse.incrementalDedup(s, Dir, path))
    assert(asOf1 == standing, "asOf(pre-takedown) diverges from the standing probe")
    assert(asOf1.exists(_._2 % 10 == 7),
      "degenerate: no mod-7 partner — the takedown distinction is untested")
    // asOf(2) — the head — excludes them, exactly the retracted answer
    val asOf2 = pairsOf(MinHashWarehouse.probeAsOf(s, batch, gen, 2))
    assert(asOf2 == standing.filter(_._2 % 10 != 7),
      "asOf(head) diverges from the takedown-filtered answer")
    // asOf(0): only the gen-0 corpus (mod 0..6) exists to match
    val asOf0 = pairsOf(MinHashWarehouse.probeAsOf(s, batch, gen, 0))
    assert(asOf0 == standing.filter(_._2 % 10 < 7),
      "asOf(0) diverges from the gen-0-only answer")
    // the as-of index read NEVER LISTS later generations: the
    // committed fold reads an explicit directory list, so asOf(0)'s
    // scan roots are exactly the gen-0 dirs — later generations are
    // pruned at the LOG, before any file listing (stronger than the
    // old gen=N partition pruning, which still listed all partitions)
    val snap = graft.sources.CommitLog.snapshot(s, gen)
    val rootsOf = (g: Long) => snap.read(gen, asOfGen = g)
      .queryExecution.sparkPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .flatMap(_.relation.location.rootPaths).map(_.toString)
    // match the trailing PATH SEGMENT, not a bare substring: the
    // random temp-dir name can itself contain "gen-<digit>" (a real
    // flake — "graft-minhash_gen-2379…" matched contains("gen-2"))
    val genOf = (root: String) => root.split('/').last
    val r0 = rootsOf(0L)
    assert(r0.nonEmpty && r0.forall(genOf(_) == "gen-0"),
      s"asOf(0) must read only gen-0 roots: $r0")
    assert(rootsOf(1L).exists(genOf(_) == "gen-1") &&
      !rootsOf(1L).exists(genOf(_) == "gen-2"),
      s"asOf(1) roots wrong: ${rootsOf(1L)}")
  }
}
