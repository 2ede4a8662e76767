package graft

import org.apache.spark.sql.functions._
import graft.operators.LmWarehouse
import graft.similarity.Bm25Warehouse

/** Warehouse compaction — the segment-merge maintenance pass of the
  * refresh cadence: merging accumulated delta rows back to one row per
  * key must leave every probe BIT-identical (integer delta sums are
  * order-free) while shrinking the delta side to its logical row count
  * and restoring the probe-side agg to a near-no-op. */
class WarehouseCompactSpec extends GraftSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/index"

  /** Committed read of one warehouse part (CommitLog layout, r11). */
  private def readPart(base: String, part: String) =
    sources.CommitLog.snapshot(spark, base).read(part)

  private lazy val docs = sources.Tables(spark, Dir).documents
  private lazy val part1 = docs.filter(pmod(col("doc_id"), lit(10)) < 7)
  private lazy val part2 = docs.filter(pmod(col("doc_id"), lit(10)) === 7)
  private lazy val probeDocs = docs
    .filter(pmod(col("doc_id"), lit(10)) >= 8 && col("doc_id") < 1000)
    .select(col("doc_id"), col("text"))

  test("bm25: compact leaves the probe bit-identical and merges df deltas to one row per term") {
    val p = tmp("graft-bm25c-")
    Bm25Warehouse.materializeFrom(spark, part1, p)
    Bm25Warehouse.refresh(spark, part2, p)
    val queries = probeDocs
      .select(col("doc_id").as("query_id"),
        explode(graft.functions.TextFunctions.words(col("text"))).as("term"))
      .distinct()
    def run() = Bm25Warehouse.probe(spark, p, queries)
      .collect().map(_.toSeq).toSet
    val dfSide = s"$p.df"
    val before = run()
    assert(before.nonEmpty)
    val rowsBefore = readPart(p, dfSide).count()
    val distinctTerms = readPart(p, dfSide)
      .select(col("term")).distinct().count()
    // the refresh actually created per-term delta accumulation —
    // otherwise compaction is vacuous
    assert(rowsBefore > distinctTerms,
      s"no overlapping deltas to merge: $rowsBefore rows / $distinctTerms terms")
    Bm25Warehouse.compact(spark, p)
    assert(run() == before, "probe drifted across compaction")
    assert(readPart(p, dfSide).count() == distinctTerms,
      "compaction did not merge to one row per term")
    // physical reclaim is the caller's separate retention verb (review
    // r11: inline vacuum would yank directories from under pinned
    // concurrent probe snapshots) — run it here, drained, then check
    // the bucket layout inside the single surviving generation dir
    sources.CommitLog.vacuum(spark, p)
    assert(run() == before, "vacuum changed the probe result")
    val genDirs = new java.io.File(dfSide).listFiles().filter(_.isDirectory)
      .filter(_.getName.startsWith("gen-"))
    assert(genDirs.length == 1,
      s"expected one live generation after compact+vacuum, got ${genDirs.length}")
    val dirs = genDirs.head.listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("tb=")),
      s"bucket partitioning lost: ${dirs.take(3).mkString(",")}")
  }

  test("lm: compact leaves the probe bit-identical, merges count deltas, stats untouched") {
    val p = tmp("graft-lmc-")
    LmWarehouse.materializeFrom(part1, p)
    LmWarehouse.refresh(spark, part2, p)
    def run() = LmWarehouse.probe(spark, p, probeDocs)
      .collect().map(_.toSeq).toSet
    val before = run()
    assert(before.nonEmpty)
    val statsBefore = readPart(p, s"$p.stats").collect().map(_.toSeq).toSeq
    val rowsBefore = readPart(p, p).count()
    val distinctTerms = readPart(p, p)
      .select(col("term")).distinct().count()
    assert(rowsBefore > distinctTerms,
      s"no overlapping deltas to merge: $rowsBefore rows / $distinctTerms terms")
    LmWarehouse.compact(spark, p)
    assert(run() == before, "probe drifted across compaction")
    assert(readPart(p, p).count() == distinctTerms)
    assert(readPart(p, s"$p.stats").collect().map(_.toSeq).toSeq
      == statsBefore, "stats must not change: refresh already maintains (nb, v) exactly")
  }

  test("bm25: compaction is idempotent and composes with a later refresh") {
    val p = tmp("graft-bm25c2-")
    Bm25Warehouse.materializeFrom(spark, part1, p)
    Bm25Warehouse.compact(spark, p) // deltas already one-per-term: no-op
    Bm25Warehouse.refresh(spark, part2, p)
    Bm25Warehouse.compact(spark, p)
    Bm25Warehouse.compact(spark, p) // idempotent
    val queries = probeDocs
      .select(col("doc_id").as("query_id"),
        explode(graft.functions.TextFunctions.words(col("text"))).as("term"))
      .distinct()
    val got = Bm25Warehouse.probe(spark, p, queries)
      .collect().map(_.toSeq).toSet
    // reference: plain one-shot build over the same corpus
    val ref = tmp("graft-bm25c2-ref-")
    Bm25Warehouse.materializeFrom(spark, part1.unionByName(part2), ref)
    val want = Bm25Warehouse.probe(spark, ref, queries)
      .collect().map(_.toSeq).toSet
    assert(got == want)
  }
}
