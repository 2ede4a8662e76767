package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.similarity.{Knn, LshWarehouse}

/** The banded-signature layout at rest: probe results must be
  * row-identical to the inline rangeSearchLsh plan (hence to brute
  * force — RangeSearchSpec closes that link), and the probe must
  * actually PRUNE (band, key) partitions rather than scan the index.
  */
class LshWarehouseSpec extends GraftSpec {

  private lazy val path = {
    val p = java.nio.file.Files
      .createTempDirectory("graft-lshw-").toString + "/index"
    LshWarehouse.materialize(spark, Dir, p)
    p
  }

  test("warehouse probe equals the inline banded plan") {
    val atRest = LshWarehouse.rangeProbe(spark, path)
      .collect().map(_.toSeq).toSet
    val inline = Knn.rangeSearchLsh(spark, Dir)
      .collect().map(_.toSeq).toSet
    assert(atRest.nonEmpty, "degenerate: empty result set proves nothing")
    assert(atRest == inline)
  }

  test("a single query's probe prunes to at most its bands' partitions") {
    val df = LshWarehouse.rangeProbe(spark, path, nQueries = 1)
    // index roots are committed generation dirs (<path>/gen-N) since
    // r11 (CommitLog) — one scan per live generation, each pruning bb
    val scans = df.queryExecution.sparkPlan.collect {
        case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("index/gen-")) &&
            f.schema.fieldNames.contains("band") => f
      }
    assert(scans.nonEmpty, "no index FileSourceScanExec in plan")
    val allParts = scans.map(_.relation.location.listFiles(Nil, Nil).length).sum
    val pruned = scans.map(s =>
      s.relation.location.listFiles(s.partitionFilters, s.dataFilters).length).sum
    // 32 bands × 2-bit keys = 128 partitions at rest; one query probes
    // at most its 32 (band, key) pairs per generation root
    assert(allParts > 32, s"expected >32 bb partitions at rest, got $allParts")
    assert(pruned <= 32 * scans.length,
      s"probe scanned $pruned of $allParts partitions")
    assert(df.count() >= 0) // plan must execute
  }

  test("RETRACT: probe-after-takedown == probe-against-rebuild-on-survivors; compact physical") {
    def probeRows(p: String): Set[Seq[Any]] =
      LshWarehouse.rangeProbe(spark, p).collect().map(_.toSeq).toSet
    val removedPred = pmod(col("vec_id"), lit(5L)) === 3 && col("vec_id") >= 10
    val retracted = java.nio.file.Files
      .createTempDirectory("graft-lshw-retr-").toString + "/index"
    LshWarehouse.materialize(spark, Dir, retracted)
    LshWarehouse.retract(sources.Tables(spark, Dir).embeddings
      .filter(removedPred).select(col("vec_id")), retracted)
    val rebuilt = java.nio.file.Files
      .createTempDirectory("graft-lshw-rebuilt-").toString + "/index"
    LshWarehouse.materializeFrom(sources.Tables(spark, Dir).embeddings
      .filter(!removedPred)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.toDouble(col("embedding")).as("v")),
      rebuilt)
    val got = probeRows(retracted)
    assert(got == probeRows(rebuilt),
      "tombstone pruning diverges from the physical rebuild")
    // the takedown actually bit: the full index answers with removed ids
    assert(probeRows(path).exists(r =>
      r(1).asInstanceOf[Long] % 5 == 3 && r(1).asInstanceOf[Long] >= 10),
      "degenerate: no removed-slice answer exists — retraction untested")
    assert(got.forall(r =>
      !(r(1).asInstanceOf[Long] % 5 == 3 && r(1).asInstanceOf[Long] >= 10)))
    // COMPACT physically removes and is probe-invariant
    def vecsCount() = sources.CommitLog.snapshot(spark, retracted)
      .read(s"$retracted.vectors").count()
    val vecsBefore = vecsCount()
    LshWarehouse.compact(spark, retracted)
    assert(vecsCount() < vecsBefore,
      "compact removed no tombstoned vectors")
    assert(probeRows(retracted) == got, "compact changed the probe result")
  }

  test("a taken-down QUERY id is gone on both sides — bit-invariant under compact") {
    val s = spark
    import s.implicits._
    def probeRows(p: String): Set[Seq[Any]] =
      LshWarehouse.rangeProbe(spark, p).collect().map(_.toSeq).toSet
    val p = java.nio.file.Files
      .createTempDirectory("graft-lshw-qtd-").toString + "/index"
    LshWarehouse.materialize(spark, Dir, p)
    val before = probeRows(p)
    assert(before.exists(_(0) == 3L), "degenerate: query 3 answers nothing")
    LshWarehouse.retract(Seq(3L).toDF("vec_id"), p)
    val after = probeRows(p)
    // the vector is GONE entirely: neither asks nor answers
    assert(after == before.filter(r => r(0) != 3L && r(1) != 3L),
      "takedown of a stored query id did not remove it from both sides")
    LshWarehouse.compact(spark, p)
    assert(probeRows(p) == after,
      "compact changed the probe after a query-id takedown")
  }
}
