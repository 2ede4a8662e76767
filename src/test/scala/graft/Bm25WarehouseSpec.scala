package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.similarity.Bm25Warehouse

/** The BM25 posting table at rest: the probe must match a from-scratch
  * single-machine BM25 over the base/incoming split, tokenize ONLY the
  * probe side (one documents scan in the plan), and prune term-bucket
  * partitions for small term sets. */
class Bm25WarehouseSpec extends GraftSpec {

  private lazy val path = {
    val p = java.nio.file.Files
      .createTempDirectory("graft-bm25w-").toString + "/index"
    Bm25Warehouse.materialize(spark, Dir, p)
    p
  }

  private lazy val probed =
    Bm25Warehouse.probeIncoming(spark, Dir, path)

  test("probe matches a single-machine BM25 over the base/incoming split") {
    val all = sources.Tables(spark, Dir).documents
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val base = all.filter { case (id, _) => id % 10 < 8 }
    val n = base.size
    val avgdl = base.values.map(_.size).sum.toDouble / n
    val tf = base.map { case (id, ws) => id -> ws.groupBy(identity).map { case (w, g) => w -> g.size } }
    val df = base.values.flatMap(_.distinct).groupBy(identity).map { case (w, g) => w -> g.size }
    def score(qTerms: Set[String], d: Long): Double = {
      val parts = (qTerms & tf(d).keySet).toSeq.map { t =>
        val idf = math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
        val x = idf * ((tf(d)(t) * 2.2) /
          (tf(d)(t) + 1.2 * (0.25 + 0.75 * (base(d).size / avgdl))))
        BigDecimal(math.floor(x * 1e9 + 0.5) / 1e9)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }
      parts.sum.toDouble
    }
    val out = probed.collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (q, d, got) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(q % 10 >= 8 && q < 1000, s"query $q outside the probe batch")
      assert(d % 10 < 8, s"retrieved doc $d is not a base doc")
      val want = math.floor(score(all(q).toSet, d) * 1e4 + 0.5) / 1e4
      assert(got == want, s"bm25($q,$d): got $got want $want")
    }
  }

  test("probe plan tokenizes only the query side: one documents scan") {
    val scans = probed.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("documents.parquet")) => f
    }
    assert(scans.length == 1,
      s"expected exactly the probe-side documents scan, got ${scans.length}")
  }

  test("streaming probe across micro-batches equals the batch probe") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val incoming = sources.Tables(s, Dir).documents
      .filter(pmod(col("doc_id"), lit(10)) >= 8 && col("doc_id") < 1000)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val stream = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Set.empty[Seq[Any]]
    val query = Bm25Warehouse.streamingProbe(stream.toDF()
        .withColumnRenamed("_1", "doc_id").withColumnRenamed("_2", "text"), path) {
      batchOut => got ++= batchOut.collect().map(_.toSeq)
    }
    try {
      val (b1, b2) = incoming.splitAt(incoming.length / 2)
      stream.addData(b1.toIndexedSeq)
      query.processAllAvailable()
      stream.addData(b2.toIndexedSeq)
      query.processAllAvailable()
      val batch = probed.collect().map(_.toSeq).toSet
      assert(got.nonEmpty)
      assert(got.toSet == batch)
    } finally query.stop()
  }

  test("a small term set prunes term-bucket partitions") {
    import spark.implicits._
    val tiny = Bm25Warehouse.incomingTerms(spark, Dir)
      .orderBy("query_id", "term").limit(3)
    val df = Bm25Warehouse.probe(spark, path, tiny)
    // posting roots are committed generation dirs under <path>/gen-N
    // since round 11 (CommitLog) — one scan per live generation
    val scans = df.queryExecution.sparkPlan.collect {
        case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("index/gen-")) &&
            f.schema.fieldNames.contains("tf") => f
      }
    assert(scans.nonEmpty, "no index FileSourceScanExec in plan")
    val allParts = scans.map(_.relation.location.listFiles(Nil, Nil).length).sum
    val pruned = scans.map(s =>
      s.relation.location.listFiles(s.partitionFilters, s.dataFilters).length).sum
    assert(allParts > 8, s"expected many term buckets at rest, got $allParts")
    assert(pruned <= 3 * scans.length,
      s"3 terms probed $pruned of $allParts partitions")
    assert(df.count() >= 0)
  }
  test("RETRACT: probe-after-retract == probe-on-rebuild-on-survivors, bit-for-bit") {
    def rows(p: String): Set[Seq[Any]] =
      Bm25Warehouse.probeIncoming(spark, Dir, p).collect().map(_.toSeq).toSet
    val retracted = java.nio.file.Files
      .createTempDirectory("graft-bm25w-retr-").toString + "/index"
    Bm25Warehouse.materializeRetracted(spark, Dir, retracted)
    val rebuilt = java.nio.file.Files
      .createTempDirectory("graft-bm25w-rebuilt-").toString + "/index"
    Bm25Warehouse.materializeFrom(spark, sources.Tables(spark, Dir).documents
      .filter(pmod(col("doc_id"), lit(10)) < 7), rebuilt)
    val r = rows(retracted)
    assert(r == rows(rebuilt),
      "retracted probe diverges from the rebuild-on-survivors probe")
    // the retraction actually bit: mod-7 docs rank in the full index
    assert(rows(path).exists(_(1).asInstanceOf[Long] % 10 == 7),
      "degenerate: no mod-7 doc in any top-k at this SF")
    assert(r.forall(_(1).asInstanceOf[Long] % 10 != 7))
    // stats decremented to exactly the rebuild's two scalars (parts
    // read through their committed snapshots — CommitLog layout)
    def stats(p: String) =
      sources.CommitLog.snapshot(spark, p).read(s"$p.stats").head()
    assert(stats(retracted).toSeq == stats(rebuilt).toSeq)
    // compact physically removes tombstoned postings and negative df
    // rows, probe-invariant; df side equals the rebuild's merged rows
    Bm25Warehouse.compact(spark, retracted)
    assert(rows(retracted) == r, "compact changed the probe result")
    assert(sources.CommitLog.snapshot(spark, retracted).read(retracted)
      .filter(pmod(col("doc_id"), lit(10)) === 7).count() == 0,
      "compact left tombstoned postings behind")
    def dfRows(p: String): Set[(String, Long)] =
      sources.CommitLog.snapshot(spark, p).read(s"$p.df").groupBy(col("term"))
        .agg(sum(col("dfd")).as("dfd")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(dfRows(retracted) == dfRows(rebuilt),
      "compacted df side diverges from the rebuild's")
  }
}
