package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.operators.Messages
import graft.streaming.StreamOps

/** The materialized account_tx fan-out must serve keyed page reads
  * with PARTITION PRUNING: the 64-way hash-bucket layout exists so a
  * one-account read touches 1/64 of the files, not the corpus
  * (StreamOps.accountTxSink writes the same layout incrementally).
  */
class AccountTxPruningSpec extends GraftSpec {

  test("keyed fan-out read prunes to exactly one of the hash buckets") {
    val path = Messages.accountTxPath(spark, Dir)
    val df = StreamOps.accountTxRead(spark, path, account = 7L)
    val scan = df.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f }
      .getOrElse(fail("no FileSourceScanExec in plan"))
    val allParts = scan.relation.location.listFiles(Nil, Nil).length
    val prunedParts =
      scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters).length
    assert(allParts > 32, s"expected a populated bucket layout, got $allParts partitions")
    assert(prunedParts == 1,
      s"keyed read should prune to 1 bucket, scanned $prunedParts of $allParts")
  }

  test("page served from the materialized fan-out matches the inline fan-out") {
    val fromView = Messages.accountTxsPage(spark, Dir).collect().toSeq
    val inline = {
      val t = graft.sources.Tables(spark, Dir)
      val keys = Messages.accountTxFanout(spark, Dir)
        .filter(col("account") === 7L && col("event_id") < 8000L)
        .orderBy(col("event_id").desc).limit(20)
      keys.join(t.events, Seq("event_id"))
        .select(col("account"), col("event_id"), col("ts_ms"),
          col("event_type"), graft.functions.Exact.roundx(col("value"), 4).as("amount"))
        .orderBy(col("event_id").desc)
    }.collect().toSeq
    assert(fromView == inline)
  }
}
