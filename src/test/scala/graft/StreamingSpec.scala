package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Structured Streaming path: drive StreamOps.streamingTumblingAgg from
  * a MemoryStream and check the incremental result matches the batch
  * plan over the same rows (the fcd collector loop re-expressed). */
class StreamingSpec extends GraftSpec {

  test("streaming tumbling agg matches batch over the same data") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val rows = sources.Tables(s, Dir).events
      .select(col("ts").cast("timestamp"), col("event_type"), col("value"))
      .as[(Timestamp, String, Double)]
      .collect()

    val stream = MemoryStream[(Timestamp, String, Double)]
    val input = stream.toDF().toDF("ts", "event_type", "value")
    val query = streaming.StreamOps.streamingTumblingAgg(input)
      .writeStream
      .format("memory")
      .queryName("stream_out")
      .outputMode("complete")
      .start()
    try {
      // feed in two chunks to exercise incremental state updates
      val (first, second) = rows.splitAt(rows.length / 2)
      stream.addData(first.toSeq)
      query.processAllAvailable()
      stream.addData(second.toSeq)
      query.processAllAvailable()

      val streamed = s.table("stream_out")
        .select("window_ms", "event_type", "n_events", "total_value")
        .collect().map(_.toSeq).toSet
      val batch = streaming.StreamOps.tumblingAgg(
        sources.Tables(s, Dir).events).collect().map(_.toSeq).toSet
      assert(streamed == batch)
    } finally query.stop()
  }

  test("parquet upsert sink converges to the batch rollup, partition-parallel") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = sources.Tables(s, Dir).events
      .select(col("ts").cast("timestamp"), col("event_type"), col("value"))
      .as[(Timestamp, String, Double)].collect()
    val path = java.nio.file.Files.createTempDirectory("graft_sink_").toString
    val stream = MemoryStream[(Timestamp, String, Double)]
    val query = streaming.StreamOps.parquetUpsertSink(
      stream.toDF().toDF("ts", "event_type", "value"), path)
    try {
      // several micro-batches so later batches UPDATE windows earlier
      // batches already wrote — exercising the keyed-merge semantics
      rows.grouped(300).foreach { chunk =>
        stream.addData(chunk.toSeq)
        query.processAllAvailable()
      }
      val sunk = streaming.StreamOps.readRollup(s, path).collect()
        .map(r => (r.getAs[Long]("window_ms"), r.getAs[String]("event_type")) ->
          (r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toMap
      val batch = streaming.StreamOps.tumblingAgg(sources.Tables(s, Dir).events)
        .collect()
        .map(r => (r.getAs[Long]("window_ms"), r.getAs[String]("event_type")) ->
          (r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toMap
      assert(sunk == batch)
    } finally query.stop()
  }

  test("streaming latest-price state converges to batch latest-per-denom") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = sources.Tables(s, Dir).events
      .select(col("ts").cast("timestamp"), col("event_type"), col("value"),
        col("event_id"))
      .as[(Timestamp, String, Double, Long)].collect()
    val stream = MemoryStream[(Timestamp, String, Double, Long)]
    val query = streaming.StreamOps.streamingLatestPrice(
      stream.toDF().toDF("ts", "event_type", "value", "event_id"))
      .writeStream.format("memory").queryName("latest_price")
      .outputMode("complete").start()
    try {
      // chunked feed: later chunks must OVERWRITE earlier state per denom
      rows.grouped(400).foreach { chunk =>
        stream.addData(chunk.toSeq)
        query.processAllAvailable()
      }
      val streamed = s.table("latest_price").collect().map(_.toSeq).toSet
      val batch = streaming.StreamOps.streamingLatestPrice(
        sources.Tables(s, Dir).events).collect().map(_.toSeq).toSet
      assert(streamed == batch)
    } finally query.stop()
  }

  test("rollup materialize-then-read equals the direct dashboard query") {
    val direct = operators.Dashboard.txVolDaily(spark, Dir)
      .collect().map(_.toSeq).toSet
    val served = operators.Dashboard.txVolFromRollup(spark, Dir)
      .collect().map(_.toSeq).toSet
    assert(served == direct)
  }

  test("watermarked dedup: in-watermark re-crawls drop, expired state re-admits") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    // (doc_id, text, event-time minute) — content A is re-crawled once
    // INSIDE the 10-minute watermark window and once long after expiry
    val stream = MemoryStream[(Long, String, Long)]
    val docs = stream.toDF().toDF("doc_id", "text", "min")
      .select(col("doc_id"), col("text"),
        timestamp_millis(col("min") * 60000L).as("ts"))
    val query = dedup.Dedup.streamingDedupWithinWatermark(docs, "10 minutes")
      .writeStream.format("memory").queryName("wm_dedup_out")
      .outputMode("append").start()
    try {
      // minute 100 base — an event AT the initial epoch-0 watermark is
      // judged late and silently dropped (boundary, not semantics)
      stream.addData((1L, "content A", 100L), (2L, "content B", 100L))
      query.processAllAvailable()
      // re-crawl of A at minute 105 — inside the watermark: must drop
      stream.addData((3L, "content A", 105L), (4L, "content C", 105L))
      query.processAllAvailable()
      val mid = s.table("wm_dedup_out").collect().map(_.getAs[Long]("doc_id")).toSet
      assert(mid == Set(1L, 2L, 4L), s"in-watermark re-crawl leaked: $mid")
      // advance event time far past every key's expiry (last A event
      // min 105 + 10 min delay << min 160), then re-crawl A: its state
      // was evicted, so it re-emits — the documented bounded-state trade
      stream.addData((5L, "content D", 160L))
      query.processAllAvailable()
      stream.addData((6L, "content A", 161L))
      query.processAllAvailable()
      val ids = s.table("wm_dedup_out").collect().map(_.getAs[Long]("doc_id")).toSet
      assert(ids == Set(1L, 2L, 4L, 5L, 6L),
        s"expired key must re-admit (proves eviction): $ids")
      // state is bounded by live keys in the watermark window, not by
      // every key ever seen (5 distinct contents seen; A+B+C expired)
      val stateRows = query.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows <= 2, s"state should hold only live keys, has $stateRows")
    } finally query.stop()
  }

  test("streaming shard sink lands gated survivors' chunks shard-partitioned") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import graft.operators.{TextAnalysis, TrainPrep}
    val t = sources.Tables(s, Dir).documents
      .select(col("doc_id"), col("text"), col("lang"))
    val docs = t.as[(Long, String, String)].collect()
    // empty bloom: no contamination — gates are quality/lang/sample
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(1, 1e-6)
    val base = java.nio.file.Files.createTempDirectory("graft-shard-sink-").toString
    val stream = MemoryStream[(Long, String, String)]
    val query = streaming.StreamOps.trainShardSink(
      stream.toDF().toDF("doc_id", "text", "lang"), bloom,
      s"$base/data", s"$base/ckpt")
    try {
      val (first, second) = docs.splitAt(docs.length / 2)
      stream.addData(first.toSeq)
      query.processAllAvailable()
      stream.addData((first ++ second).toSeq) // replays the first half
      query.processAllAvailable()
    } finally query.stop()

    // batch mirror: gate, dedup by content, chunk, shard — compared on
    // content keys (the streaming survivor's doc_id is arrival-order)
    val gatedBatch = t
      .filter(TextAnalysis.qualityScoreCol(col("text")) >= 0.25)
      .filter(TextAnalysis.predLangCol(col("text")) =!= "unknown")
      .filter(TrainPrep.stratifiedKeep(Map("en" -> 400), 1000))
      .filter(operators.CorpusStats.repetitiveFlag === 0L)
      .withColumn("content_hash", md5(col("text")))
      .dropDuplicates("content_hash")
      .withColumn("shard", pmod(conv(substring(md5(col("text")), 1, 15), 16, 10)
        .cast("long"), lit(8L)))
    val mirror = TrainPrep.chunkDocsOf(gatedBatch, carry = Seq("shard", "content_hash"))
      .select(col("content_hash"), col("chunk_id"), col("n_tokens"),
        col("chunk_text"), col("shard"))
      .collect().map(_.toSeq).toSet
    val stored = s.read.parquet(s"$base/data")
      .select(col("content_hash"), col("chunk_id"), col("n_tokens"),
        col("chunk_text"), col("shard").cast("long").as("shard"))
      .collect().map(_.toSeq).toSet
    assert(stored.nonEmpty)
    assert(stored == mirror,
      s"stream/batch divergence: ${(stored -- mirror).take(3)} vs ${(mirror -- stored).take(3)}")
    // files really are shard-partitioned (the pruned-read layout)
    val dirs = new java.io.File(s"$base/data").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(dirs.length > 1, s"expected shard= partition dirs, got ${dirs.mkString(",")}")
  }

  test("streaming dedup drops duplicates across micro-batches via state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val docs = sources.Tables(s, Dir).documents
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val stream = MemoryStream[(Long, String)]
    val query = dedup.Dedup.streamingDedup(stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      val (first, second) = docs.splitAt(docs.length / 2)
      stream.addData(first.toSeq)
      query.processAllAvailable()
      // second batch REPLAYS the first half (cross-batch duplicates)
      // plus the rest — state must drop every replayed doc
      stream.addData((first ++ second).toSeq)
      query.processAllAvailable()
      val out = s.table("dedup_out").collect()
      val distinctHashes = docs.map(_._2).distinct.length
      assert(out.length == distinctHashes,
        s"emitted ${out.length}, expected $distinctHashes")
      assert(out.map(_.getAs[String]("content_hash")).distinct.length == out.length)
    } finally query.stop()
  }

  test("streaming ingest funnel gates rows statelessly and dedups across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import graft.functions.TextFunctions.words
    import graft.operators.{TextAnalysis, TrainPrep}

    val t = sources.Tables(s, Dir).documents
      .select(col("doc_id"), col("text"), col("lang"))
    val docs = t.as[(Long, String, String)].collect()
    // contamination bloom: the 8-grams of one seed doc — the seed (and
    // only docs sharing a gram with it) must be dropped by the probe.
    // Built via the ONE shared builder (TrainPrep.gramBloom), exactly
    // like the batch decontamination path: a spec-local filter in a
    // different hash domain would mask a build/probe domain mismatch
    // (every probe missing ⇒ contaminated docs pass — the round-3 bug).
    val seedId = docs.head._1
    val bloom = TrainPrep.gramBloom(t.filter(col("doc_id") === seedId))

    val stream = MemoryStream[(Long, String, String)]
    val query = streaming.StreamOps.streamingIngestFunnel(
        stream.toDF().toDF("doc_id", "text", "lang"), bloom)
      .writeStream.format("memory").queryName("ingest_out")
      .outputMode("append").start()
    try {
      val (first, second) = docs.splitAt(docs.length / 2)
      stream.addData(first.toSeq)
      query.processAllAvailable()
      stream.addData((first ++ second).toSeq) // replays the first half
      query.processAllAvailable()
      val out = s.table("ingest_out").collect()
      val outIds = out.map(_.getAs[Long]("doc_id")).toSet

      // batch mirror of the stateless gates (probe in the gramBloom
      // domain, as the funnel does; repetition gate included since r4)
      val passing = t
        .filter(TextAnalysis.qualityScoreCol(col("text")) >= 0.25)
        .filter(TextAnalysis.predLangCol(col("text")) =!= "unknown")
        .filter(TrainPrep.stratifiedKeep(Map("en" -> 400), 1000))
        .filter(operators.CorpusStats.repetitiveFlag === 0L)
        .filter(!exists(graft.functions.GramHashes(words(col("text")), 8),
          h => graft.functions.BloomContains.ofHashed(h, bloom)))
        .select(col("doc_id"), md5(col("text")).as("h"))
        .collect()
      assert(!outIds.contains(seedId), "contaminated seed doc passed the bloom gate")
      assert(outIds.subsetOf(passing.map(_.getLong(0)).toSet),
        "stream emitted a doc the batch gates reject")
      // one survivor per distinct passing content hash
      assert(out.length == passing.map(_.getString(1)).distinct.length)
      // the funnel must actually gate (not pass everything through)
      assert(out.length < docs.length)
    } finally query.stop()
  }

  test("streaming account_tx fan-out materializes the batch fan-out, bucket-pruned") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = sources.Tables(s, Dir).events
      .select(col("event_id"), col("ts").cast("timestamp"),
        col("user_id"), col("props"))
      .as[(Long, Timestamp, Long, String)].collect()
    val base = java.nio.file.Files.createTempDirectory("graft_atx_")
    val (path, ckpt) = (s"$base/data", s"$base/ckpt")
    val stream = MemoryStream[(Long, Timestamp, Long, String)]
    val query = streaming.StreamOps.accountTxSink(
      stream.toDF().toDF("event_id", "ts", "user_id", "props"), path, ckpt)
    try {
      rows.grouped(400).foreach { chunk =>
        stream.addData(chunk.toSeq)
        query.processAllAvailable()
      }
      val sunk = s.read.parquet(path)
        .select("account", "event_id", "ts_ms").collect().map(_.toSeq).toSet
      val batch = operators.Messages.accountTxFanout(s, Dir)
        .collect().map(_.toSeq).toSet
      assert(sunk == batch)
      // keyed read returns exactly that account's rows
      val acct = batch.head.head.asInstanceOf[Long]
      val keyed = streaming.StreamOps.accountTxRead(s, path, acct)
        .collect().map(_.toSeq).toSet
      assert(keyed == batch.filter(_.head == acct) && keyed.nonEmpty)
    } finally query.stop()
  }

  test("stream-static account enrichment matches the batch join") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val t = sources.Tables(s, Dir)
    val rows = t.events
      .select(col("event_id"), col("ts").cast("timestamp"),
        col("user_id"), col("props"))
      .as[(Long, Timestamp, Long, String)].collect()
    val stream = MemoryStream[(Long, Timestamp, Long, String)]
    val enriched = streaming.StreamOps.enrichAccounts(
      operators.Messages.fanoutTransform(
        stream.toDF().toDF("event_id", "ts", "user_id", "props")),
      t.customer)
    val query = enriched.writeStream.format("memory")
      .queryName("enrich_out").outputMode("append").start()
    try {
      stream.addData(rows.toSeq)
      query.processAllAvailable()
      val streamed = s.table("enrich_out").collect().map(_.toSeq).toSet
      val batch = streaming.StreamOps.enrichAccounts(
        operators.Messages.accountTxFanout(s, Dir), t.customer)
        .collect().map(_.toSeq).toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally query.stop()
  }

  test("watermark evicts state in append mode") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double)]
    val input = stream.toDF().toDF("ts", "event_type", "value")
    val query = streaming.StreamOps.streamingTumblingAgg(input)
      .writeStream.format("memory").queryName("append_out")
      .outputMode("append").start()
    try {
      def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)
      stream.addData(Seq((ts(0), "a", 1.0), (ts(30), "a", 2.0)))
      query.processAllAvailable()
      // advance event time beyond watermark (window end + 10 min)
      stream.addData(Seq((ts(75), "a", 3.0)))
      query.processAllAvailable()
      stream.addData(Seq((ts(140), "a", 4.0)))
      query.processAllAvailable()
      val out = s.table("append_out").collect()
      // the first (closed) window must have been emitted exactly once
      assert(out.exists(_.getAs[Long]("n_events") == 2L))
    } finally query.stop()
  }

  test("streaming heavy hitters carry the MG guarantee over everything ingested") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val texts = sources.Tables(s, Dir).documents
      .select(col("text")).as[String].collect()
    val stream = MemoryStream[String]
    val query = streaming.StreamOps.streamingHeavyHitters(
        stream.toDF().toDF("text"), k = 32)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode("complete").start()
    try {
      val (first, second) = texts.splitAt(texts.length / 2)
      stream.addData(first.toSeq)
      query.processAllAvailable()
      stream.addData(second.toSeq)
      query.processAllAvailable()
      val got = s.table("hh_out").collect()
        .map(r => r.getAs[String]("token") -> r.getAs[Long]("est_count")).toMap
      val exact = texts.flatMap(_.split(" ")).groupBy(identity)
        .view.mapValues(_.length.toLong).toMap
      val n = exact.values.sum
      val bound = n.toDouble / 33
      assert(got.size <= 32)
      val heavy = exact.filter(_._2 > bound).keySet
      assert(heavy.nonEmpty && (heavy -- got.keySet).isEmpty,
        s"streaming MG missed ${heavy -- got.keySet}")
      got.foreach { case (t, est) =>
        assert(est <= exact.getOrElse(t, 0L) &&
          exact.getOrElse(t, 0L) - est <= bound + 1e-9, s"$t estimate off: $est")
      }
    } finally query.stop()
  }
}
