package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.dedup.MinHashWarehouse.isBase
import graft.functions.Exact.{roundx, sumx}
import graft.functions.TextFunctions.words
import graft.sources.Tables

/** The BM25 posting table AT REST — the lexical index the warehouse
  * family was missing (MinHashWarehouse: J-dedup; LshWarehouse:
  * cosine; Ivf/PqWarehouse: ANN; this: term scoring).  The production
  * shape is benchmark decontamination at the PB-vs-MB asymmetry: the
  * standing corpus tokenizes ONCE at ingest into (term, doc, tf) rows
  * with df and |d| denormalized on, and every later probe — an eval
  * set, a dedup audit, a more-like-this batch — scores against the
  * index without ever re-reading corpus text.
  *
  * Layout:
  *  - `<path>`: posting rows (term, doc_id, tf, df, len) partitioned
  *    by tb = pmod(xxhash64(term), 64) — term-hash buckets, so a probe
  *    whose term set maps to few buckets PRUNES partitions (the
  *    single-eval-item serving path; spec-asserted via listFiles).
  *    df/len ride each row: at probe time there is NO df join and NO
  *    length join — integer stats at rest, floats only in the probe's
  *    codegen (storing idf as a double would also work but integers
  *    at rest dodge every canonicalization hazard).
  *  - `<path>.stats`: one row (n, sl) — corpus size and total token
  *    count, the two scalars BM25's length normalization needs.
  *
  * Probe: query term sets join the pruned index ON term (Catalyst
  * picks broadcast for serving-batch-sized query sides, shuffle for
  * corpus-shaped ones — both correct; the index side never exceeds
  * the probed buckets), per-(query, doc) scores through the DECIMAL
  * route, top-k via WindowGroupLimit.  Arithmetic is the Bm25.bm25
  * expression tree token-for-token, so the registered probe holds the
  * same DuckDB oracle pairing (base/incoming split mirrored in SQL).
  *
  * The base/incoming split is doc_id mod 10 (8:2), shared with
  * MinHashWarehouse; the registered probe batch is additionally
  * bounded (doc_id < 1000) — probes arrive in serving-batch units,
  * and an unbounded 20%-of-corpus probe would time the batch's size,
  * not the index's serving shape.
  */
object Bm25Warehouse {

  // scoring constants are OWNED by Bm25 — the warehouse probe must
  // never fork from the inline leg's arithmetic (the round-4 Bloom
  // build/probe-drift lesson)
  import Bm25.{K1, B, K1Plus1, OneMinusB}
  private val TermBuckets = 64

  private def statsPath(path: String): String = s"$path.stats"

  private def termBucket(term: org.apache.spark.sql.Column) =
    pmod(xxhash64(term), lit(TermBuckets.toLong))

  /** Ingest: tokenize the base corpus once, write the stats-denormalized
    * posting table partitioned by term bucket + the 1-row stats side. */
  def materialize(spark: SparkSession, dir: String, path: String): Unit = {
    val toks = Tables(spark, dir).documents.filter(isBase)
      .select(col("doc_id"), words(col("text")).as("toks"))
    val lens = toks.select(col("doc_id"),
      size(col("toks")).cast("long").as("len"))
    val tf = toks.select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(df, Seq("term")).join(lens, Seq("doc_id"))
      .withColumn("tb", termBucket(col("term")))
      .write.mode("overwrite").partitionBy("tb").parquet(path)
    lens.agg(count(lit(1)).as("n"), sum(col("len")).as("sl"))
      .write.mode("overwrite").parquet(statsPath(path))
  }

  /** Score `queries` = (query_id, term) rows against the index: top-`k`
    * base docs per query.  The bucket list of the query terms is ≤64
    * driver values (the IvfWarehouse.probeBatch unionCids pattern) and
    * becomes the literal partition-pruning predicate. */
  def probe(spark: SparkSession, path: String, queries: DataFrame,
      k: Int = 10): DataFrame = {
    val st = spark.read.parquet(statsPath(path)).head()
    val n = st.getLong(0)
    val avgdl = st.getLong(1).toDouble / n
    val buckets = queries.select(termBucket(col("term")).as("tb"))
      .distinct().collect().map(_.getLong(0))
    val index = spark.read.parquet(path)
      .filter(col("tb").isin(buckets.toIndexedSeq.map(java.lang.Long.valueOf): _*))
    val idf = log((lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val term = idf * ((col("tf") * lit(K1Plus1)) /
      (col("tf") + lit(K1) * (lit(OneMinusB) + lit(B) * (col("len") / lit(avgdl)))))
    val byQ = Window.partitionBy(col("query_id"))
      .orderBy(col("bm25").desc, col("doc_id"))
    index.join(queries, Seq("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sumx(roundx(term, 9)).as("score"))
      .withColumn("bm25", roundx(col("score"), 4))
      .withColumn("rnk", row_number().over(byQ))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("doc_id"), col("bm25"),
        col("rnk").cast("long").as("rnk"))
  }

  /** Registered probe: the bounded incoming batch's term sets against
    * the index at rest. */
  def probeIncoming(spark: SparkSession, dir: String, path: String): DataFrame =
    probe(spark, path, incomingTerms(spark, dir))

  /** (query_id, term) rows of the bounded incoming batch — tokenizes
    * ONLY the probe side. */
  private[graft] def incomingTerms(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .filter(!isBase && col("doc_id") < 1000)
      .select(col("doc_id").as("query_id"),
        explode(words(col("text"))).as("term"))
      .distinct()

  /** The probe's ONLINE twin — decontamination in flight: each arriving
    * micro-batch of docs scores against the index inside foreachBatch.
    * A doc's score depends ONLY on its own terms and the index at
    * rest, so the per-(query, doc) aggregation is batch-LOCAL — no
    * watermark, no state store, nothing grows with stream length (the
    * streamingDedup stance; here even the stream-static join lives in
    * foreachBatch because the score SUM would otherwise be cross-batch
    * state Spark cannot know is already complete when the doc's row
    * closes).  `sink` receives each micro-batch's scored top-k frame —
    * the foreachBatch contract parquetUpsertSink uses.
    * (Bm25WarehouseSpec drives a MemoryStream across batches and
    * asserts exact agreement with the batch probe.) */
  def streamingProbe(docs: DataFrame, path: String, k: Int = 10)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val q = batch.select(col("doc_id").as("query_id"),
          explode(words(col("text"))).as("term")).distinct()
        sink(probe(batch.sparkSession, path, q, k))
      }
      .start()
}
