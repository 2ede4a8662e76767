package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.MinHashWarehouse.isBase
import graft.functions.Exact.{roundx, sumx}
import graft.functions.TextFunctions.words
import graft.sources.{CommitLog, Tables}

/** The unigram LM AT REST — quality scoring's member of the warehouse
  * family (MinHashWarehouse: J-dedup, LshWarehouse: cosine,
  * Ivf/PqWarehouse: ANN, Bm25Warehouse: term scoring, this: LM
  * perplexity).  The production shape is CCNet-style crawl triage at
  * the PB-vs-MB asymmetry: the LM is trained ONCE over the standing
  * corpus, and every later probe — a crawl batch, a vendor drop, an
  * ingest stream — is scored against the frozen model without ever
  * re-reading corpus text.
  *
  * Layout (the Bm25Warehouse conventions, APPEND-ONLY for refresh):
  *  - `<path>`: (term, cnt) DELTA rows partitioned by tb =
  *    pmod(xxhash64(term), 64) — a probe's term set maps to a driver
  *    bucket list that PRUNES partitions (spec-asserted via
  *    listFiles), then sums deltas per term over the pruned slice
  *    (vocabulary-bounded — metadata-scale), so `refresh` folds a
  *    batch in by appending its term counts instead of rewriting the
  *    model; counts at rest are integers, floats exist only in the
  *    probe's codegen.
  *  - `<path>.stats`: one row (nb, v) — corpus token count and
  *    vocabulary size; refresh rewrites it from driver scalars (nb +=
  *    batch tokens; v += batch terms not yet in the index, counted by
  *    an anti-join against the PRUNED standing model — O(batch)).
  *
  * Model: OPEN-vocabulary Laplace smoothing over v+1 classes (the v
  * base terms + one UNK bucket every unseen term shares):
  * p(t) = (cnt+1)/(nb+v+1), OOV ⇒ 1/(nb+v+1).  This differs
  * deliberately from t_perplexity's closed full-corpus vocabulary —
  * an index at rest cannot know future probes' vocabularies, so the
  * UNK convention is the only one that serves unseen text (the
  * registered probe and its oracle mirror it exactly).
  *
  * Probe: tokenize ONLY the probe batch (plan-asserted: one documents
  * scan), LEFT-join the pruned LM on term, one doc-keyed partial agg;
  * nll per token through the s_bm25 9-dp + DECIMAL ln license —
  * oracled.  Scores are per-doc and batch-local, so the streaming
  * twin runs stateless inside foreachBatch (no watermark, no state
  * store — the Bm25Warehouse.streamingProbe stance).
  */
object LmWarehouse {

  private val TermBuckets = 64

  private def statsPath(path: String): String = s"$path.stats"

  private def termBucket(term: org.apache.spark.sql.Column) =
    pmod(xxhash64(term), lit(TermBuckets.toLong))

  /** Train once: write the bucket-partitioned (term, cnt) table and
    * the 1-row (nb, v) stats side from the base split. */
  def materialize(spark: SparkSession, dir: String, path: String): Unit =
    materializeFrom(Tables(spark, dir).documents.filter(isBase), path)

  /** Frame-level ingest — also the refresh-equivalence spec's one-shot
    * reference builder. */
  def materializeFrom(docs: DataFrame, path: String): Unit = {
    val toks = docs.select(explode(words(col("text"))).as("term"))
    val lm = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // one token pass feeds both the table and (nb, v)
    CommitLog.transaction(toks.sparkSession, path) { t =>
      t.replace(lm.withColumn("tb", termBucket(col("term"))), path, Seq("tb"))
      t.replace(lm.agg(sum(col("cnt")).as("nb"), count(lit(1)).as("v")),
        statsPath(path))
    }
  }

  /** REFRESH — fold an accepted crawl batch into the LM at rest:
    * append the batch's (term, cnt) deltas, bump (nb, v).  O(batch):
    * tokenizes only the batch; the new-term count anti-joins the
    * batch vocabulary against the standing model restricted to the
    * batch's own term buckets (partition-pruned reads); no standing
    * row is rewritten.  Batch doc_ids/terms need no uniqueness — the
    * probe sums deltas per term. */
  def refresh(spark: SparkSession, batch: DataFrame, path: String): Unit = {
    // stats scalars ride the delta's own materialization and the stats
    // write's plan (optimization r16, guide §1.2 — VERDICT-r15 ask #7):
    // the old verb paid an eager isEmpty probe, a batchTokens aggregate
    // job and a 1-row stats head() per refresh; batchTokens/emptiness
    // now come off an observe() on the delta checkpoint, and the
    // (nb, v) replace is a 1-row PLAN over the pinned stats snapshot
    // crossJoined with the new-term count — the anti-join count job
    // folds into the transaction's own write.  Same integers.
    val obs = new org.apache.spark.sql.Observation()
    val delta = batch.select(explode(words(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .observe(obs, coalesce(sum(col("cnt")), lit(0L)).as("bt"),
        count(lit(1)).as("nterms"))
      .localCheckpoint()
    if (obs.get("nterms").asInstanceOf[Long] == 0L) return // empty batch
    val batchTokens = obs.get("bt").asInstanceOf[Long]
    val buckets = delta.select(termBucket(col("term")).as("tb"))
      .distinct().collect().map(_.getLong(0))
    // standing vocab = terms whose SUMMED count is nonzero — a
    // fully-retracted term leaves zero-sum delta rows behind, and a
    // distinct-over-rows check would misread it as still-known,
    // undercounting v when the term re-enters (retract∘refresh ==
    // rebuild requires the sum-based membership retract itself uses)
    val snap = CommitLog.snapshot(spark, path)
    val standing = snap.read(path)
      .filter(col("tb").isin(buckets.toIndexedSeq.map(java.lang.Long.valueOf): _*))
      .groupBy(col("term")).agg(sum(col("cnt")).as("scnt"))
      .filter(col("scnt") =!= 0)
      .select(col("term"))
    val newTerms = delta.join(standing, Seq("term"), "left_anti")
      .agg(count(lit(1)).as("nt"))
    // model append + stats replace land as ONE transaction — a reader
    // can never see the deltas without the matching denominator
    CommitLog.transaction(spark, path) { t =>
      t.append(delta.withColumn("tb", termBucket(col("term"))), path, Seq("tb"))
      t.replace(snap.read(statsPath(path)).crossJoin(newTerms)
        .select((col("nb") + lit(batchTokens)).as("nb"),
          (col("v") + col("nt")).as("v")), statsPath(path))
    }
  }

  /** RETRACT — the delete verb on the BIT-EQUAL rung (round 10,
    * extending VERDICT-r09 ask #1 across the matrix): LM state is
    * additive integer counts, so removing docs appends their term
    * counts NEGATED — after which every probe-side per-term sum is
    * literally the rebuild-on-survivors integer.  The stats decrement
    * is exact too: nb loses the removed token count; v loses the
    * terms whose ENTIRE standing count the removal erases (counted by
    * comparing the removed counts against the standing sums over the
    * removed terms' own buckets — partition-pruned, O(removed vocab),
    * the refresh new-term anti-join's mirror).  A vanished term then
    * probes as OOV — and Laplace makes that seamless: cnt 0 scores
    * (0+1)/denom, the exact UNK value, so probe-after-retract ==
    * probe-on-rebuild BIT-FOR-BIT even before compact folds the zero
    * rows out (LmWarehouseSpec pins it).  Precondition (the crawl
    * contract mirrored): removed docs were ingested with this exact
    * text. */
  def retract(spark: SparkSession, removed: DataFrame, path: String): Unit = {
    // the refresh verb's stats-fold shape, mirrored (optimization r16):
    // removedTokens/emptiness off the delta observe, the (nb, v)
    // decrement as a 1-row plan over the pinned snapshot + the
    // vanished-term count — two aggregate jobs and a head() gone
    val obs = new org.apache.spark.sql.Observation()
    val delta = removed.select(explode(words(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .observe(obs, coalesce(sum(col("cnt")), lit(0L)).as("rt"),
        count(lit(1)).as("nterms"))
      .localCheckpoint()
    if (obs.get("nterms").asInstanceOf[Long] == 0L) return // empty takedown
    val removedTokens = obs.get("rt").asInstanceOf[Long]
    val buckets = delta.select(termBucket(col("term")).as("tb"))
      .distinct().collect().map(_.getLong(0))
    val snap = CommitLog.snapshot(spark, path)
    val standing = snap.read(path)
      .filter(col("tb").isin(buckets.toIndexedSeq.map(java.lang.Long.valueOf): _*))
      .groupBy(col("term")).agg(sum(col("cnt")).as("scnt"))
    val vanished = delta.join(standing, Seq("term"))
      .filter(col("scnt") === col("cnt"))
      .agg(count(lit(1)).as("vt"))
    CommitLog.transaction(spark, path) { t =>
      t.append(delta.select(col("term"), (-col("cnt")).as("cnt"))
        .withColumn("tb", termBucket(col("term"))), path, Seq("tb"))
      t.replace(snap.read(statsPath(path)).crossJoin(vanished)
        .select((col("nb") - lit(removedTokens)).as("nb"),
          (col("v") - col("vt")).as("v")), statsPath(path))
    }
  }

  /** COMPACT — merge accumulated (term, cnt) delta rows back to ONE
    * row per term in the same bucket layout (the Bm25Warehouse.compact
    * segment-merge stance).  Stats are untouched — (nb, v) are already
    * maintained exactly by refresh/retract — and probes are
    * bit-identical before/after (integer delta sums are order-free;
    * WarehouseCompactSpec pins it).  Fully-retracted terms fold to 0
    * and DROP, making the compacted table literally the
    * rebuild-on-survivors state (vacuous when nothing was retracted).
    * Under CommitLog the merge writes a NEW generation dir (never its
    * own source), so no pin is needed; CommitLog.vacuum reclaims the
    * dead generations on the retention cadence (separate verb —
    * pinned probe snapshots stay readable across this compact). */
  def compact(spark: SparkSession, path: String): Unit = {
    val merged = CommitLog.snapshot(spark, path).read(path)
      .groupBy(col("term"), col("tb")).agg(sum(col("cnt")).as("cnt"))
      .filter(col("cnt") =!= 0)
    CommitLog.transaction(spark, path)(_.replace(merged, path, Seq("tb")))
  }

  /** Score `docs` = (doc_id, text) against the LM at rest: per-doc avg
    * negative log-likelihood per token.  The probe's term buckets are
    * ≤64 driver values and become the literal partition-pruning
    * predicate (the Bm25Warehouse.probe pattern). */
  def probe(spark: SparkSession, path: String, docs: DataFrame): DataFrame = {
    // one snapshot pins model + stats together (no torn denominator)
    val snap = CommitLog.snapshot(spark, path)
    // probe tokens are pinned once (they feed the bucket collect AND
    // the scoring join), and the stats scalars ride the plan as a
    // broadcast 1-row relation instead of an eager head() — two fewer
    // jobs per probe rep (optimization r15, the Bm25Warehouse.probe
    // shape); denominator arithmetic value-identical
    val toks = docs.select(col("doc_id"), explode(words(col("text"))).as("term"))
      .localCheckpoint()
    val buckets = toks.select(termBucket(col("term")).as("tb"))
      .distinct().collect().map(_.getLong(0))
    // sum delta rows per term over the pruned slice — the probe-side
    // merge that keeps refresh append-only (vocabulary-bounded agg)
    val lm = snap.read(path)
      .filter(col("tb").isin(buckets.toIndexedSeq.map(java.lang.Long.valueOf): _*))
      .groupBy(col("term")).agg(sum(col("cnt")).as("cnt"))
    val stats = broadcast(snap.read(statsPath(path))
      .select((col("nb") + col("v") + lit(1L)).cast("double").as("__denom")))
    val nll = roundx(-log(
      (coalesce(col("cnt"), lit(0L)) + lit(1.0)) / col("__denom")), 9)
    toks.join(lm, Seq("term"), "left")
      .crossJoin(stats)
      .groupBy(col("doc_id"))
      .agg(sumx(nll).as("nll_sum"), count(lit(1)).as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        roundx(col("nll_sum") / col("n_tokens"), 6).as("nll"))
  }

  /** Registered probe: the bounded incoming batch against the LM at
    * rest (base/incoming split + batch bound shared with
    * Bm25Warehouse.probeIncoming). */
  def probeIncoming(spark: SparkSession, dir: String, path: String): DataFrame =
    probe(spark, path, Tables(spark, dir).documents
      .filter(!isBase && col("doc_id") < 1000)
      .select(col("doc_id"), col("text")))

  /** The retraction build for the registered
    * `t_perplexity_probe_retracted` query: train on the base split,
    * retract the mod-7 base docs (the shared retraction slice) — the
    * incoming probe must then score exactly as an LM trained on
    * mod 0..6 (counts, nb, v and all). */
  def materializeRetracted(spark: SparkSession, dir: String, path: String): Unit = {
    materialize(spark, dir, path)
    retract(spark, Tables(spark, dir).documents
      .filter(pmod(col("doc_id"), lit(10)) === 7), path)
  }

  /** The probe's ONLINE twin — crawl triage in flight: each arriving
    * micro-batch scores against the frozen LM inside foreachBatch.
    * Per-doc nll depends only on the doc's own tokens and the index
    * at rest, so nothing is cross-batch state.  (LmWarehouseSpec
    * drives a MemoryStream and asserts exact agreement with the batch
    * probe.) */
  def streamingProbe(docs: DataFrame, path: String)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(probe(batch.sparkSession, path, batch))
      }
      .start()
}
