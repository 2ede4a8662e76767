package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Exact.{roundx, sumx}
import graft.functions.TextFunctions.words
import graft.sources.Tables

/** Training-data preparation operators over `documents` — the steps
  * between "deduped corpus" and "batches on a trainer": context
  * chunking, deterministic split assignment, shard layout, scrubbing.
  *
  * Scale notes: chunking/split/redaction are pure per-row column math
  * (narrow, scan-speed, whole-stage codegen, zero shuffle).  Sharding
  * shuffles once on the bounded shard key and runs its ordinal window
  * PARTITIONED BY SHARD — never a global row_number.  Every hash here
  * is md5-derived (engine-portable, content-deterministic): re-running
  * the pipeline, on any engine, reassigns identical splits/shards —
  * the property that makes train/test leakage audits possible.
  */
object TrainPrep {

  /** Portable content hash: first 15 md5 hex digits as a BIGINT
    * (< 2⁶⁰, always non-negative — safe under % on both engines). */
  private[graft] def contentHash(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Context-window chunking: split each doc into `size`-word windows
    * every `stride` words (overlap = size − stride keeps boundary
    * context, the standard LM packing shape).  One explode — narrow,
    * no shuffle; chunk count is integer math (FP ceil misrounds at
    * exact multiples). */
  def chunkDocs(spark: SparkSession, dir: String,
      size: Int = 64, stride: Int = 48): DataFrame =
    chunkDocsOf(Tables(spark, dir).documents, size, stride)

  /** Frame-level chunking entry (docs = (doc_id, text, …)) — shared by
    * the registered query, TrainWarehouse (chunks only the funnel's
    * survivors) and the streaming shard sink.  `carry` names columns
    * of `docs` to pass through onto every chunk row — they ride the
    * explode as attribute references (computed once per DOC in the
    * Project below the Generate), never as re-evaluated expressions
    * (the alongside-explode trap of CorpusStats.repetition). */
  def chunkDocsOf(docs: DataFrame,
      size: Int = 64, stride: Int = 48,
      carry: Seq[String] = Nil): DataFrame = {
    val w = words(col("text"))
    val n = org.apache.spark.sql.functions.size(w)
    val nChunks = when(n <= size, lit(1))
      .otherwise(lit(1) + floor((n - lit(size) + lit(stride - 1)) / lit(stride.toDouble)).cast("int"))
    val cc = carry.map(col)
    docs
      .select(Seq(col("doc_id"), w.as("w"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_id")) ++ cc: _*)
      .select(Seq(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        slice(col("w"), col("chunk_id") * stride + 1, lit(size)).as("cw")) ++ cc: _*)
      .select(Seq(col("doc_id"), col("chunk_id"),
        org.apache.spark.sql.functions.size(col("cw")).cast("long").as("n_tokens"),
        array_join(col("cw"), " ").as("chunk_text")) ++ cc: _*)
  }

  /** Deterministic train/val/test assignment: content-hash mod 100 →
    * 80/10/10.  Hash-of-content (not random()) means the split is
    * stable across runs, engines and repartitionings, and duplicate
    * texts always land in the SAME split — no leakage across the
    * boundary from re-crawled content. */
  def sampleSplit(spark: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(contentHash(col("text")), lit(100L))
    Tables(spark, dir).documents
      .select(col("doc_id"), bucket.as("bucket"),
        when(bucket < 80, "train").when(bucket < 90, "val")
          .otherwise("test").as("split"))
  }

  /** Stratified (per-language) deterministic downsampling — the data-
    * mixing step that rebalances an over-represented language before
    * training (e.g. keep 40% of `en`, 100% of everything else).  Same
    * hash-of-content selection as `sampleSplit`: the kept set is stable
    * across runs/engines/partitionings and duplicate texts share a
    * fate, so dedup before or after sampling commutes.  Pure per-row
    * column math — narrow, scan-speed, zero shuffle; random() sampling
    * (nondeterministic, partitioning-dependent) is the anti-pattern
    * this avoids. */
  /** The per-row keep decision of stratified sampling, shared with the
    * corpus funnel and the streaming ingest funnel: content-hash
    * bucket < the language's keep rate (per mille). */
  private[graft] def stratifiedKeep(rates: Map[String, Int], defaultRate: Int) = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (l, r)) =>
      when(col("lang") === l, lit(r)).otherwise(acc)
    }
    pmod(contentHash(col("text")), lit(1000L)) < rate
  }

  /** `d_sample_weighted`: exact-k WEIGHTED sampling without
    * replacement (Efraimidis & Spirakis 2006, the exponential-race
    * form): each doc draws a hash-derived uniform u ∈ (0, 1) and
    * races with key = −ln(u)/w — the k smallest keys ARE a weighted
    * sample without replacement, here with w = the t_quality score,
    * so high-quality docs win proportionally more seats.  The
    * exact-k complement of d_dsir_sample's RATE-based selection
    * (budgeted curation pulls "the best 64", not "about 6%").
    *
    * Determinism/oracle: u = (md5-52-bit + 1)/(2⁵² + 1) — an exact
    * rational both engines compute identically (the t_fingerprint
    * hash-parse pattern); ln through the engine-wide 9-dp license;
    * w is the 4-dp-rounded shared quality expression; ties break on
    * doc_id.  ORACLED.
    *
    * 100 TB: keys are per-row scan math; the cut is top-k =
    * TakeOrderedAndProject (per-partition heaps — no global sort,
    * no window). */
  def sampleWeighted(spark: SparkSession, dir: String, k: Int = 64): DataFrame = {
    val md5hex = md5(col("doc_id").cast("string").cast("binary"))
    val u = (conv(substring(md5hex, 1, 13), 16, 10).cast("long") + 1).cast("double") /
      lit((1L << 52).toDouble + 1.0)
    val w = graft.operators.TextAnalysis.qualityScoreCol(col("text"))
    // asc_nulls_last (mirrored by NULLS LAST in the oracle): a null
    // text yields null weight/race_key, and Spark's ASC default puts
    // NULLs FIRST while DuckDB's puts them LAST — left unpinned, the
    // two engines would select different top-k sets on degenerate
    // rows.  Pinning the sort (rather than filtering) keeps the row
    // semantics total: degenerate docs lose the race instead of
    // silently disappearing.
    Tables(spark, dir).documents
      .select(col("doc_id"), w.as("weight"),
        graft.functions.Exact.roundx(-log(u) / w, 9).as("race_key"))
      .orderBy(col("race_key").asc_nulls_last, col("doc_id"))
      .limit(k)
  }

  def sampleStratified(spark: SparkSession, dir: String,
      rates: Map[String, Int] = Map("en" -> 400),
      defaultRate: Int = 1000): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), col("lang"),
        pmod(contentHash(col("text")), lit(1000L)).as("bucket"),
        stratifiedKeep(rates, defaultRate).cast("int").cast("long").as("kept"))

  /** Shard layout for training readers: shard = content-hash mod
    * `shards` (uniform, content-stable), ordinal within shard by
    * (hash, doc_id) — a deterministic pseudo-random order, which is
    * exactly what an epoch shuffle wants.  The ordinal window is
    * partitioned by shard, so at 100 TB each shard's numbering runs
    * parallel — a GLOBAL row_number (one partition) is the anti-
    * pattern this operator avoids. */
  def trainShards(spark: SparkSession, dir: String, shards: Int = 8): DataFrame =
    shardLayoutOf(Tables(spark, dir).documents, shards)

  /** Frame-level shard layout (docs = (doc_id, text, …)) — shared by
    * the registered query (whole corpus) and TrainWarehouse (funnel
    * survivors only; ordinals are dense within whatever frame is
    * passed). */
  def shardLayoutOf(docs: DataFrame, shards: Int): DataFrame = {
    val h = contentHash(col("text"))
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    docs
      .select(col("doc_id"), h.as("h"), pmod(h, lit(shards.toLong)).as("shard"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** Per-domain document caps (the RefinedWeb/C4 curation rule: no
    * single domain may dominate the corpus) — keep each source's top
    * `cap` documents by quality score.  Complements d_domain_mix:
    * mix RESAMPLES to a target token mixture, cap BOUNDS absolute
    * per-domain document counts; production pipelines run both.
    *
    * Scale shape: the rank ≤ cap filter compiles to WindowGroupLimit
    * (partial per-partition top-cap heaps BEFORE the source exchange,
    * final limit after — the q_delegators_top pattern), so a
    * dominant domain never funnels its full row set through one
    * reducer: each map partition forwards at most `cap` rows per
    * source.  Ordering is engine-stable: quality_score is roundx'd to
    * 4 dp (exact ties in both engines), doc_id breaks ties. */
  def domainCap(spark: SparkSession, dir: String, cap: Int = 20): DataFrame = {
    val byQuality = Window.partitionBy(col("source"))
      .orderBy(col("quality_score").desc, col("doc_id"))
    Tables(spark, dir).documents
      .select(col("doc_id"), col("source"),
        TextAnalysis.qualityScoreCol(col("text")).as("quality_score"))
      .withColumn("rk", row_number().over(byQuality).cast("long"))
      .filter(col("rk") <= cap)
      .select(col("doc_id"), col("source"), col("rk"), col("quality_score"))
  }


  /** Domain-mixture resampling — compute the keep RATES from a target
    * mixture, the step upstream of `sampleStratified` (which takes
    * rates as given): given relative target weights per `source`
    * (e.g. boost a curated domain, flatten the web crawl), find the
    * largest output corpus where no domain needs upsampling —
    * M = min over sources of tokens(s)/weight(s) — and keep each
    * source at p(s) = weight(s)·M / tokens(s).  Docs are then kept by
    * the same content-hash bucketing as every sampler here (stable
    * across runs/engines/partitionings; dup texts share a fate).
    *
    * The rate arithmetic is pure INTEGER math at parts-per-million
    * scale — `tokens·10⁶ div weight` then `weight·M div tokens` — so
    * the keep set is engine-exact (the percentile-tie lesson: never
    * let two engines' double ULPs near a keep/drop boundary).  Long
    * headroom: src_tokens·10⁶ caps tokens/source at ~9·10¹², and the
    * later target_w·m_scaled product tightens that by the max/min
    * weight RATIO (m_scaled ≈ min(src_tokens·10⁶/w); ratio 6× at the
    * default 240/40 map → ~1.5·10¹² tokens for the binding source);
    * beyond that (still a multi-PB text corpus) drop to per-mille
    * scale or route the product through DECIMAL(38,0) — documented,
    * not silently lossy.
    *
    * Scale shape: one groupBy(source) over a token-count scan (partial
    * agg; source cardinality is domains, not docs), a 1-row min
    * aggregate broadcast back over the 20-row rate dim (the
    * q_last_hour_ops pattern), then a broadcast join onto the corpus
    * scan — the fact table shuffles zero times. */
  def domainMix(spark: SparkSession, dir: String,
      targets: Map[String, Long] = Map("src0" -> 240L),
      defaultTarget: Long = 40L): DataFrame = {
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), col("source"), col("text"),
        org.apache.spark.sql.functions.size(words(col("text"))).cast("long").as("n_tokens"))
    val weight = targets.foldLeft(lit(defaultTarget)) { case (acc, (s, w)) =>
      when(col("source") === s, lit(w)).otherwise(acc)
    }
    // 20-row materialized leaf: the totals feed BOTH the min aggregate
    // and the rate projection — without the barrier each consumer
    // re-runs the whole corpus scan+shuffle (seen in explain)
    val bySource = docs.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("src_tokens"))
      .withColumn("target_w", weight)
      .localCheckpoint()
    // weight 0 = "drop this source": it must neither divide (ANSI
    // DIVIDE_BY_ZERO) nor bind the no-upsampling minimum
    val mScaled = bySource.filter(col("target_w") > 0)
      .agg(min(expr("(src_tokens * 1000000) DIV target_w")).as("m_scaled"))
    val rates = bySource.crossJoin(broadcast(mScaled))
      .select(col("source"),
        when(col("target_w") <= 0 || col("src_tokens") <= 0, lit(0L))
          .otherwise(least(lit(1000000L),
            expr("(target_w * m_scaled) DIV src_tokens"))).as("keep_ppm"))
    val bucket = pmod(contentHash(col("text")), lit(1000000L))
    docs.join(broadcast(rates), Seq("source"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("keep_ppm"), bucket.as("bucket"),
        (bucket < col("keep_ppm")).cast("long").as("kept"))
  }

  /** Sequence packing — the step between chunking and the trainer: the
    * shard's chunk stream fills fixed-`seqLen`-token training
    * sequences back to back (the GPT-style "pack to context length"
    * layout; chunks straddle sequence boundaries and the trainer masks
    * across them).  Each chunk gets its shard-stream offset and the
    * sequence it STARTS in: seq_id = stream_offset div seqLen.
    *
    * Scale shape: chunks join the shard layout on doc_id, then ONE
    * running-sum window per shard (partitioned — shards fill in
    * parallel, never a global cumsum) and pure integer math.  The
    * deterministic (pos, chunk_id) order means re-running the pipeline
    * reproduces the identical packing — the property that makes a
    * training run resumable from any step count. */
  def packSequences(spark: SparkSession, dir: String,
      seqLen: Int = 256): DataFrame =
    packedChunks(spark, dir)
      .select(col("doc_id"), col("chunk_id"), col("shard"),
        col("stream_offset"),
        floor(col("stream_offset") / lit(seqLen.toLong)).cast("long").as("seq_id"))

  /** The packing's inner frame — (doc_id, chunk_id, shard, n_tokens,
    * stream_offset) — shared by the registered layout (packSequences)
    * and its efficiency report (packStats). */
  private def packedChunks(spark: SparkSession, dir: String): DataFrame = {
    val chunks = chunkDocs(spark, dir)
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"))
    val layout = trainShards(spark, dir)
    val w = Window.partitionBy(col("shard")).orderBy(col("pos"), col("chunk_id"))
    chunks.join(layout, Seq("doc_id"))
      .withColumn("stream_offset",
        (sum(col("n_tokens")).over(w) - col("n_tokens")).cast("long"))
      .select(col("doc_id"), col("chunk_id"), col("shard"), col("n_tokens"),
        col("stream_offset"))
  }

  /** Registered `t_pack_stats`: the PACKING EFFICIENCY report — the
    * telemetry a training-data team reads before every run: per shard,
    * how many chunks and tokens the stream holds, how many
    * `seqLen`-token sequences it fills (ceil division), how many
    * chunks STRADDLE a sequence boundary (each straddler is an
    * attention-masking seam — the packing-quality number), and the
    * fill rate of the final layout in integer ppm (the tail sequence's
    * padding is the only waste under back-to-back packing).
    * All-integer math over packSequences' own inner frame, so the
    * report is hash-exact and composes the t_pack oracle body
    * VERBATIM — a packing-layout change must hit both or neither
    * (the corpus-funnel hoisting discipline). */
  def packStats(spark: SparkSession, dir: String,
      seqLen: Int = 256): DataFrame =
    packedChunks(spark, dir)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_tokens")).as("n_tokens"),
        sum((expr(s"stream_offset DIV $seqLen") =!=
          expr(s"(stream_offset + n_tokens - 1) DIV $seqLen")).cast("long"))
          .as("n_straddlers"))
      .select(col("shard"), col("n_chunks"), col("n_tokens"),
        expr(s"(n_tokens + ${seqLen - 1}) DIV $seqLen").as("n_seqs"),
        col("n_straddlers"),
        // DECIMAL(38,0) before the ppm multiply — same overflow bound
        // as t_fertility's fertility_ppm (ADVICE r12): a 100 TB shard
        // stream can exceed 9.2e12 tokens, where LONG * 1e6 wraps
        expr(s"CAST(n_tokens AS DECIMAL(38,0)) * 1000000 DIV (((n_tokens + ${seqLen - 1}) DIV $seqLen) * $seqLen)")
          .as("fill_ppm"))

  /** Benchmark decontamination: flag train-split docs sharing any word
    * n-gram with the held-out test split (the GPT-3 appendix-C /
    * PaLM-style overlap check; n = 8 here against 13 there because this
    * corpus's docs are 10–99 words).  Exact dups can't leak across the
    * split (same content hash → same bucket), so what this catches is
    * NEAR-dup leakage — re-crawls with small edits.
    *
    * Scale shape: explode distinct n-grams on both sides, equi-join on
    * the gram, count distinct shared grams / eval docs per train doc.
    * In production the eval side is a fixed benchmark suite — MBs, a
    * broadcast — but here it is the 10% split of the corpus itself, so
    * the hint is size-guarded: above threshold it degrades to a
    * shuffled equi-join on the gram key (uniform by construction —
    * grams hot enough to skew a bucket are exactly the ones a real
    * pipeline drops from the check as boilerplate). */
  def decontaminate(spark: SparkSession, dir: String, n: Int = 8): DataFrame = {
    // grams travel as 64-bit hashes from one flat native loop
    // (graft.functions.GramHashes) — gram strings never materialize
    // and the overlap join shuffles primitive keys (~2⁻⁶⁴ per-pair
    // collision odds, the engine-wide 64-bit-hash trade)
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"),
        pmod(contentHash(col("text")), lit(100L)).as("bucket"),
        graft.functions.GramHashes(words(col("text")), n).as("g"))
    val train = docs.filter(col("bucket") < 80)
      .select(col("doc_id"), explode(col("g")).as("hsh"))
    val heldout = docs.filter(col("bucket") >= 90)
      .select(col("doc_id").as("eval_id"), explode(col("g")).as("hsh"))
    train.join(PlanHints.broadcastIfSmall(heldout), Seq("hsh"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("hsh")).as("n_shared_grams"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
  }

  /** The EVAL-SIDE view of the same overlap — the benchmark-health
    * report (Dodge et al. 2021's C4 contamination audit direction):
    * for each held-out doc, how many of its n-grams appear in the
    * train split and how many distinct train docs carry them.  A
    * benchmark item with high overlap is compromised no matter what
    * the train side does about it — `decontaminate` tells the train
    * pipeline what to DROP, this tells the eval owner what to
    * DISTRUST.  Same join, transposed aggregation key: one
    * primitive-key shuffle, eval side broadcast under the same size
    * guard, train side never broadcast.  Fully oracled (the
    * d_decontaminate SQL with the GROUP BY flipped). */
  def contaminationReport(spark: SparkSession, dir: String, n: Int = 8): DataFrame = {
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"),
        pmod(contentHash(col("text")), lit(100L)).as("bucket"),
        graft.functions.GramHashes(words(col("text")), n).as("g"))
    val train = docs.filter(col("bucket") < 80)
      .select(col("doc_id"), explode(col("g")).as("hsh"))
    val heldout = docs.filter(col("bucket") >= 90)
      .select(col("doc_id").as("eval_id"), explode(col("g")).as("hsh"))
    train.join(PlanHints.broadcastIfSmall(heldout), Seq("hsh"))
      .groupBy(col("eval_id"))
      .agg(countDistinct(col("hsh")).as("n_shared_grams"),
        countDistinct(col("doc_id")).as("n_train_docs"))
  }

  /** Bloom-filter decontamination — the production twin of
    * `decontaminate` for the realistic asymmetry: a petabyte train side
    * against a FIXED benchmark suite (MBs of eval grams).  Instead of
    * an equi-join, the eval grams are folded into a Bloom filter
    * (Bloom 1970) built executor-side, and the train scan probes it
    * with a codegen'd expression (graft.functions.BloomContains) —
    * the gram explode never shuffles and the eval side never joins;
    * the filter rides the plan like Spark's own runtime filters.
    *
    * False positives only ADD flagged grams (never miss one), at rate
    * `fpp` per distinct probe — with the default 1e-6, ~0.1 expected
    * extra grams per million, and the Bloom seed is fixed so results
    * are deterministic across runs.  The two driver-side scalars
    * (gram count to size the filter; the merged KB-scale sketch) are
    * bounded by the benchmark suite, not the corpus — metadata reads,
    * like IVF centroids. */
  /** Fold a document frame's distinct n-gram hashes into a Bloom
    * filter — THE one builder for every gram-domain filter in the
    * engine.  The hash domain is GramHashes' 64-bit values, and every
    * probe site must use `BloomContains.ofHashed` over the SAME
    * GramHashes expression: a filter built (or probed) in any other
    * domain — e.g. xxhash64 of the shingle string — silently never
    * hits, and a decontamination gate that never hits passes every
    * contaminated doc.  `bloomDecontaminate` and
    * `StreamOps.streamingIngestFunnel` both go through here, so the
    * two paths cannot drift apart. */
  def gramBloom(docs: DataFrame, n: Int = 8, fpp: Double = 1e-6)
      : org.apache.spark.util.sketch.BloomFilter = {
    val grams = docs
      .select(explode(graft.functions.GramHashes(words(col("text")), n)).as("hsh"))
      .distinct()
      .localCheckpoint() // two bounded passes (size, build) — scan once
    val nGrams = math.max(grams.count(), 1L)
    grams.stat.bloomFilter("hsh", nGrams, fpp)
  }

  def bloomDecontaminate(spark: SparkSession, dir: String,
      n: Int = 8, fpp: Double = 1e-6): DataFrame = {
    // same GramHashes identity as `decontaminate`, so the two paths
    // stay comparable gram for gram; the bloom is built over and
    // probed with the raw 64-bit gram hashes (gramBloom's contract)
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), col("text"),
        pmod(contentHash(col("text")), lit(100L)).as("bucket"))
    val train = docs.filter(col("bucket") < 80)
      .select(col("doc_id"),
        explode(graft.functions.GramHashes(words(col("text")), n)).as("hsh"))
    val bloom = gramBloom(docs.filter(col("bucket") >= 90), n, fpp)
    train.filter(graft.functions.BloomContains.ofHashed(col("hsh"), bloom))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("hsh")).as("n_flagged_grams"))
  }

  /** The corpus → training-set funnel: every per-doc gate a corpus
    * pass applies before chunk/shard, composed into ONE plan — the
    * operator a pipeline user actually runs nightly, and the test that
    * the individual signals compose without extra passes:
    *   keep = canonical (first copy of its content)
    *        ∧ quality ≥ minQuality ∧ language identified
    *        ∧ not repetitive (Gopher gates) ∧ stratified-sample kept.
    *
    * Scale shape: EVERY row-level signal (quality, language, sampling,
    * and — since TopTokenCount made the top-word numerator a column —
    * the full repetition flag) is computed in a single projection over
    * ONE corpus scan; joining the registered per-signal queries would
    * re-scan the corpus once per signal.  The only shuffle left in the
    * whole funnel is the canonical rule's min(doc_id) window over the
    * content-hash partition (uniform keys).  (Until round 4 the
    * repetition flag cost a (doc_id, token) word-count aggregation
    * plus a join-back — the funnel's only non-window shuffle, gone.) */
  def corpusFunnel(spark: SparkSession, dir: String,
      minQuality: Double = 0.25): DataFrame = {
    val byHash = Window.partitionBy(md5(col("text")))
    Tables(spark, dir).documents.select(
      col("doc_id"),
      (col("doc_id") === min(col("doc_id")).over(byHash))
        .cast("int").cast("long").as("is_canonical"),
      (TextAnalysis.qualityScoreCol(col("text")) >= minQuality)
        .cast("int").cast("long").as("quality_ok"),
      (TextAnalysis.predLangCol(col("text")) =!= "unknown")
        .cast("int").cast("long").as("lang_known"),
      stratifiedKeep(Map("en" -> 400), 1000)
        .cast("int").cast("long").as("sample_kept"),
      CorpusStats.repetitiveFlag.as("repetitive"))
      .withColumn("keep",
        (col("is_canonical") === 1 && col("quality_ok") === 1 &&
          col("lang_known") === 1 && col("sample_kept") === 1 &&
          col("repetitive") === 0).cast("int").cast("long"))
  }

  /** Scrub numeric identifiers before training: digit runs of ≥ 2
    * become a <NUM> sentinel (the shape of PII/ID redaction; the
    * pattern set is the pluggable part).  Counting + rewriting are
    * regex column ops — codegen'd, no UDF. */
  def redact(spark: SparkSession, dir: String): DataFrame = {
    val pat = "[0-9]{2,}"
    Tables(spark, dir).documents
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(
          regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long").as("n_redacted"),
        regexp_replace(col("text"), pat, "<NUM>").as("redacted_text"))
  }

  /** DSIR-style importance resampling (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): pick
    * raw-pool docs whose hashed-token distribution best matches a
    * target corpus.  Target here = the `lang = 'en'` docs (the
    * "match this high-quality slice" use case); raw pool = the rest.
    *
    * Model: tokens hash into `buckets` bins (contentHash — the
    * engine-portable md5 route every selector here uses); each bin b
    * gets a Laplace-smoothed log-likelihood ratio
    *   λ(b) = ln( ((ct+1)/(nt+B)) / ((cr+1)/(nr+B)) )
    * and a doc's importance weight is Σ_tokens λ(bucket(token)) — the
    * bag-of-hashed-ngrams log importance weight.  Selection is the
    * DETERMINISTIC top-`topK` by weight (doc_id tiebreak) — the
    * reproducible variant of the paper's Gumbel-top-k sampling (a
    * per-doc Gumbel perturbation would just add one hash-seeded
    * column; determinism is what makes the oracle pairing possible).
    *
    * Scale shape: the "model" is B rows of doubles NO MATTER THE
    * CORPUS SIZE — one conditional aggregate over a token scan builds
    * both sides' bin counts in ONE shuffle (bucket key, B groups),
    * nt/nr are two driver scalars off the B-row frame, and scoring is
    * a second token scan broadcast-joined to the B-row λ table + one
    * doc-keyed partial-agg shuffle.  The top-k filter compiles to
    * WindowGroupLimit partial heaps (rank windows with empty
    * partition spec get per-partition Partial limits before the
    * single-partition Final — the TakeOrderedAndProject shape), so no
    * executor ever sorts the full raw pool.
    *
    * Engine-exactness: λ's ratio is computed as a quotient of two
    * correctly-rounded quotients of exactly-representable integers
    * (each ≤ token count + B < 2⁵³ at any realistic corpus — no
    * product form, so nothing overflows at 100 TB), ln is ≤1-ulp and
    * feeds the 9-dp round + DECIMAL(30,6) quantization (the s_bm25
    * license), ordering/cut compare the 6-dp rounded weight. */
  def dsirSample(spark: SparkSession, dir: String,
      buckets: Int = 1024, topK: Int = 100): DataFrame =
    dsirSampleOf(Tables(spark, dir).documents, buckets, topK)

  /** Frame-level DSIR entry (docs = (doc_id, lang, text); target =
    * the `lang = 'en'` rows) — shared by the registered query and the
    * injected-distribution spec corpus. */
  def dsirSampleOf(docs: DataFrame,
      buckets: Int = 1024, topK: Int = 100): DataFrame = {
    val toks = docs
      .select(col("doc_id"), col("lang"),
        explode(words(col("text"))).as("term"))
      .select(col("doc_id"), col("lang"),
        pmod(contentHash(col("term")), lit(buckets.toLong)).as("b"))
    val isT = (col("lang") === "en").cast("long")
    val bins = toks.groupBy(col("b"))
      .agg(sum(isT).as("ct"), sum(lit(1L) - isT).as("cr"))
      .localCheckpoint() // B-row leaf: feeds the totals AND the λ join
    val st = bins.agg(sum(col("ct")), sum(col("cr"))).head()
    val (nt, nr) = (st.getLong(0), st.getLong(1))
    val lam = bins.select(col("b"),
      roundx(log(((col("ct") + lit(1.0)) / lit((nt + buckets).toDouble)) /
        ((col("cr") + lit(1.0)) / lit((nr + buckets).toDouble))), 9).as("lam"))
    val byW = Window.orderBy(col("dsir").desc, col("doc_id"))
    toks.filter(col("lang") =!= "en")
      .join(broadcast(lam), Seq("b"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sumx(col("lam")).as("score"))
      .withColumn("dsir", roundx(col("score"), 6))
      .withColumn("rnk", row_number().over(byW))
      .filter(col("rnk") <= topK)
      .select(col("doc_id"), col("lang"), col("dsir"),
        col("rnk").cast("long").as("rnk"))
  }

  /** Leakage-safe train/val/test split: assign the split to the
    * near-dup GROUP, not the doc — every member of a connected
    * component lands in the same split, so a training doc can never
    * have a near-duplicate in the held-out set (the evaluation-
    * contamination channel Lee et al. 2022 measure: dedup or co-assign,
    * and a split that ignores near-dup structure silently does
    * neither).  The group's split comes from the CANONICAL member's
    * content hash (group_id IS the min doc_id, so its text is the
    * group's stable fingerprint) with the same 80/10/10 bucket rule as
    * d_sample_split — singleton groups (the overwhelming majority)
    * therefore get exactly the split d_sample_split would give them,
    * and the operator only MOVES docs whose group crosses a boundary.
    *
    * Scale shape: the CC labels are d_dedup_groups (banded candidates
    * + pointer jumping, O(log diameter) rounds); the canonical-hash
    * side is a plain projection of `documents`, and the assignment is
    * ONE group_id-keyed join (sort-merge at scale; a pathological
    * mega-cluster skews one key — AQE skew-join splits it, and the
    * dedup pipeline upstream would have collapsed it anyway). */
  def leakageSafeSplit(spark: SparkSession, dir: String): DataFrame = {
    val groups = graft.dedup.Dedup.dedupGroups(spark, dir)
      .select(col("doc_id"), col("group_id"))
    val canon = Tables(spark, dir).documents
      .select(col("doc_id").as("group_id"),
        pmod(contentHash(col("text")), lit(100L)).as("bucket"))
    groups.join(canon, Seq("group_id"))
      .select(col("doc_id"), col("group_id"), col("bucket"),
        when(col("bucket") < 80, "train").when(col("bucket") < 90, "val")
          .otherwise("test").as("split"))
  }

  /** `d_budget_select`: greedy corpus selection under a TOKEN BUDGET —
    * keep documents in (quality DESC, doc_id) order while the running
    * token total stays ≤ B (the data-selection step between scoring
    * and packing: "the best N-token corpus this scorer can buy").
    *
    * The naive plan is a GLOBAL cumulative-sum window — an
    * unpartitioned window over the whole corpus, the exact
    * scale-killer this repo's plan rules forbid.  The registered plan
    * is the distributed threshold form, EXACTLY equal to the greedy
    * prefix because quality is roundx'd to 4 dp (engine-stable
    * buckets) and the order's tiebreak is doc_id:
    *  1. one scan → (quality bucket, token sum, doc count) — a
    *     group-by over ≤ ~10⁴ distinct rounded scores;
    *  2. the driver folds the DESC-sorted buckets' prefix sums
    *     (metadata-scale collect, the bucket-pruning-list class) to
    *     find the BOUNDARY bucket s* and its remaining budget r;
    *  3. buckets above s* keep wholesale, buckets below drop
    *     wholesale — scan-speed filters, no window at all; ONLY the
    *     boundary bucket pays a cumsum window, partitioned to that
    *     single bucket (bounded by its membership, not the corpus).
    * ORACLED against the global-cumsum SQL — the equality IS the
    * threshold decomposition's correctness proof, run per-row. */
  def budgetSelect(spark: SparkSession, dir: String,
      budget: Long = 10000L): DataFrame =
    budgetSelectFrom(Tables(spark, dir).documents.select(
      col("doc_id"),
      TextAnalysis.qualityScoreCol(col("text")).as("quality_score"),
      graft.functions.TextFunctions.regexTokenCount(col("text"))
        .cast("long").as("re_tokens")), budget)

  /** `d_pipeline_e2e` (round 11, VERDICT-r10 ask #4): the corpus →
    * training-set funnel END-TO-END as one registered composition —
    * the artifact a training-data team actually ships, where every
    * stage has so far been green only in isolation:
    *
    *   gate (d_corpus_funnel's five signals) →
    *   group + keep-best (dup groups at rest; best-quality
    *     representative per group among the gated docs) →
    *   decontaminate (train-bucket candidates sharing an 8-gram with
    *     the held-out slice drop; the eval slice itself is not
    *     training data) →
    *   budget-select (the threshold decomposition, greedy best-first
    *     under the token budget) →
    *   pack (chunk the selected docs) →
    *   shard (the shard/pos layout + 256-token sequence packing).
    *
    * Output: one row per stage with (n_in, n_out) — the funnel
    * report.  ORACLED end-to-end with the stage oracle bodies
    * composed VERBATIM (hoisted SQL constants — the q_proposal_detail
    * hoisting stance at pipeline scale), so the composition cannot
    * drift from the registered per-stage semantics.
    *
    * Plan shape: a STAGED run (each stage's survivor id set pins via
    * localCheckpoint and feeds the next stage's semi-join) — the six
    * counts are driver scalars.  Stage FUSION note for §5b: gate's
    * five signals are one scan (corpusFunnel's contract); keep-best
    * adds the group_id shuffle; decontaminate's gram join runs only
    * over keep-best survivors (the id semi-join pushes into the scan);
    * budget-select is scan + metadata fold; pack+shard share one
    * selected-docs scan (chunk explode is narrow; the only shuffle is
    * the shard window).  What does NOT fuse: stages separated by a
    * semi-join on a DERIVED id set need the set materialized — that
    * is the information-theoretic floor of a funnel, not a plan
    * wart. */
  def pipelineE2e(spark: SparkSession, dir: String,
      budget: Long = 10000L): DataFrame = {
    import graft.dedup.Dedup
    // STAGE COUNTS RIDE THE STAGE MATERIALIZATIONS via observe()
    // (optimization r16, guide §1.2 — VERDICT-r15 ask #4; the Dedup CC
    // convergence-scalar precedent): each funnel count used to be its
    // own count() job against the stage's fresh localCheckpoint — the
    // metric now computes as the rows stream into the checkpoint, so
    // six count jobs per run become zero.  Same counts, same frames.
    val docs = Tables(spark, dir).documents

    // 1 — GATE: the funnel's keep flag.  corpusFunnel is one row per
    // doc, so n_docs rides the same observation as the gate count.
    val gateObs = new org.apache.spark.sql.Observation()
    val gated = corpusFunnel(spark, dir)
      .observe(gateObs, count(lit(1)).as("n_docs"),
        sum((col("keep") === 1).cast("long")).as("n_gated"))
      .filter(col("keep") === 1)
      .select(col("doc_id")).localCheckpoint()
    val nDocs = gateObs.get("n_docs").asInstanceOf[Long]
    val nGated = gateObs.get("n_gated").asInstanceOf[Long]

    // 2 — GROUP + KEEP-BEST among the gated docs
    val quality = docs.select(col("doc_id"),
      TextAnalysis.qualityScoreCol(col("text")).as("quality_score"))
    val kbObs = new org.apache.spark.sql.Observation()
    val kb = Dedup.keepBestFrom(
        Dedup.dedupGroups(spark, dir).join(gated, Seq("doc_id"), "left_semi"),
        quality)
      .select(col("kept_doc_id").as("doc_id"))
      .observe(kbObs, count(lit(1)).as("n")).localCheckpoint()
    val nKb = kbObs.get("n").asInstanceOf[Long]

    // 3 — DECONTAMINATE: candidates are the train-bucket survivors;
    // any sharing an 8-gram with the held-out slice drop
    // pinned (optimization r15): both the candidate side and the eval
    // side read this frame — un-pinned, the corpus paid the 8-gram
    // hash pass twice
    val bucketed = docs.select(col("doc_id"),
      pmod(contentHash(col("text")), lit(100L)).as("bucket"),
      graft.functions.GramHashes(words(col("text")), 8).as("g"))
      .localCheckpoint()
    val cand = bucketed.join(kb, Seq("doc_id"), "left_semi")
      .filter(col("bucket") < 80).localCheckpoint()
    val evalGrams = bucketed.filter(col("bucket") >= 90)
      .select(explode(col("g")).as("hsh"))
    val contaminated = cand.select(col("doc_id"), explode(col("g")).as("hsh"))
      .join(PlanHints.broadcastIfSmall(evalGrams), Seq("hsh"))
      .select(col("doc_id")).distinct()
    val cleanObs = new org.apache.spark.sql.Observation()
    val clean = cand.select(col("doc_id"))
      .join(contaminated, Seq("doc_id"), "left_anti")
      .observe(cleanObs, count(lit(1)).as("n")).localCheckpoint()
    val nClean = cleanObs.get("n").asInstanceOf[Long]

    // 4 — BUDGET-SELECT over the clean survivors (threshold fold)
    val scored = docs.join(clean, Seq("doc_id"), "left_semi").select(
      col("doc_id"),
      TextAnalysis.qualityScoreCol(col("text")).as("quality_score"),
      graft.functions.TextFunctions.regexTokenCount(col("text"))
        .cast("long").as("re_tokens"))
    val selObs = new org.apache.spark.sql.Observation()
    val selected = budgetSelectFrom(scored, budget)
      .filter(col("kept") === 1L).select(col("doc_id"))
      .observe(selObs, count(lit(1)).as("n")).localCheckpoint()
    val nSel = selObs.get("n").asInstanceOf[Long]

    // 5 — PACK: chunk the selected docs (one scan, narrow explode)
    val selDocs = docs.join(selected, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("text")).localCheckpoint()
    val chunkObs = new org.apache.spark.sql.Observation()
    val chunks = chunkDocsOf(selDocs)
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"))
      .observe(chunkObs, count(lit(1)).as("n")).localCheckpoint()
    val nChunks = chunkObs.get("n").asInstanceOf[Long]

    // 6 — SHARD: layout + 256-token sequence packing of the chunks
    val layout = shardLayoutOf(selDocs, shards = 8)
    val w = Window.partitionBy(col("shard")).orderBy(col("pos"), col("chunk_id"))
    val nSeqs = chunks.join(layout, Seq("doc_id"))
      .withColumn("so", (sum(col("n_tokens")).over(w) - col("n_tokens")).cast("long"))
      .select(col("shard"), floor(col("so") / lit(256L)).cast("long").as("seq_id"))
      .distinct().count()

    import spark.implicits._
    Seq(("1_gate", nDocs, nGated), ("2_keep_best", nGated, nKb),
      ("3_decontaminate", nKb, nClean), ("4_budget_select", nClean, nSel),
      ("5_pack", nSel, nChunks), ("6_shard", nChunks, nSeqs))
      .toDF("stage", "n_in", "n_out")
  }

  /** The driver-side prefix fold is metadata-scale ONLY because the
    * score is quantized (qualityScoreCol: 4 dp in [0,1] → ≤ 10,001
    * buckets).  That was an UNSTATED domain assumption (VERDICT-r10
    * "what's wrong" #2) — now a loud contract: the bucket collect is
    * capped, and an over-domain score (unquantized doubles) throws
    * instead of silently turning the collect corpus-scale
    * (SelectionSpec drives it). */
  private[graft] val MaxQualityBuckets = 10001

  private[graft] def budgetSelectFrom(scored: DataFrame,
      budget: Long): DataFrame = {
    // phase 1+2: per-bucket totals, driver-side prefix fold (DESC).
    // limit(cap + 1) bounds the driver transfer BEFORE the guard: at
    // most cap+1 rows ever land, and cap+1 of them proves the breach.
    val bucketRows = scored.groupBy(col("quality_score"))
      .agg(sum(col("re_tokens")).as("tok"))
      .limit(MaxQualityBuckets + 1).collect()
    require(bucketRows.length <= MaxQualityBuckets,
      s"budgetSelect: more than $MaxQualityBuckets distinct quality_score " +
        "values — the threshold decomposition's driver fold assumes a " +
        "QUANTIZED score (<= 4 dp in [0,1]); quantize the score column " +
        "(e.g. Exact.roundx(score, 4)) before selecting")
    val buckets = bucketRows
      .map(r => (r.getDouble(0), r.getLong(1)))
      .sortBy { case (s, _) => -s }
    var prefix = 0L
    var sStar = Double.NegativeInfinity // all kept if budget ≥ total
    var r = 0L
    val it = buckets.iterator
    while (it.hasNext && sStar == Double.NegativeInfinity) {
      val (s, tok) = it.next()
      if (prefix + tok > budget) { sStar = s; r = budget - prefix }
      else prefix += tok
    }
    // phase 3: wholesale keeps/drops + the boundary bucket's window
    if (sStar == Double.NegativeInfinity)
      scored.withColumn("kept", lit(1L))
    else {
      val above = scored.filter(col("quality_score") > sStar)
        .withColumn("kept", lit(1L))
      val boundary = scored.filter(col("quality_score") === sStar)
        .withColumn("__ct", sum(col("re_tokens")).over(
          Window.partitionBy(col("quality_score")).orderBy(col("doc_id"))))
        .withColumn("kept", (col("__ct") <= r).cast("long")).drop("__ct")
      val below = scored.filter(col("quality_score") < sStar)
        .withColumn("kept", lit(0L))
      above.unionByName(boundary).unionByName(below)
    }
  }
}
