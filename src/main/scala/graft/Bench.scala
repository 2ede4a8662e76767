package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the SURVEY §6 headline queries on
  * SPARK_GRAFT_SF_DIR, prints one JSON line.
  *
  * Results are forced through the noop sink — unlike count(), which
  * would let Catalyst prune the aggregates away, noop materializes
  * every output column.
  */
object Bench {
  private val Headliners = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "q_txvol_daily", "q_account_growth", "q_asof_join", "q_sessionize",
    "d_dedup_exact", "d_dedup_minhash", "s_knn_brute", "q_stream_window",
    "q_msg_parse", "q_account_tx_fanout",
    // the heavy dedup/CC family — the most expensive plans in the
    // engine; benched so regressions in them are visible round-over-round
    "d_dedup_ngram", "d_dedup_simhash", "d_dedup_minhash_verified",
    "d_neardup_cosine", "d_dedup_groups",
    // round-3 additions heavy enough to regression-track
    "d_corpus_funnel", "d_substring_overlap", "s_knn_pq",
    // round-4 additions: span report + excision rewrite, simhash exact
    // verify, the iterative BPE trainer (8 merge rounds per run)
    "d_substring_spans", "d_substring_excised",
    "d_dedup_simhash_verified", "t_bpe_merges",
    // round-5 additions: chunk-level dedup (corpus-wide window over the
    // chunk hash), banded range search, the MG sketch pass, and the
    // iterative LR trainer (8 GD rounds per run)
    "d_dedup_chunk", "s_range_search_lsh", "t_heavy_hitters", "s_logreg",
    // round-5: incremental dedup vs the index at rest (materialize cost
    // lands on the first timed pass's warehouse build — once per JVM —
    // so min-of-3 times the PROBE, the path that exists in production)
    // and the tokenizer application pass (train once per run + encode)
    "d_dedup_incremental", "t_bpe_encode",
    // two-stage serving, per-domain caps, eval-side contamination
    // (s_logreg_ovr stays OUT: 40 eager GD rounds ≈ 47 s/run would
    // dominate the suite for a trainer that s_logreg already tracks)
    "s_knn_pq_refined", "d_domain_cap", "d_contamination_report",
    // round-6: the 5-round OvR cost probe — times the K-independent-
    // one-shuffle-per-round claim at a cost linear in rounds, the
    // periodic registered-accounts series, and the lexical+hybrid
    // retrieval pair (inverted-index BM25, RRF fusion with knnBatch)
    // s_bm25_probe: Materialized caches the index build per JVM, so
    // min-of-3 times the PROBE — the d_dedup_incremental precedent
    "s_logreg_ovr5", "q_registered_accounts", "s_bm25", "s_hybrid_rrf",
    "s_bm25_probe",
    // round-6: distribution-matching selection (hashed-bucket λ model,
    // TakeOrderedAndProject top-k), unigram-LM quality scoring
    // (vocab-bounded LM join — the s_bm25 df-side shape), and the
    // group-atomic split (CC labels + one keyed join)
    // t_perplexity_probe: Materialized caches the LM build per JVM,
    // so min-of-3 times the PROBE — the s_bm25_probe precedent
    "d_dsir_sample", "t_perplexity", "d_split_leakage_safe",
    "t_perplexity_probe",
    // round-7: the Ed-Join character-edit family member (gram
    // self-join + banded levenshtein verify — heavy enough to track),
    // the two newest dashboard queries, the two-stage IVF-PQ, and the
    // refreshed-index probe (Materialized caches the two-generation
    // build per JVM, so min-of-3 times the PROBE — the
    // d_dedup_incremental precedent)
    "d_dedup_editdist", "q_retention_cohort", "q_funnel_steps",
    "s_knn_ivfpq_refined", "d_dedup_refresh",
    // round-7 late additions: the compacted-index probe (tracks the
    // probe cost compaction buys back vs s_bm25_probe's delta-summing
    // layout — build+refresh+compact amortize per JVM via Materialized,
    // min-of-3 times the probe) and the incremental CC fold (the
    // grouping leg of the crawl loop; edge-gen + base CC + fold, vs
    // d_dedup_groups' full recompute over the same edges)
    "s_bm25_probe_compacted", "d_dedup_groups_incremental",
    // round-7 PCA family: the 2080-group moment aggregation (one scan,
    // map-side collapse), the PCA-shortlist ANN, the moments-at-rest
    // probe (two-generation build amortizes per JVM via Materialized —
    // min-of-3 times the delta-sum + final projection), and the
    // context-aware bigram LM (token self-join + two count joins)
    "s_embed_cov", "s_knn_pca", "s_embed_cov_probe", "t_perplexity_bigram",
    // round-7 time-series legs: one (date, etype) shuffle each, then
    // calendar×series metadata math — benched to keep the grid
    // aggregation's cost visible; q_ts_anomaly completes the trio
    // (round-8: it was the only oracled operator not drift-tracked)
    "q_ts_corr", "q_ts_window_search", "q_ts_anomaly",
    // round-8: the grouping scale path — CC over exact + LSH-verified +
    // ed edges (vs d_dedup_groups' exact AllPairs channel); benched so
    // the exact-vs-banded cost gap is driver-visible round-over-round
    "d_dedup_groups_lsh")

  /** Exposed for BenchDigestSpec's budget pin. */
  private[graft] def headlinerNames: Seq[String] = Headliners

  /** Exposed for BenchDigestSpec's probes-all-ride pin. */
  private[graft] def probeNames: Seq[String] = Probes

  /** At-rest probe drift tracking (round-8 VERDICT ask): every
    * warehouse-served probe plus the two round-8 non-probe additions
    * that had no bench row, each min-of-3 — carried in the DETAIL
    * line's `probes` map only, so the byte-budgeted digest is
    * untouched.  A probe-path regression (pruning lost, a probe
    * silently rescanning its corpus) becomes driver-visible data
    * instead of a SURVEY one-shot. */
  private val Probes = Seq(
    "q_ts_anomaly_probe", "q_ts_corr_probe", "q_ts_seasonal_probe",
    "q_ts_decompose_probe", "q_ts_forecast_probe",
    "q_ts_anomaly_seasonal_probe", "q_ts_forecast_backtest_probe",
    "d_corpus_stats_probe",
    "q_active_accounts_probe",
    "q_active_accounts_window", "d_bloom_decontaminate_probe",
    "d_semdedup_probe", "q_richlist_gini_probe",
    "q_gas_quantiles_probe", "q_gas_quantiles_window",
    "q_gas_quantiles_window_sketch", "t_heavy_hitters_probe",
    "d_dedup_lines", "q_ts_decompose",
    // round 10: the retraction family's registered demonstrations —
    // each min-of-3 times the probe against the retracted state (the
    // builds amortize per JVM via Materialized)
    "q_richlist_gini_retracted", "d_dedup_retracted",
    "s_bm25_probe_retracted", "t_perplexity_probe_retracted",
    "d_dedup_groups_retracted", "q_proposals_page", "q_txvol_salted_join",
    // round-10 second arc: the rollup's (vsum, n) retract and the
    // join-view family (probe + retracted twin)
    "q_ts_anomaly_probe_retracted",
    "q_revenue_view_probe", "q_revenue_view_retracted",
    // round-10 third arc: the snapshot log's as-of read (gen-pruned),
    // the top-k warehouse's probe + retracted twin, and the two
    // selection verbs (representative choice over warehouse labels,
    // budgeted selection via the threshold decomposition)
    "q_richlist_gini_asof", "q_richlist_probe", "q_richlist_retracted",
    "d_dedup_keep_best", "d_budget_select",
    // the doc-keyed as-of (bitemporal tombstones) and the context
    // LM's delete verb
    "d_dedup_asof", "t_perplexity_bigram_probe_retracted",
    // the ANN family's delete verb + the banded layout at rest
    "s_range_search_probe", "s_range_search_retracted",
    // round 11: the end-to-end funnel composition and the IVF
    // family's delete verb
    "d_pipeline_e2e", "s_knn_ivf_retracted",
    // round 12: the retention demonstration — probe after
    // compact + vacuum + log checkpoint (must price like the
    // compacted probe: vacuum touches only dead state)
    "s_bm25_probe_vacuumed",
    // round 12 second arc: the log-level data-skipping probe — the
    // trailing window over the week-cadence rollup build (must price
    // like a two-generation read: three of five gens never listed)
    "q_ts_recent_window",
    // round 13: the ANN recall monitor AT REST — one brute pass over
    // the standing vectors + the two warehouses' own pruned probes
    // (builds amortize per JVM via Materialized; min-of-3 times the
    // monitor read itself)
    "s_knn_recall_report_probe",
    // round 13: the trailing-years window over the year-cadence view
    // (must price like a two-generation read — earlier years never
    // listed, the q_ts_recent_window contract on the binary member)
    "q_revenue_view_recent",
    // round 13 second arc: the drift-repair loop (two ivf builds +
    // one recluster amortize per JVM; min-of-3 times the two-phase
    // monitor read) and the frozen-tokenizer application pass (train
    // once per JVM; min-of-3 times the pure encode scan)
    "s_knn_recall_drift_repair", "t_bpe_encode_probe",
    // round 14: the PQ lane's at-rest monitor (raw ADC + refined
    // stages over the refreshed+retracted+compacted code table — the
    // quantized family's recall numbers as driver-visible data; the
    // build amortizes per JVM, min-of-3 times the monitor read)
    "s_knn_recall_report_pq",
    // round 15: the PQ repair loop gated (drifted build + the full
    // requantize + both grades amortize per JVM via Materialized;
    // min-of-3 times the cached one-row verdict read)
    "s_knn_requantize_gated",
    // round 15: the PCA lane's at-rest monitor (one brute truth pass +
    // the R-dim shortlist serving probe over the drifted projection
    // index) and its gated reproject verdict (cached one-row read)
    "s_knn_recall_report_pca", "s_knn_reproject_gated")

  /** Measurement-boundary documentation (ADVICE r08): queries whose
    * min-of-3 times an AT-REST read after a once-per-JVM warehouse
    * build (the first rep pays the build, the min drops it).  Carried
    * in the detail line so round-over-round drift analysis can tell a
    * warehouse-read speedup from a plan-level one. */
  private val Warehoused = Seq(
    "d_dedup_groups", "d_dedup_groups_incremental", "d_split_leakage_safe",
    "d_dedup_incremental", "d_dedup_refresh", "s_bm25_probe",
    "s_bm25_probe_compacted", "t_perplexity_probe", "s_embed_cov_probe",
    "q_ts_anomaly_probe", "q_ts_corr_probe", "q_ts_seasonal_probe",
    "q_ts_decompose_probe", "q_ts_forecast_probe",
    "q_ts_anomaly_seasonal_probe", "q_ts_forecast_backtest_probe",
    "d_corpus_stats_probe",
    "q_active_accounts_probe",
    "q_active_accounts_window", "d_bloom_decontaminate_probe",
    "d_semdedup_probe", "q_richlist_gini_probe",
    "q_gas_quantiles_probe", "q_gas_quantiles_window",
    "q_gas_quantiles_window_sketch", "t_heavy_hitters_probe",
    "q_richlist_gini_retracted", "d_dedup_retracted",
    "s_bm25_probe_retracted", "t_perplexity_probe_retracted",
    "d_dedup_groups_retracted", "q_ts_anomaly_probe_retracted",
    "q_revenue_view_probe", "q_revenue_view_retracted",
    "q_richlist_gini_asof", "q_richlist_probe", "q_richlist_retracted",
    "d_dedup_keep_best", "d_dedup_asof",
    "t_perplexity_bigram_probe_retracted",
    "s_range_search_probe", "s_range_search_retracted",
    "d_pipeline_e2e", "s_knn_ivf_retracted", "s_bm25_probe_vacuumed",
    "q_ts_recent_window", "s_knn_recall_report_probe",
    "q_revenue_view_recent", "s_knn_recall_drift_repair",
    "t_bpe_encode_probe", "s_knn_recall_report_pq",
    "s_knn_requantize_gated", "s_knn_recall_report_pca",
    "s_knn_reproject_gated")

  // sf0.1 is the LARGEST driver-generated SF in this sandbox — there is
  // no bigger dataset to stress the dedup/CC family against; recorded in
  // the output so round comparisons know the ceiling.
  private val SfCeiling = "sf0.1 (largest generated SF available)"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus).getOrCreate()
    // ERROR, not WARN: the driver parses the JSON line out of a
    // bounded output tail — keep log volume near zero
    spark.sparkContext.setLogLevel("ERROR")

    // warm the JVM/codegen once on the smallest SF so the measured pass
    // isn't dominated by first-query classloading
    Headliners.foreach { name =>
      try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    // ONE-TIME BUILD PHASE (round 11, VERDICT-r10 ask #2): run every
    // warehouse-served query once at the bench SF, OUTSIDE all
    // per-query timing — their once-per-JVM materializations land
    // here, so the min-of-3 rows below time ONLY the probe, and the
    // aggregate build cost is reported once as its own digest bucket
    // (`build_sec` = materialization + one untimed probe per query)
    // instead of hiding inside whichever family member runs first.
    // ITEMIZED since round 13 (VERDICT-r12 ask #2 — the r12 driver
    // artifact recorded 383 s against a self-measured 164 s with no
    // way to attribute the gap): each query's FIRST run is timed
    // individually; a query whose warehouse was already built by an
    // earlier family member reads as cheap, so the expensive rows
    // name exactly the materializations that own the bucket.
    val tBuild0 = System.nanoTime()
    val warehousedSet = Warehoused.toSet
    val buildTimes = scala.collection.mutable.ListBuffer.empty[(String, Double)]
    (Headliners ++ Probes).filter(warehousedSet).distinct.foreach { name =>
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      buildTimes += name -> (System.nanoTime() - t0) / 1e9
    }
    val buildSec = (System.nanoTime() - tBuild0) / 1e9

    // 3 INTERLEAVED rounds over the whole set, min per query: this host
    // stalls for tens of seconds at random, and back-to-back repeats of
    // one query can all land inside a single stall — full-set rounds
    // spread each query's runs ~a minute apart
    // only SUCCESSFUL runs are timed; a query that fails every round is
    // reported as -1, not as its (fast) failure duration
    val times = scala.collection.mutable.Map.empty[String, Double]
    // every successful run's wall ms, in round order — the detail-line
    // drift decomposer: a stable min with inflated later rounds is host
    // drift, not a plan change (so the next flat +25% uplift is
    // attributable from data instead of re-reading every plan)
    val runs = scala.collection.mutable.Map.empty[String, Vector[Long]]
    for (_ <- 1 to 3; name <- Headliners) {
      val t0 = System.nanoTime()
      val ok =
        try {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          true
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      val t = (System.nanoTime() - t0) / 1e9
      if (ok) {
        times(name) = math.min(times.getOrElse(name, Double.MaxValue), t)
        runs(name) = runs.getOrElse(name, Vector.empty) :+ math.round(t * 1e3)
      }
    }
    // at-rest probe timings: same interleaved min-of-3 shape, AFTER
    // the headliner rounds (the builds their first reps trigger are
    // per-JVM, so headliner timings are unaffected)
    val probeTimes = scala.collection.mutable.Map.empty[String, Double]
    for (_ <- 1 to 3; name <- Probes) {
      val t0 = System.nanoTime()
      val ok =
        try {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          true
        } catch { case e: Throwable =>
          System.err.println(s"[bench] probe $name failed: ${e.getMessage}")
          false
        }
      val t = (System.nanoTime() - t0) / 1e9
      if (ok) probeTimes(name) =
        math.min(probeTimes.getOrElse(name, Double.MaxValue), t)
    }
    val probesJson = Probes.map(n =>
      "\"" + n + "\":" + probeTimes.getOrElse(n, -1.0)).mkString("{", ",", "}")
    val warehousedJson = Warehoused.map("\"" + _ + "\"").mkString("[", ",", "]")

    val results = Headliners.map(n => n -> times.getOrElse(n, -1.0))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }.mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum

    // beyond-ceiling stress probes (8×-replicated corpus) ride the same
    // output line so the heavy family's scale behavior is regression-
    // tracked by the driver, not just described in SURVEY prose.
    // SPARK_GRAFT_STRESS=0 skips them (local quick loops).
    val stress =
      if (sys.env.getOrElse("SPARK_GRAFT_STRESS", "1") == "0") "null"
      else try StressBench.probesJson(spark, sfDir, reps = 8)
      catch { case e: Throwable =>
        System.err.println(s"[bench] stress probes failed: ${e.getMessage}")
        "null"
      }
    // ANN QUALITY, regression-tracked as driver-visible data (not just
    // spec assertions at fixed corpora): recall@10 of each approximate
    // retrieval path against the exact brute-force top-10, plus
    // set-equality of the banded range search vs its brute baseline.
    // All collects are ≤ a few hundred id rows — driver metadata.
    // SPARK_GRAFT_STRESS=0 skips (same switch as the stress probes).
    val ann =
      if (sys.env.getOrElse("SPARK_GRAFT_STRESS", "1") == "0") "null"
      else try annQualityJson(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] ann quality failed: ${e.getMessage}")
        "null"
      }
    // Every BENCH_r1-r4 driver capture came back parsed: None with a
    // log-tail full of Spark SHUTDOWN chatter — the JSON line was
    // being pushed out of the driver's tail buffer by the logs that
    // flush after main returns.  r6's bare-stdout fix then hit the
    // NEXT wall: the single detail line grew to ~2.3 KB and the
    // driver's bounded tail capture (~2.0 KB) truncated its HEAD, so
    // the `^{`-anchored parse found nothing.  The cure is a LINE
    // BUDGET: print the full detail line first (judge-extractable as
    // in every prior round), then end stdout with a compact digest —
    // 3-dp times, stress reduced to its integer counts — that a
    // greedy assembler keeps under DigestBudget bytes, dropping
    // optional sections (stress counts first, then ann) before it
    // would ever overflow.
    // DETAIL-ONLY drift decomposers (the digest stays byte-budgeted):
    // all three per-run wall-ms per query, plus the process's JVM
    // uptime and cumulative GC time — a broad flat uplift with stable
    // per-query mins and a fat GC share is host/JVM noise; a moved min
    // is a plan change
    val runsMs = Headliners.map { n =>
      "\"" + n + "\":" + runs.getOrElse(n, Vector.empty).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val jvm = {
      import scala.jdk.CollectionConverters._
      import java.lang.management.ManagementFactory
      val gcs = ManagementFactory.getGarbageCollectorMXBeans.asScala
      val gcMs = gcs.map(_.getCollectionTime).filter(_ >= 0).sum
      val gcN = gcs.map(_.getCollectionCount).filter(_ >= 0).sum
      val up = ManagementFactory.getRuntimeMXBean.getUptime
      s"""{"uptime_ms":$up,"gc_ms":$gcMs,"gc_count":$gcN}"""
    }
    val buildJson = buildTimes.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // round 16 (VERDICT-r15 ask #2): the resolved core count and the
    // context's actual parallelism ride BOTH output lines, so the
    // driver's scaling probe can tell "honored and latency-bound" from
    // "SPARK_GRAFT_CPUS ignored" (r15 flagged suspect_cpus_ignored
    // against plumbing that works — the line just never said so).
    val cpusInt = scala.util.Try(cpus.toInt).getOrElse(-1)
    val par = spark.sparkContext.defaultParallelism
    val detail = s"""{"metric":"total","value":$total,"unit":"sec","reps":3,"agg":"min","cpus":$cpusInt,"parallelism":$par,"build_sec":$buildSec,"build":$buildJson,"queries":$qs,"failed":$failed,"sf":"$sfDir","sf_ceiling":"$SfCeiling","runs_ms":$runsMs,"jvm":$jvm,"probes":$probesJson,"warehoused":$warehousedJson,"stress":$stress,"ann":$ann}"""
    val digest = digestLine(results,
      Probes.map(n => n -> probeTimes.getOrElse(n, -1.0)), total, failed,
      sfDir, stress, ann, buildSec, buildTimes.toSeq, cpusInt, par)
    // round 16 (VERDICT-r15 ask #2): the full detail map — every
    // headliner, probe and build time at full precision — is written to
    // a FILE every run, so round-over-round comparison is never limited
    // to the byte-budgeted digest's named rows (r15's comparator saw
    // n_common=4 because the tail window truncated the detail line).
    // Best-effort: a read-only CWD must never fail the bench.
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "bench_detail.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(detailPath),
      (detail + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] detail file write failed: ${e.getMessage}")
    }
    spark.stop()
    println(detail)
    println(digest)
    System.out.flush()
  }

  /** Driver tail window measured EXACTLY 2000 chars (BENCH_r06's
    * `tail` field), shared with the ~75-byte sbt success line and two
    * newlines; the digest's head stays inside the window iff it is
    * ≤ ~1920 B, so 1860 leaves ~60 bytes of margin.  Round 10
    * (VERDICT-r09 ask #2): the at-rest probe rows are now FIRST-CLASS
    * digest citizens — a `probes` map rides INSIDE the budget, with a
    * reserved sub-budget sized so every current probe fits even at
    * worst-case widths; the per-query map flexes instead, folding its
    * smallest rows into a `q_other` {n, sec} rollup (the heavy rows —
    * the ones drift grading watches — always ride; full-precision
    * everything stays on the detail line).  BenchDigestSpec pins the
    * worst-case arithmetic. */
  // 1890 since round 13 (the build map + the 44th probe row needed the
  // slack): the window holds digest + "\n" + sbt's success line
  // (~70–85 B) + "\n" ⇒ ≤ 1913 is safe; 1890 keeps ≥ 23 B of margin
  // over the widest success line ever observed.
  private[graft] val DigestBudget = 1890

  /** Reserved bytes for the probes map — sized to hold EVERY current
    * probe row at worst-case width PLUS ≥10% row-growth headroom
    * (VERDICT-r12 ask #7: the old reservation had 10 B of slack, so
    * the next probe row would have folded the whole map to p_other
    * and made a probe regression driver-invisible).  Probe values
    * ride as CENTISECOND INTEGERS (`probes_cs`) — 10 ms grain, the
    * drift graders' resolution; full-precision seconds stay on the
    * detail line — which shaves 1–2 B per row at every width.
    * BenchDigestSpec derives the worst case from probeNames itself
    * and pins the ≥10% slack, so any list change revalidates. */
  // worst case derived at the SATURATED 5-digit cs width (ADVICE r13
  // #3 — the old 4-digit assumption broke exactly when a probe
  // regressed past 100 s): the 50 rows of round 15 (47 + the gated
  // requantize + the two PCA-lane rows) x (name+9B) + braces = 1499;
  // the budget keeps >=10% row-growth headroom on top, re-derived UP
  // FRONT in the same commits as the new rows (VERDICT-r14 ask #7)
  private[graft] val ProbesBudget = 1680

  /** FLOORS, in rows (round 14): the digest must always name at
    * least this many build rows (VERDICT-r13 ask #5: the r13 digest
    * named ONE build row and lumped 49 — a build anomaly was
    * attributable only from the truncated detail line) and this many
    * query rows (the heavy headliners drift grading watches — they
    * must not be squeezed out by the other sections' reservations).
    * Each floor reserves the RUN'S OWN top rows at their real widths,
    * so nothing is over-reserved at realistic widths; when floors +
    * sections exceed the budget, the LADDER sheds stress counts, then
    * ann — the floors hold on every rung that carries the section.
    * BenchDigestSpec pins both floors at worst-case widths. */
  private[graft] val BuildFloorRows = 3
  private[graft] val QueryFloorRows = 4

  // The itemized BUILD map (round 13, VERDICT-r12 ask #2) carries no
  // reservation: it is sized from the RESIDUAL bytes after probes,
  // heavy query rows, ann and stress have claimed theirs — the most
  // expensive materializations ride by name (descending cost, exactly
  // the rows a build-bucket anomaly investigation needs first), the
  // remainder folds into `b_other {n, cs}`, and the full map always
  // rides the detail line.

  /** Greedy PREFIX fill over rows sorted by descending time (name
    * tiebreak): rows ride verbatim until the first that would
    * overflow `budget`; it and everything after fold into the
    * returned remainder.  Prefix-stop (not best-fit) keeps the
    * selection monotone: everything bigger than a riding row rides. */
  private def fillRows(rows: Seq[(String, Double)], budget: Int,
      f2: Double => String): (String, Seq[(String, Double)]) = {
    val sorted = rows.sortBy { case (k, v) => (-v, k) }
    val b = new StringBuilder
    var taken = 0
    var rest = List.empty[(String, Double)]
    var stopped = false
    sorted.foreach { case (k, v) =>
      val piece = "\"" + k + "\":" + f2(v)
      if (!stopped && b.length + piece.length + (if (taken > 0) 1 else 0) <= budget) {
        if (taken > 0) b.append(',')
        b.append(piece); taken += 1
      } else { stopped = true; rest = (k, v) :: rest }
    }
    (b.toString, rest.reverse)
  }

  private[graft] def digestLine(results: Seq[(String, Double)],
      probes: Seq[(String, Double)], total: Double, failed: String,
      sfDir: String, stress: String, ann: String,
      buildSec: Double = -1.0,
      builds: Seq[(String, Double)] = Seq.empty,
      cpus: Int = -1, par: Int = -1): String = {
    def f3(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    // per-query times at 2 dp: at 55+ headliners the third decimal is
    // what pushed the line past the tail window; drift grading at 1%
    // of a 1-second query rides the detail line, which keeps 9 dp
    def f2(v: Double): String = if (v < 0) "-1" else f"$v%.2f"
    // probe/build rows ride as centisecond integers (self-describing
    // via the _cs key suffix); -1 still marks a failed row.  Display
    // SATURATES at 99999 cs (ADVICE r13 #3: a row regressing past the
    // assumed width must widen to a bounded 5 digits, not push later
    // rows into the p_other fold precisely in the regressed round
    // where visibility matters); full-precision seconds always ride
    // the detail line
    def cs(v: Double): String =
      if (v < 0) "-1" else math.min(99999L, math.round(v * 100)).toString
    def otherOf(tag: String, rest: Seq[(String, Double)]): Option[String] =
      if (rest.isEmpty) None
      else Some(s""""$tag":{"n":${rest.size},"sec":${
        f2(rest.map(_._2).filter(_ >= 0).sum)}}""")
    def otherCsOf(tag: String, rest: Seq[(String, Double)]): Option[String] =
      if (rest.isEmpty) None
      else Some(s""""$tag":{"n":${rest.size},"cs":${
        cs(rest.map(_._2).filter(_ >= 0).sum)}}""")
    // sf as the basename only — the digest is byte-budgeted and the
    // full path rides the detail line
    val sfShort = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse(sfDir)
    val annPart = if (ann == "null") None else Some(s""""ann":$ann""")
    val stressPart =
      if (stress == "null") None
      else Some(s""""stress":${StressBench.countsOnly(stress)}""")
    val (pRows, pRest) = fillRows(probes, ProbesBudget, cs)
    val probesFull = Seq(Some(s""""probes_cs":{$pRows}"""), otherCsOf("p_other", pRest))
    // degenerate-rung probe section: the whole map folded to one rollup
    val probesFolded = Seq(otherCsOf("p_other", probes))
    val failedFull = s""""failed":$failed"""
    // the audit header (round 11, VERDICT-r10 ask #2): reps + min
    // marker and the one-time build bucket ride EVERY digest rung, so
    // a driver-side reader can tell a probe-cost move from a
    // materialization or rep-count artifact without the detail line
    def assemble(qRows: String, qOther: Option[String],
        probeParts: Seq[Option[String]], buildParts: Seq[Option[String]],
        failedPart: String, opt: Seq[Option[String]]): String =
      (Seq(Some(s""""queries":{$qRows}"""), qOther,
        Some(failedPart), Some(s""""sf":"$sfShort"""")) ++
        probeParts ++ buildParts ++ opt).flatten.mkString(
        // "cpus"/"par" (resolved SPARK_GRAFT_CPUS + defaultParallelism)
        // ride every rung since round 16 — additions only, the r15
        // suspect_cpus_ignored contract gap
        s"""{"metric":"total","value":${f3(total)},"unit":"sec","reps":3,"agg":"min","cpus":$cpus,"par":$par,"build_sec":${f2(buildSec)},""", ",", "}")
    // size the queries sub-budget from what everything ELSE costs,
    // reserving the REAL worst-case q_other width — the all-rows fold
    // formatted from this run's actual results (piece width is
    // monotone in n and sec digits, so every partial fold is narrower;
    // ADVICE-r10: the fixed {"n":9999,"sec":99999.99} literal would
    // overflow silently if a real rollup ever printed wider)
    val opts = Seq(annPart, stressPart)
    val worstQOther = otherOf("q_other", results)
      .getOrElse(""""q_other":{"n":0,"sec":0.00}""")
    // ONE RUNG of the ladder, fully re-sized for its own section mix
    // (round 14 — VERDICT-r13 ask #5 pushed the reservations past what
    // a single up-front queries fill could absorb: bytes a rung sheds
    // with ann/stress must flow back to named query rows, so each rung
    // re-derives the queries sub-budget from ITS OWN fixed cost):
    //  - the queries fill reserves the worst-case q_other width, the
    //    width of the run's own top QueryFloorRows rows, and (when the
    //    build bucket rides) the top BuildFloorRows build rows + worst
    //    b_other — so the named-row guarantees survive every rung that
    //    carries the section;
    //  - the build bucket then fills the bytes actually left, floored
    //    at its own rows.
    def topRowBytes(rows: Seq[(String, Double)], n: Int,
        fmt: Double => String): Int = {
      val widths = rows.sortBy { case (k, v) => (-v, k) }.take(n)
        .map { case (k, v) => ("\"" + k + "\":" + fmt(v)).length }
      if (widths.isEmpty) 0 else widths.sum + widths.size - 1
    }
    def rung(probeParts: Seq[Option[String]], withBuilds: Boolean,
        failedPart: String, opt: Seq[Option[String]]): String = {
      val bOtherWorst =
        if (!withBuilds || builds.isEmpty) 0
        else otherCsOf("b_other", builds).map(_.length + 1).getOrElse(0)
      val bFloor =
        if (!withBuilds || builds.isEmpty) 0
        else topRowBytes(builds, BuildFloorRows, cs)
      val buildReserve =
        if (!withBuilds || builds.isEmpty) 0
        else bFloor + bOtherWorst + 15 // "build_cs":{} wrapper + comma
      val qFloor = topRowBytes(results, QueryFloorRows, f2)
      val fixed = assemble("", Some(worstQOther), probeParts, Seq.empty,
        failedPart, opt)
      val (qRows, qRest) = fillRows(results,
        math.max(qFloor, DigestBudget - fixed.length - buildReserve), f2)
      val qOther = otherOf("q_other", qRest)
      val buildParts: Seq[Option[String]] =
        if (!withBuilds || builds.isEmpty) Seq.empty
        else {
          val base = assemble(qRows, qOther, probeParts, Seq.empty,
            failedPart, opt).length
          // the floor rows always ride (one named row + a lump is not
          // attributable — the r13 finding); reserved above, so a
          // partial fold cannot overflow the rung — and if the floors
          // themselves tip the rung over budget, the ladder sheds the
          // next optional section rather than fold a floor row
          val bBudget = math.max(bFloor, DigestBudget - base - bOtherWorst - 15)
          val (bRows, bRest) = fillRows(builds, bBudget, cs)
          Seq(if (bRows.nonEmpty) Some(s""""build_cs":{$bRows}""") else None,
            otherCsOf("b_other", bRest))
        }
      assemble(qRows, qOther, probeParts, buildParts, failedPart, opt)
    }
    val ladder = Seq(
      () => rung(probesFull, withBuilds = true, failedFull, opts),
      // stress counts shed first (inputs/times stay on the detail
      // line), then ann — named probe/build/query rows are the rarer
      // diagnostic and keep priority
      () => rung(probesFull, withBuilds = true, failedFull, Seq(annPart)),
      () => rung(probesFull, withBuilds = true, failedFull, Seq.empty),
      // the itemized build map yields before any probe visibility does
      // (its total always rides in the audit header)
      () => rung(probesFull, withBuilds = false, failedFull, Seq.empty),
      () => rung(probesFolded, withBuilds = false, failedFull, Seq.empty),
      () => rung(probesFolded, withBuilds = false,
        s""""failed_n":${results.count(_._2 < 0)}""", Seq.empty),
      // absolute floor: counts only — always well under budget
      () => assemble("", Some(s""""q_other":{"n":${results.size},"sec":${
        f2(results.map(_._2).filter(_ >= 0).sum)}}"""), probesFolded, Seq.empty,
        s""""failed_n":${results.count(_._2 < 0)}""", Seq.empty))
    ladder.iterator.map(_())
      .find(_.length <= DigestBudget)
      .getOrElse(ladder.last())
  }

  /** recall@10 per approximate single-query ANN path vs the exact
    * brute top-10, plus banded-vs-brute range-search set comparison.
    * Returns a JSON object string. */
  private def annQualityJson(spark: SparkSession, sfDir: String): String = {
    def ids(name: String): Set[Long] =
      SparkEntry.queries(name)(spark, sfDir)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    val brute = ids("s_knn_brute")
    // the lsh / lsh_mp / ivf single-query recalls left this map in
    // round 13, and round 15 retires s_knn_pq and s_knn_pca the same
    // way: the registered at-rest monitors (s_knn_recall_report_pq's
    // adc row for the demoted candidate-generation stage,
    // s_knn_recall_report_pca for the projection lane) now carry
    // those numbers as first-class query rows the driver dumps every
    // round — the bytes fund the 50-row probe map keeping ann on the
    // realistic-width rung.  The refined serving stages keep their
    // single-query recalls here (the inline two-stage paths have no
    // registered monitor analogue at fresh-build state)
    val recalls = Seq(
        "s_knn_pq_refined", "s_knn_ivfpq", "s_knn_ivfpq_refined")
      .map { n =>
        val r = (ids(n) & brute).size.toDouble / brute.size
        "\"" + n + "\":" + r
      }
    def pairs(name: String): Set[(Long, Long)] =
      SparkEntry.queries(name)(spark, sfDir)
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rb = pairs("s_range_search")
    val rl = pairs("s_range_search_lsh")
    val rangeJ =
      if (rb.isEmpty && rl.isEmpty) 1.0
      else (rb & rl).size.toDouble / (rb | rl).size
    (recalls ++ Seq(
      "\"range_lsh_jaccard\":" + rangeJ,
      "\"range_pairs\":" + rb.size)).mkString("{", ",", "}")
  }
}
