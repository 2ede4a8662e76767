package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.Exact.roundx
import graft.sources.Tables

/** The daily (date, event_type) rollup AT REST — the time-series
  * family's warehouse member, with the PcaWarehouse-class refresh
  * contract: index state is delta rows of DECIMAL(30,6)-exact daily
  * value sums, and DECIMAL sums are ASSOCIATIVE, so folding a batch
  * in by appending its per-key partial sums is BIT-EQUAL to a
  * one-shot rebuild over base ∪ batch — equal row for row to the
  * last decimal digit (TsWarehouseSpec pins it).
  *
  * Production shape: the four ts legs (corr / window search / anomaly
  * / seasonal) all start from the daily grid, whose ONE corpus-scale
  * stage is the (date, event_type) shuffle over raw events.  At
  * 100 TB that shuffle is the whole cost — and it is maintainable by
  * O(batch) appends at ingest: the alerting probe reads the rollup
  * (calendar × series metadata, KB-scale at any corpus size) and
  * NEVER rescans events (plan-asserted).  This is the q_txvol rollup
  * story applied to the analytics grid, with the stronger bit-equal
  * contract the DECIMAL discipline buys.
  *
  * Layout: a single append-only parquet of (date, event_type, vsum
  * DECIMAL) delta rows.  Readers sum deltas per key; `compact`
  * merges to one row per key (probe-bit-identical — decimal sums are
  * order-free).  No pruning story: like the moments index, the value
  * is O(batch) maintenance of a global statistic, not partition
  * elimination.
  *
  * RETRACTION CONTRACT — the (vsum, n) state, i.e. "the cure,
  * taken".  A sum-only state cannot distinguish a fully-retracted
  * (date, series) key (which must DROP, so densify's zero-fill and
  * date domain match a rebuild) from a day that genuinely summed to
  * zero (which must STAY) — that ambiguity was this member's
  * documented no-verb gap through round 10's first arc.  Carrying
  * the exact event count per delta row resolves it: `retract`
  * appends the removed events' (vsum, n) NEGATED, the merge drops
  * keys whose total n reaches 0, and a zero-sum-but-populated day
  * keeps its n > 0 row.  Both columns fold by exact associative
  * sums (DECIMAL / LONG), so retract ∘ refresh == rebuild-on-
  * (base ∖ removed) BIT-FOR-BIT — the Balance/Stats/Quantile rung,
  * and with it every additive member of the matrix now carries the
  * ladder's top contract; only the sketch classes (Bloom/HLL/MG/KLL)
  * remain honestly rebuild-only.  The feared ripple never happens:
  * `n` lives only in the stored deltas — mergedDaily folds it for
  * the drop-at-zero filter and serves the same (date, event_type, v)
  * grid, so all seven consumers and their verbatim oracles are
  * untouched. */
object TsWarehouse {

  /** The events-side base/incoming split (the warehouse family's
    * mod-10 convention, on event_id). */
  private[graft] def isBaseEvent = pmod(col("event_id"), lit(10L)) < 8

  /** Per-key (DECIMAL partial sum, exact event count) of a batch —
    * the delta rows.  The UNROUNDED decimal is what's stored:
    * rounding happens once at probe time, so appended generations
    * fold exactly.  `n` is the retraction contract's disambiguator
    * (fully-retracted key ⇒ n reaches 0 ⇒ drops; zero-sum day keeps
    * n > 0). */
  private[graft] def deltas(events: DataFrame): DataFrame =
    events.groupBy(to_date(col("ts")).as("date"), col("event_type"))
      .agg(sum(col("value").cast("decimal(30,6)")).as("vsum"),
        count(lit(1)).as("n"))

  /** Every verb declares date stats: exact per-generation min/max of
    * `date` ride in the commit entries (computed inside the write job
    * — CommitLog's observe node), so window probes skip generations
    * at the LOG (readWhere) and `statsMax` answers "latest day in the
    * rollup" with zero scans. */
  private val DateStats = Seq("date")

  /** Ingest — also the refresh-equivalence spec's one-shot reference
    * builder. */
  def materializeFrom(events: DataFrame, path: String): Unit =
    graft.sources.CommitLog.transaction(events.sparkSession, path)(
      _.replace(deltas(events), path, statsCols = DateStats))

  /** REFRESH — fold a batch in at rest: append its delta rows.
    * O(batch); no standing row is read or rewritten. */
  def refresh(spark: SparkSession, batch: DataFrame, path: String): Unit = {
    val done = refreshTxn(spark, batch, path, batchId = None)
    assert(done, "unreachable: un-id'd refreshes never skip")
  }

  /** The refresh transaction body, optionally committing a STREAM
    * BATCH ID atomically with the delta rows — the exactly-once rung
    * (StreamTwin, shared with Bm25/Quantile): a redelivery whose
    * external batch marker was lost still folds NOTHING, because the
    * committed `.stream` part is the ground truth.  Returns false
    * when `batchId` is already committed.  The dup-check snapshot is
    * taken only on the id'd path — a plain refresh pays no extra log
    * listing (review r12b). */
  private[graft] def refreshTxn(spark: SparkSession, batch: DataFrame,
      path: String, batchId: Option[Long]): Boolean =
    graft.sources.StreamTwin.refreshTxnWith(spark, path, batchId)(
      _.append(deltas(batch), path, statsCols = DateStats))

  /** RETRACT — remove events from the standing rollup: append their
    * per-key (vsum, n) deltas NEGATED.  O(removed), append-only like
    * refresh (no standing row is read or rewritten).  Precondition:
    * removed ⊆ what was ingested, i.e. counts never go net-negative —
    * the caller's contract, exactly like refresh's batch-freshness
    * one (BalanceWarehouse.retract's wording). */
  def retract(spark: SparkSession, removed: DataFrame, path: String): Unit =
    graft.sources.CommitLog.transaction(spark, path)(_.append(deltas(removed)
      .select(col("date"), col("event_type"), (-col("vsum")).as("vsum"),
        (-col("n")).as("n")), path, statsCols = DateStats))

  /** COMPACT — merge delta rows to one per key.  Probes bit-identical
    * before/after.  Zero-count keys (fully-retracted days) are
    * dropped, making the compacted state EQUAL to a rebuild on the
    * surviving events.  Single-WRITER maintenance window; probes are
    * free to run concurrently — their pinned CommitLog snapshot keeps
    * serving the pre-compact generations (round 11). */
  def compact(spark: SparkSession, path: String): Unit = {
    // persist exactly the fold probes serve (foldedDeltas is the one
    // definition of the merged state; mergedDaily is its probe-side
    // projection)
    val snap = graft.sources.CommitLog.snapshot(spark, path)
    graft.sources.CommitLog.transaction(spark, path) { t =>
      t.replace(foldedDeltas(spark, path), path, statsCols = DateStats)
      // the streaming twin's id part folds to one generation WITHOUT
      // forgetting ids — replay protection survives compaction
      graft.sources.StreamTwin.compactIds(snap, t, path)
    }
    // physical reclaim is CommitLog.vacuum on the caller's retention
    // cadence — never inline here, so a probe snapshot pinned before
    // this compact keeps serving the pre-compact generations
  }

  /** The delta-merge read — the probe-side fold that keeps refresh
    * append-only.  Fully-retracted keys (total n = 0) drop HERE, so
    * densify sees exactly the key set a rebuild-on-survivors would
    * produce; the served shape stays (date, event_type, v) — the
    * count column never reaches a consumer.  Exposed un-checkpointed
    * so the spec can assert its plan scans ONLY the warehouse (zero
    * events scans). */
  private def foldedDeltas(spark: SparkSession, path: String): DataFrame =
    graft.sources.CommitLog.snapshot(spark, path).read(path)
      .groupBy(col("date"), col("event_type"))
      .agg(sum(col("vsum")).as("vsum"), sum(col("n")).as("n"))
      .filter(col("n") =!= 0)

  private[graft] def mergedDaily(spark: SparkSession, path: String): DataFrame =
    foldedDeltas(spark, path)
      .select(col("date"), col("event_type"),
        roundx(col("vsum").cast("double"), 3).as("v"))

  /** The dense grid served from the index at rest: delta merge, the
    * single probe-time 3-dp round, then the shared zero-fill — the
    * EXACT plan tail TimeSeries.dailyGrid runs inline after its
    * corpus shuffle, on the identical key set (delta keys = the
    * (date, type) pairs present in the events), so after base + batch
    * ingest every grid consumer holds its inline oracle verbatim. */
  def grid(spark: SparkSession, path: String): DataFrame =
    TimeSeries.densify(mergedDaily(spark, path).localCheckpoint())

  /** Registered `q_ts_anomaly_probe`: the alerting leg off the
    * refreshed rollup.  base ∪ incoming = all events, so the result
    * equals q_ts_anomaly bit for bit and shares its oracle VERBATIM.
    * (spark, path) only — no source-dir parameter, because the probe
    * reads NOTHING but the warehouse (a review finding: a dead `dir`
    * param suggested otherwise). */
  def anomalyProbe(spark: SparkSession, path: String): DataFrame =
    TimeSeries.anomalyOfGrid(grid(spark, path))

  /** Registered `q_ts_corr_probe` / `q_ts_seasonal_probe` /
    * `q_ts_decompose_probe`: the other registered grid consumers,
    * served from the same rollup — what makes "every grid consumer
    * holds its inline oracle VERBATIM" registered code rather than
    * prose (window search stays inline-only: it is parameterized by
    * an ad-hoc query window, the one leg probes don't serve from a
    * standing form). */
  def corrProbe(spark: SparkSession, path: String): DataFrame =
    TimeSeries.corrOfGrid(grid(spark, path))

  def seasonalProbe(spark: SparkSession, path: String): DataFrame =
    TimeSeries.seasonalOfGrid(grid(spark, path))

  def decomposeProbe(spark: SparkSession, path: String): DataFrame =
    TimeSeries.decomposeOfGrid(grid(spark, path))

  /** Registered `q_ts_anomaly_seasonal_probe`: the weekday-aware
    * alerter served from the rollup — bit-equal grid ⇒ shares
    * q_ts_anomaly_seasonal's oracle VERBATIM. */
  def anomalySeasonalProbe(spark: SparkSession, path: String): DataFrame =
    TimeSeries.anomalySeasonalOfGrid(grid(spark, path))

  /** Registered `q_ts_forecast_backtest_probe`: the forecast's
    * holdout evaluation served from the rollup — the SEVENTH grid
    * consumer, and the shape forecast MONITORING takes in production:
    * the MAE-vs-actuals check re-runs at refresh cadence (when the
    * grid changes), so it reads the standing grid, not raw events.
    * Bit-equal grid ⇒ shares q_ts_forecast_backtest's oracle
    * VERBATIM.  With this, every grid consumer that admits a standing
    * form is served at rest (window search stays inline-only BY
    * DESIGN: parameterized by an ad-hoc query window). */
  def backtestProbe(spark: SparkSession, path: String): DataFrame =
    TimeSeries.backtestOfGrid(grid(spark, path))

  /** Registered `q_ts_forecast_probe`: the seasonal-naive forecast
    * served from the rollup — the fifth grid consumer, and the one a
    * production alerter actually polls (tomorrow's expected volume
    * changes only when the grid does, i.e. at refresh cadence, so
    * serving it from the standing form is the natural deployment).
    * Bit-equal grid ⇒ shares q_ts_forecast's oracle VERBATIM. */
  def forecastProbe(spark: SparkSession, path: String): DataFrame =
    TimeSeries.forecastOfGrid(grid(spark, path))

  /** The once-per-JVM two-generation build (the Materialized
    * pattern): rollup of the base split, then ONE refresh folding in
    * the incoming split. */
  def builtPath(spark: SparkSession, dir: String): String =
    graft.sources.Materialized.pathFor("ts_warehouse", dir) { p =>
      val e = Tables(spark, dir).events
      materializeFrom(e.filter(isBaseEvent), p)
      refresh(spark, e.filter(!isBaseEvent), p)
    }

  /** The week-grain ingest split the data-skipping demonstration
    * rides — the production refresh cadence (one generation per
    * ingest window), which is exactly what makes the recorded date
    * stats selective: each generation's [min, max] date range is one
    * week, so a trailing-window probe proves all earlier weeks empty
    * AT THE LOG.  (The mod-10 split builds both generations over the
    * full date range — correct, but nothing to skip.) */
  private[graft] def weekChunk =
    floor((dayofmonth(col("ts")) - 1) / 7).cast("int")

  /** The once-per-JVM week-cadence build: five generations, one per
    * calendar week of the events table. */
  def builtWeeklyPath(spark: SparkSession, dir: String): String =
    graft.sources.Materialized.pathFor("ts_warehouse_weekly", dir) { p =>
      val e = Tables(spark, dir).events
      materializeFrom(e.filter(weekChunk === 0), p)
      (1 to 4).foreach(w => refresh(spark, e.filter(weekChunk === w), p))
    }

  /** Registered `q_ts_recent_window`: the trailing-`days` slice of the
    * daily rollup — the monitoring family's hottest read shape ("the
    * last week of every series"), served with LOG-LEVEL DATA SKIPPING:
    * the latest date comes from the commit entries' stats (zero
    * scans), and `readWhere` drops every generation whose recorded
    * date range ends before the cutoff BEFORE any file listing.  At
    * ingest cadence the live generation count grows with time; this
    * probe's scan set stays O(generations overlapping the window) —
    * bounded by the window, not by history (TsWarehouseSpec asserts
    * the skipped generations never reach the plan).  The real filter
    * still applies on the kept generations, so the result equals the
    * unskipped read row for row — ORACLED against the daily SQL with
    * the identical trailing-window predicate.
    *
    * ANCHOR CONTRACT (review r12b): the window anchors on the newest
    * date ever INGESTED — stats are retraction-agnostic (negated
    * deltas carry the same dates), so retracting the entire tail does
    * NOT slide the window back; the probe then faithfully reports an
    * empty (or thinner) recent window until `compact` re-records
    * stats from the folded survivors.  That is the right monitoring
    * semantics: an alerter must say "the last week has no surviving
    * data", never silently re-anchor onto week-old data and call it
    * recent.  (TsWarehouseSpec pins the tail-retraction case and the
    * compact heal.)  Named asymmetry (ADVICE r13 #1): the stats-less
    * FALLBACK below can only anchor on net n != 0 — retracted dates
    * are unknowable from a folded zero-row state — so in the
    * (fallback ∧ fully-retracted-tail) corner the window re-anchors
    * where the stats path would report empty.  Deliberate: the
    * fallback exists for foreign-writer/folded-empty states where the
    * ingest anchor is simply not recorded anywhere; the monitoring
    * contract holds on every state THIS member's verbs write (they
    * all record stats).  Contrast JoinViewWarehouse.recentYears — the
    * DASHBOARD window — which wants the net anchor on BOTH paths and
    * verifies its stats anchor for exactly that reason. */
  def recentWindow(spark: SparkSession, path: String, days: Int = 7): DataFrame = {
    require(days >= 1, s"window must be at least one day, got $days")
    val snap = graft.sources.CommitLog.snapshot(spark, path)
    if (snap.maxGen < 0) // a path with NO committed log stays loud
      throw new IllegalStateException(
        s"recentWindow: no committed generations under '$path' — not a TsWarehouse")
    // statsMax answers from the log (zero scans) whenever every live
    // generation recorded date stats — the normal case, since every
    // TsWarehouse verb declares them.  Two reachable states lack them
    // (ADVICE r12): (a) the warehouse FOLDED TO EMPTY — retract all
    // rows then compact writes a zero-row replace, which records no
    // stats by design; (b) a generation written outside these verbs.
    // Both fall back to ONE scan of the folded state; an empty fold
    // serves the probe's empty frame instead of throwing — "the last
    // week has no surviving data" is an answer, not an error.
    val latestOpt: Option[String] = snap.statsMax(path, "date").orElse(
      snap.readOpt(path).flatMap { df =>
        Option(df.groupBy(col("date"))
          .agg(sum(col("n")).as("n")).filter(col("n") =!= 0)
          .agg(max(col("date")).as("mx")).head().getAs[java.sql.Date]("mx"))
          .map(_.toString)
      })
    latestOpt match {
      case None => // warehouse folded to empty: the probe's empty frame
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("date",
              org.apache.spark.sql.types.DateType),
            org.apache.spark.sql.types.StructField("event_type",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("v",
              org.apache.spark.sql.types.DoubleType))))
      case Some(latest) =>
        val cutoff = java.time.LocalDate.parse(latest).minusDays(days - 1L).toString
        val kept = snap.readWhere(path, "date", Some(cutoff), None).getOrElse(
          throw new IllegalStateException( // unreachable: the max-date gen survives
            s"recentWindow: every generation pruned at cutoff $cutoff"))
        kept.filter(col("date") >= lit(cutoff).cast("date"))
          .groupBy(col("date"), col("event_type"))
          .agg(sum(col("vsum")).as("vsum"), sum(col("n")).as("n"))
          .filter(col("n") =!= 0)
          .select(col("date"), col("event_type"),
            roundx(col("vsum").cast("double"), 3).as("v"))
    }
  }

  /** The slice the registered retraction removes — deliberately
    * CROSS-CUTTING (mod-7 on event_id, so it takes events from the
    * mod-10 base and incoming generations alike): a delete verb that
    * only worked on whole generations would be a rollback, not a
    * retraction (BalanceWarehouse.isRetractedCust's rationale). */
  private[graft] def isRetractedEvent = pmod(col("event_id"), lit(7L)) === 0

  /** The retraction build: ingest + refresh as `builtPath`, then
    * retract the cross-cutting slice — grid == rebuild on the
    * surviving events bit-for-bit (TsWarehouseSpec pins it). */
  def builtRetractedPath(spark: SparkSession, dir: String): String =
    graft.sources.Materialized.pathFor("ts_warehouse_retracted", dir) { p =>
      val e = Tables(spark, dir).events
      materializeFrom(e.filter(isBaseEvent), p)
      refresh(spark, e.filter(!isBaseEvent), p)
      retract(spark, e.filter(isRetractedEvent), p)
    }

  /** The refresh's ONLINE twin at the EXACTLY-ONCE rung — the rollup
    * maintained in flight: each micro-batch's per-key decimal partial
    * sums fold in one transaction that also commits the engine batch
    * id (associativity makes any batching serve a bit-equal grid; the
    * BatchMarkers fast-skip absorbs common replays with zero Spark
    * actions; the txn-embedded id closes the marker-lost crash
    * window; the lineage guard makes checkpoint/marker divergence a
    * loud failure; the count-triggered log checkpoint bounds marker
    * I/O).  TsWarehouseSpec drives a MemoryStream in two batches ==
    * the one-shot fold, plus a redelivered committed batch. */
  def streamingRefresh(events: DataFrame, path: String,
      checkpointEvery: Int = 32): org.apache.spark.sql.streaming.StreamingQuery =
    graft.sources.StreamTwin.exactlyOnce(events, path, checkpointEvery)(
      (s, batch, id) => { refreshTxn(s, batch, path, batchId = Some(id)); () })
}
