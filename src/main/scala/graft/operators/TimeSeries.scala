package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.functions.Exact.{avgx, roundx, sumx}
import graft.sources.Tables

/** Time-series analytics over the per-day event series — the
  * similarity-search leg the retrieved streaming-similarity papers
  * cover (time-series similarity search over distributed/streaming
  * data; top-k subsequence retrieval).
  *
  * Both operators start from the same zero-filled (date × event_type)
  * grid of daily value sums: DECIMAL-exact sums (sumx), 3-dp rounded
  * — the grid is calendar-bounded metadata (days × series), tiny
  * relative to the events it summarizes, so everything after the
  * first aggregation is a small-frame computation at ANY event
  * volume; the one corpus-scale stage is the (date, event_type)
  * partial-aggregated shuffle.
  */
object TimeSeries {

  /** 1e-3 fixed point: daily sums ~1e4 quantize to ~1e7, squares
    * ~1e14, × days × n — well inside BIGINT/DECIMAL(38,0). */
  private val Scale = 1e3

  /** The zero-filled daily grid: (d dayIndex, date, event_type, v)
    * with v the 3-dp-exact daily sum (0 for absent combinations —
    * the grid must be DENSE for window positions to align). */
  private[graft] def dailyGrid(events: DataFrame): DataFrame = {
    // the checkpoint pins the calendar×series aggregate (metadata-
    // scale) so the grid's MANY consumers — dates, types, the join,
    // both sides of the pair/window self-joins downstream — never
    // re-run the one corpus-scale stage (each un-pinned reference
    // would re-scan events; the Pca.covFrom lesson)
    densify(events
      .groupBy(to_date(col("ts")).as("date"), col("event_type"))
      .agg(roundx(sumx(col("value")), 3).as("v"))
      .localCheckpoint())
  }

  /** Zero-fill a sparse (date, event_type, v) frame over its own
    * calendar × series key space — shared by the inline grid and the
    * rollup served from TsWarehouse at rest (the merged delta rows
    * carry exactly the key pairs present in the events, so the
    * densified grids are identical). */
  private[graft] def densify(daily: DataFrame): DataFrame = {
    val dates = daily.select(col("date")).distinct()
    val types = daily.select(col("event_type")).distinct()
    dates.crossJoin(types) // calendar × series — metadata-scale
      .join(daily, Seq("date", "event_type"), "left")
      .select(col("date"), col("event_type"),
        coalesce(col("v"), lit(0.0)).as("v"))
  }

  /** `q_ts_corr`: Pearson correlation between every pair of
    * event-type daily-volume series — "which metrics move together",
    * the dashboard companion of the drift monitor.  The s_embed_cov
    * exactness discipline at 1e-3 fixed point: quantized longs,
    * DECIMAL moment sums over the date-aligned pair join, the
    * n·Σab − Σa·Σb identity, ONE double division + sqrt + 6-dp
    * roundx; a zero-variance series yields NULL (no engine-divergent
    * 0/0).  ORACLED. */
  def tsCorr(spark: SparkSession, dir: String): DataFrame =
    tsCorrOf(Tables(spark, dir).events)

  private[graft] def tsCorrOf(events: DataFrame): DataFrame =
    corrOfGrid(dailyGrid(events))

  /** The correlation tail over an already-built dense grid — shared
    * by the inline query and TsWarehouse's rollup-served probe. */
  private[graft] def corrOfGrid(grid: DataFrame): DataFrame = {
    val g = grid
      .select(col("date"), col("event_type"),
        floor(col("v") * Scale + 0.5).as("q"))
    val pairs = g.as("a")
      .join(g.as("b"), col("a.date") === col("b.date") &&
        col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("etype_a"), col("b.event_type").as("etype_b"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("a.q").cast("decimal(38,0)")).as("sa"),
        sum(col("b.q").cast("decimal(38,0)")).as("sb"),
        sum((col("a.q") * col("b.q")).cast("decimal(38,0)")).as("sab"),
        sum((col("a.q") * col("a.q")).cast("decimal(38,0)")).as("saa"),
        sum((col("b.q") * col("b.q")).cast("decimal(38,0)")).as("sbb"))
    def centered(sxx: Column, sx: Column) =
      (col("n_days") * sxx - sx * sx).cast("double")
    val cov = (col("n_days") * col("sab") - col("sa") * col("sb")).cast("double")
    pairs.select(col("etype_a"), col("etype_b"), col("n_days"),
      when(centered(col("saa"), col("sa")) > 0 && centered(col("sbb"), col("sb")) > 0,
        roundx(cov / sqrt(centered(col("saa"), col("sa")) *
          centered(col("sbb"), col("sb"))), 6)).as("corr"))
  }

  /** `q_ts_window_search`: top-k z-normalized subsequence similarity
    * search — given a query window (the FIRST 7 days of the `click`
    * series), find the nearest 7-day windows across ALL series and
    * offsets (UCR-suite-style whole-window matching, the shape the
    * retrieved top-k trajectory/streaming-similarity papers serve).
    *
    * Plan: the grid's per-series windows assemble via collect_list
    * over a rowsBetween(0, 6) frame (frame order = sort order, so
    * arrays are date-ordered); z-normalization and the distance are
    * SEQUENTIAL array folds (0 + x₁ + x₂ + … — Spark's aggregate HOF
    * and explicit left-associative SQL addition produce the same IEEE
    * sequence, the VectorFunctions pairing), so the oracle matches to
    * the 6-dp round.  Flat windows (σ = 0) are excluded on BOTH
    * sides — z is undefined there, and NULL ordering differs between
    * engines.  Windows per series = days − 6: the frame after the
    * first aggregation is (series × offsets), metadata-scale; top-k
    * compiles to TakeOrderedAndProject.  ORACLED. */
  def tsWindowSearch(spark: SparkSession, dir: String,
      w: Int = 7, k: Int = 10): DataFrame =
    tsWindowSearchOf(Tables(spark, dir).events, w, k)

  /** `q_ts_anomaly`: rolling z-score anomaly report — for every day
    * with a full 7-day trailing baseline, how many baseline std devs
    * the day sits from the baseline mean; top-k |z| across all
    * series.  The operational alerting leg next to q_ts_corr's
    * "move together" and the drift monitor's corpus-level view.
    *
    * Same machinery as tsWindowSearch: trailing window = collect_list
    * over rowsBetween(−w, −1) (ROW semantics, date-ordered), mean/σ
    * as sequential folds the oracle reproduces left-associatively,
    * σ = 0 baselines excluded on both sides, 6-dp roundx, top-k =
    * TakeOrderedAndProject.  ORACLED. */
  def tsAnomaly(spark: SparkSession, dir: String,
      w: Int = 7, k: Int = 10): DataFrame =
    tsAnomalyOf(Tables(spark, dir).events, w, k)

  private[graft] def tsAnomalyOf(events: DataFrame,
      w: Int = 7, k: Int = 10): DataFrame =
    anomalyOfGrid(dailyGrid(events), w, k)

  /** The anomaly tail over an already-built dense grid — shared by
    * the inline query and TsWarehouse's rollup-served probe. */
  private[graft] def anomalyOfGrid(grid: DataFrame,
      w: Int = 7, k: Int = 10): DataFrame = {
    val byType = Window.partitionBy(col("event_type")).orderBy(col("date"))
    grid
      .withColumn("arr", collect_list(col("v")).over(byType.rowsBetween(-w, -1)))
      .filter(size(col("arr")) === w)
      .withColumn("mu", aggregate(col("arr"), lit(0.0), (a, x) => a + x) / w)
      .withColumn("sd", sqrt(aggregate(col("arr"), lit(0.0),
        (a, x) => a + (x - col("mu")) * (x - col("mu"))) / w))
      .filter(col("sd") > 0)
      .select(col("event_type"), col("date"), col("v"),
        roundx(col("mu"), 6).as("baseline_mean"),
        roundx((col("v") - col("mu")) / col("sd"), 6).as("z"))
      .orderBy(abs(col("z")).desc, col("event_type"), col("date"))
      .limit(k)
  }

  /** `q_ts_seasonal`: day-of-week seasonal decomposition of every
    * daily-volume series — the seasonal index (dow mean over series
    * mean) that turns q_ts_anomaly's flat trailing baseline into a
    * weekday-aware one, and the classical first step of an STL-style
    * decomposition.  Starts from the same dense grid as the other
    * three ts operators (one corpus-scale (date, event_type) shuffle;
    * everything after is calendar×series metadata): dow sums are
    * DECIMAL-exact over the 3-dp grid values, and the index is two
    * IEEE multiplies + one divide on exactly-rounded inputs
    * ((Σ_dow · days_total) / (days_dow · Σ_total)), so both engines
    * see the identical float sequence.  An all-zero series yields
    * NULL indexes (no engine-divergent 0/0).  ORACLED. */
  def tsSeasonal(spark: SparkSession, dir: String): DataFrame =
    tsSeasonalOf(Tables(spark, dir).events)

  private[graft] def tsSeasonalOf(events: DataFrame): DataFrame =
    seasonalOfGrid(dailyGrid(events))

  /** The seasonal tail over an already-built dense grid — shared by
    * the inline query and TsWarehouse's rollup-served probe. */
  private[graft] def seasonalOfGrid(grid: DataFrame): DataFrame = {
    // Spark dayofweek: 1=Sunday..7=Saturday (the oracle mirrors
    // DuckDB's 0-based dayofweek with +1)
    val byDow = grid
      .groupBy(col("event_type"), dayofweek(col("date")).cast("long").as("dow"))
      .agg(count(lit(1)).as("n_days"), roundx(sumx(col("v")), 3).as("sum_v"))
      .localCheckpoint() // metadata-scale (series × 7); feeds both legs
    val overall = byDow.groupBy(col("event_type"))
      .agg(sum(col("n_days")).as("tot_days"),
        roundx(sumx(col("sum_v")), 3).as("tot_v"))
    byDow.join(overall, Seq("event_type"))
      .select(col("event_type"), col("dow"), col("n_days"),
        roundx(col("sum_v") / col("n_days"), 6).as("dow_mean"),
        when(col("tot_v") =!= 0.0,
          roundx((col("sum_v") * col("tot_days")) /
            (col("n_days") * col("tot_v")), 6)).as("seasonal_idx"))
  }

  /** `q_ts_decompose`: the classical seasonal-trend-residual split of
    * every daily series — the step AFTER q_ts_seasonal, and the input
    * a weekday-aware anomaly detector actually alerts on: adjusted =
    * v − dow_mean (the seasonal component removed), trend = trailing
    * 7-day mean of the ADJUSTED series, residual = adjusted − trend.
    * Same machinery as q_ts_anomaly (rowsBetween trailing window,
    * sequential folds the oracle reproduces left-associatively);
    * adjusted is 6-dp rounded BEFORE the trend fold so both engines
    * fold identical inputs; days without a full baseline are
    * excluded.  One corpus-scale grid shuffle, then series × calendar
    * metadata.  ORACLED. */
  def tsDecompose(spark: SparkSession, dir: String, w: Int = 7): DataFrame =
    tsDecomposeOf(Tables(spark, dir).events, w)

  private[graft] def tsDecomposeOf(events: DataFrame, w: Int = 7): DataFrame =
    decomposeOfGrid(dailyGrid(events), w)

  /** The per-(series, day-of-week) baseline aggregate — the ONE
    * definition both the decomposition and the forecast's dow-mean
    * leg derive from (a drift in the rounding discipline must break
    * every composition or none — the tsDecomposeChain rule applied
    * to the Scala side too). */
  private def dowSumsOfGrid(grid: DataFrame): DataFrame =
    grid
      .groupBy(col("event_type"), dayofweek(col("date")).cast("long").as("dow"))
      .agg(count(lit(1)).as("n_days"), roundx(sumx(col("v")), 3).as("sum_v"))

  /** The decompose tail over an already-built dense grid — shared by
    * the inline query and TsWarehouse's rollup-served probe (the
    * corrOfGrid/anomalyOfGrid/seasonalOfGrid pattern, completing
    * "every grid consumer holds its inline oracle verbatim" for the
    * fourth and last standing-form consumer). */
  private[graft] def decomposeOfGrid(grid0: DataFrame, w: Int = 7): DataFrame = {
    val grid = grid0.localCheckpoint() // feeds dow means + windows
    val byDow = dowSumsOfGrid(grid)
    val adjusted = grid
      .withColumn("dow", dayofweek(col("date")).cast("long"))
      .join(byDow, Seq("event_type", "dow"))
      .withColumn("dow_mean", roundx(col("sum_v") / col("n_days"), 6))
      .withColumn("adj", roundx(col("v") - col("dow_mean"), 6))
    val byType = Window.partitionBy(col("event_type")).orderBy(col("date"))
    adjusted
      .withColumn("arr", collect_list(col("adj")).over(byType.rowsBetween(-w, -1)))
      .filter(size(col("arr")) === w)
      .withColumn("mu", aggregate(col("arr"), lit(0.0), (a, x) => a + x) / w)
      .select(col("event_type"), col("date"), col("v"),
        col("dow_mean"), col("adj").as("adjusted"),
        roundx(col("mu"), 6).as("trend"),
        roundx(col("adj") - col("mu"), 6).as("residual"))
  }

  /** `q_ts_forecast`: seasonal-naive forecast with trend — the step
    * AFTER q_ts_decompose, and what the decomposition exists to feed:
    * for each series, the next `h` days' expected volume is the LAST
    * day's deseasonalized trailing trend plus the target day's
    * day-of-week mean, ŷ(t+k) = trend(t) + dow_mean(dow(t+k)) — the
    * classical decomposition forecast (the seasonal-naive baseline
    * every forecasting benchmark reports first).
    *
    * Exactness: trend and dow_mean are the decompose output's own
    * 6-dp-rounded columns, so the forecast is ONE IEEE addition on
    * identical doubles in both engines + a 6-dp roundx; forecast
    * dates are pure integer date arithmetic.  Plan: the decompose
    * tail (one corpus-scale grid shuffle, then metadata), a
    * row_number top-1 per series for the anchor, a 7-row explode, and
    * a broadcast-sized join to the (series × 7) dow-mean table.
    * ORACLED (composes QTsDecomposeSql's CTE chain verbatim). */
  def tsForecast(spark: SparkSession, dir: String, h: Int = 7): DataFrame =
    forecastOfGrid(dailyGrid(Tables(spark, dir).events), h)

  private[graft] def forecastOfGrid(grid0: DataFrame, h: Int = 7): DataFrame = {
    // feeds dow means + the decompose tail; the nested checkpoint a
    // composing caller (backtest) adds pins days × series rows — KB
    val grid = grid0.localCheckpoint()
    val dowMeans = dowSumsOfGrid(grid)
      .select(col("event_type"), col("dow"),
        roundx(col("sum_v") / col("n_days"), 6).as("dow_mean"))
    val lastW = Window.partitionBy(col("event_type"))
      .orderBy(col("date").desc)
    val anchor = decomposeOfGrid(grid, 7)
      .withColumn("rn", row_number().over(lastW))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("date").as("last_date"),
        col("trend").as("last_trend"))
    anchor
      .select(col("event_type"), col("last_date"), col("last_trend"),
        explode(sequence(lit(1), lit(h))).as("steps"))
      .withColumn("forecast_date", date_add(col("last_date"), col("steps")))
      .withColumn("dow", dayofweek(col("forecast_date")).cast("long"))
      // series × 7 rows: broadcast, don't shuffle the anchor frame
      .join(broadcast(dowMeans), Seq("event_type", "dow"))
      .select(col("event_type"), col("forecast_date"),
        col("steps").cast("long").as("steps"),
        roundx(col("last_trend") + col("dow_mean"), 6).as("forecast"))
  }

  /** `q_ts_anomaly_seasonal`: the WEEKDAY-AWARE anomaly report — the
    * alerter the decomposition exists to feed, and the fix for
    * q_ts_anomaly's known blind spot: a flat trailing baseline flags
    * every Sunday of a weekly-patterned series, while scoring the
    * decompose RESIDUAL (v − dow_mean − trend) only fires on days
    * that deviate from their own weekday's expectation.  Per series,
    * z = (residual − μ_residual) / σ_residual; top-k |z| across all
    * series — the q_ts_anomaly output stance (a ranked score, not a
    * threshold boolean, so no engine-divergent boundary exists).
    *
    * Exactness: residuals are the decompose output's own 6-dp
    * doubles; Σresidual is EXACT via DECIMAL(30,6) (6-dp values cast
    * losslessly), Σresidual² via a per-row DECIMAL(38,12) cast (one
    * deterministic conversion identical in both engines — the
    * Exact.sumx argument) then exact order-free summation; the
    * variance and z are the identical IEEE sequence both sides, and
    * σ² ≤ 0 series (constant residuals) are excluded on both.  Plan:
    * the one grid shuffle, the decompose tail, one series-keyed
    * metadata aggregate broadcast back, TakeOrderedAndProject.
    * ORACLED (composes the decompose chain verbatim). */
  def tsAnomalySeasonal(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    anomalySeasonalOfGrid(dailyGrid(Tables(spark, dir).events), k)

  private[graft] def anomalySeasonalOfGrid(grid: DataFrame, k: Int = 10): DataFrame = {
    val dec = decomposeOfGrid(grid).localCheckpoint() // feeds stats + rows
    val stats = dec.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("residual").cast("decimal(30,6)")).cast("double").as("s"),
        sum((col("residual") * col("residual")).cast("decimal(38,12)"))
          .cast("double").as("qq"))
    dec.join(broadcast(stats), Seq("event_type"))
      .withColumn("mu2", col("s") / col("n"))
      .withColumn("va",
        col("qq") / col("n") - (col("s") / col("n")) * (col("s") / col("n")))
      .filter(col("va") > 0)
      .select(col("event_type"), col("date"), col("v"), col("residual"),
        roundx((col("residual") - col("mu2")) / sqrt(col("va")), 6).as("z_seasonal"))
      .orderBy(abs(col("z_seasonal")).desc, col("event_type"), col("date"))
      .limit(k)
  }

  /** `q_ts_forecast_backtest`: the forecast's evaluation loop — the
    * first thing any forecasting deployment ships next to the
    * forecaster itself: hold out the last 7 grid days, fit the
    * decomposition on the rest, forecast the holdout, score per-series
    * MAE against actuals.  A rising MAE is the "this series stopped
    * being weekly-seasonal" alert that tells the alerter its baseline
    * went stale.
    *
    * Exactness: forecasts and actuals are the standing queries' own
    * 6/3-dp-rounded doubles, |f − v| is one identical IEEE op both
    * engines, and the MAE rides the DECIMAL route (avgx) + 6-dp
    * roundx.  The cutoff is calendar arithmetic off max(date),
    * computed as a 1-row aggregate broadcast against the grid — no
    * driver collect, and the oracle composes the SAME expression.
    * Plan: the one grid shuffle, then series × calendar metadata —
    * the train filter, forecast tail, and the 7-row-per-series
    * actuals join are all post-grid.  ORACLED (the decompose chain +
    * forecast CTEs VERBATIM over the truncated grid). */
  def tsForecastBacktest(spark: SparkSession, dir: String, h: Int = 7): DataFrame =
    backtestOfGrid(dailyGrid(Tables(spark, dir).events), h)

  private[graft] def backtestOfGrid(grid0: DataFrame, h: Int = 7): DataFrame = {
    val grid = grid0.localCheckpoint() // feeds cutoff, train AND actuals
    val cut = grid.agg(date_sub(max(col("date")), h).as("cutoff"))
    val train = grid.crossJoin(broadcast(cut))
      .filter(col("date") <= col("cutoff"))
      .select(col("date"), col("event_type"), col("v"))
    val actuals = grid.select(col("event_type").as("a_type"),
      col("date").as("a_date"), col("v"))
    val fc = forecastOfGrid(train, h)
    fc.join(actuals, fc("event_type") === col("a_type") &&
        fc("forecast_date") === col("a_date"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_scored"),
        roundx(avgx(abs(col("forecast") - col("v"))), 6).as("mae"))
  }

  private[graft] def tsWindowSearchOf(events: DataFrame,
      w: Int = 7, k: Int = 10): DataFrame = {
    val byType = Window.partitionBy(col("event_type")).orderBy(col("date"))
    val wins = dailyGrid(events)
      .withColumn("arr", collect_list(col("v")).over(byType.rowsBetween(0, w - 1)))
      .filter(size(col("arr")) === w)
      .withColumn("mu", aggregate(col("arr"), lit(0.0), (a, x) => a + x) / w)
      .withColumn("sd", sqrt(aggregate(col("arr"), lit(0.0),
        (a, x) => a + (x - col("mu")) * (x - col("mu"))) / w))
      .filter(col("sd") > 0)
      .withColumn("z", transform(col("arr"),
        x => (x - col("mu")) / col("sd")))
      .select(col("event_type"), col("date").as("start_date"), col("z"))
    val q = wins.filter(col("event_type") === "click")
      .orderBy(col("start_date"))
      .limit(1)
      .select(col("z").as("qz"), col("start_date").as("qd"))
    wins.crossJoin(broadcast(q))
      .filter(col("event_type") =!= "click" || col("start_date") =!= col("qd"))
      .withColumn("dist", roundx(sqrt(aggregate(
        zip_with(col("z"), col("qz"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (a, x) => a + x)), 6))
      .orderBy(col("dist"), col("event_type"), col("start_date"))
      .limit(k)
      .select(col("event_type"), col("start_date"), col("dist"))
  }
}
