package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

/** Time-series leg invariants: grid density/zero-fill, correlation
  * sign and degenerate cases on planted series, and the subsequence
  * search's contract on the real table.
  */
class TimeSeriesSpec extends GraftSpec {

  private def ts(day: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  test("daily grid is dense and zero-filled") {
    import spark.implicits._
    // type "b" missing entirely on day 2
    val events = Seq(
      (ts(1), "a", 1.0), (ts(1), "b", 2.0),
      (ts(2), "a", 3.0)).toDF("ts", "event_type", "value")
    val g = TimeSeries.dailyGrid(events).collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) -> r.getDouble(2)).toMap
    assert(g.size == 4) // 2 dates × 2 types
    assert(g(("2024-01-02", "b")) == 0.0)
    assert(g(("2024-01-02", "a")) == 3.0)
  }

  test("correlation: planted linear, anti-linear, and constant series") {
    import spark.implicits._
    // a: 1..5, b = 2a (corr 1), c = -a (corr -1 with a), k constant
    val events = (1 to 5).flatMap { d =>
      Seq((ts(d), "a", d.toDouble), (ts(d), "b", 2.0 * d),
        (ts(d), "c", -d.toDouble), (ts(d), "k", 7.0))
    }.toDF("ts", "event_type", "value")
    val r = TimeSeries.tsCorrOf(events).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (if (x.isNullAt(3)) None else Some(x.getDouble(3)))).toMap
    assert(r.size == 6)
    assert(r(("a", "b")) == Some(1.0))
    assert(r(("a", "c")) == Some(-1.0))
    // constant series has zero variance → NULL, never NaN
    assert(r(("a", "k")) == None && r(("b", "k")) == None && r(("c", "k")) == None)
  }

  test("window search: k rows, ascending, query window excluded, z-scale invariance") {
    val r = TimeSeries.tsWindowSearch(spark, Dir).collect()
    assert(r.length == 10)
    val dists = r.map(_.getDouble(2))
    assert(dists.sliding(2).forall(p => p(0) <= p(1)), "not ascending")
    assert(dists.forall(d => d >= 0.0), "negative distance")
    // the query window (first click window) must not match itself
    val firstClick = TimeSeries.tsWindowSearch(spark, Dir, k = 1000).collect()
      .filter(x => x.getString(0) == "click")
      .map(_.getDate(1).toString).min
    val minDate = graft.sources.Tables(spark, Dir).events
      .agg(min(to_date(col("ts")))).head().getDate(0).toString
    assert(firstClick > minDate,
      s"query window (click @ $minDate) leaked into results")
  }

  test("anomaly: a planted spike dominates the report with the right z") {
    import spark.implicits._
    // series "a": constant 10 for 7 days then a spike; "b": constant
    // (σ=0 baseline → excluded); "c": gentle alternation (nonzero σ)
    val events = (1 to 8).flatMap { d =>
      val a = if (d == 8) 100.0 else 10.0
      Seq((ts(d), "a", a), (ts(d), "b", 5.0),
        (ts(d), "c", if (d % 2 == 0) 4.0 else 6.0))
    }.toDF("ts", "event_type", "value")
    val r = TimeSeries.tsAnomalyOf(events).collect()
    // "a" day-8: baseline mean 10 σ 0? — constant baseline is σ=0 →
    // excluded!  So plant variance into a's baseline too:
    assert(r.forall(_.getString(0) != "b"), "σ=0 series leaked in")
    val events2 = (1 to 8).flatMap { d =>
      val a = if (d == 8) 100.0 else if (d % 2 == 0) 9.0 else 11.0
      Seq((ts(d), "a", a), (ts(d), "c", if (d % 2 == 0) 4.0 else 6.0))
    }.toDF("ts", "event_type", "value")
    val r2 = TimeSeries.tsAnomalyOf(events2).collect()
    val top = r2.head
    assert(top.getString(0) == "a" && top.getDate(1).toString == "2024-01-08")
    // baseline: 11,9,11,9,11,9,11 → mean 71/7, var = (4·(9−μ)²·3 + …)
    val mu = (11.0 + 9 + 11 + 9 + 11 + 9 + 11) / 7
    val sd = math.sqrt((1 to 7).map(d => math.pow((if (d % 2 == 0) 9.0 else 11.0) - mu, 2)).sum / 7)
    assert(math.abs(top.getDouble(4) - (100.0 - mu) / sd) < 1e-4,
      s"z ${top.getDouble(4)} vs expected ${(100.0 - mu) / sd}")
  }

  test("seasonal: planted Sunday spike yields the textbook index; zero series → NULL") {
    import spark.implicits._
    // 2024-01-01 is a Monday; days 7 and 14 are the two Sundays.
    // "a": 7.0 on Sundays, 1.0 otherwise → Σ=26 over 14 days;
    // "z": all-zero (tot_v = 0 → NULL indexes, never 0/0)
    val events = (1 to 14).flatMap { d =>
      Seq((ts(d), "a", if (d % 7 == 0) 7.0 else 1.0), (ts(d), "z", 0.0))
    }.toDF("ts", "event_type", "value")
    val r = TimeSeries.tsSeasonalOf(events).collect()
      .map(x => (x.getString(0), x.getLong(1)) -> x).toMap
    assert(r.size == 14) // 2 series × 7 dows, every dow present
    val sun = r(("a", 1L)) // Spark dayofweek: Sunday = 1
    assert(sun.getAs[Long]("n_days") == 2 && sun.getAs[Double]("dow_mean") == 7.0)
    // idx = (Σ_dow · days_total)/(days_dow · Σ_total) = (14·14)/(2·26)
    assert(sun.getAs[Double]("seasonal_idx") ==
      BigDecimal(196.0 / 52.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val mon = r(("a", 2L))
    assert(mon.getAs[Double]("dow_mean") == 1.0 &&
      mon.getAs[Double]("seasonal_idx") ==
        BigDecimal(28.0 / 52.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    (1L to 7L).foreach(d => assert(r(("z", d)).isNullAt(
      r(("z", d)).fieldIndex("seasonal_idx")), s"zero series dow $d not NULL"))
  }

  test("decompose: constant series is all-zero; a pure dow pattern leaves ~zero residuals") {
    import spark.implicits._
    // "c": constant 5 → dow_mean 5, adjusted 0, trend 0, residual 0;
    // "a": pure weekly pattern (7 on Sundays, 1 otherwise) → the
    // seasonal adjustment removes it entirely, so adjusted, trend and
    // residual are all 0 too — over 21 days each dow repeats 3×
    val events = (1 to 21).flatMap { d =>
      Seq((ts(d), "a", if (d % 7 == 0) 7.0 else 1.0), (ts(d), "c", 5.0))
    }.toDF("ts", "event_type", "value")
    val r = TimeSeries.tsDecomposeOf(events).collect()
    assert(r.nonEmpty)
    // only days with a full 7-day baseline appear: 21 − 7 per series
    assert(r.length == 2 * (21 - 7), s"got ${r.length} rows")
    r.foreach { x =>
      assert(x.getDouble(4) == 0.0, s"adjusted nonzero: $x")
      assert(x.getDouble(5) == 0.0, s"trend nonzero: $x")
      assert(x.getDouble(6) == 0.0, s"residual nonzero: $x")
    }
    val c = r.filter(_.getString(0) == "c")
    assert(c.forall(_.getDouble(3) == 5.0), "constant dow_mean drifted")
  }

  test("forecast: constant and pure-dow series forecast their own pattern exactly") {
    import spark.implicits._
    // same planted corpus as the decompose test: trend is 0 for both
    // series, so the 7-day forecast must be exactly the target day's
    // dow mean — the constant for "c", the weekly pattern for "a"
    val events = (1 to 21).flatMap { d =>
      Seq((ts(d), "a", if (d % 7 == 0) 7.0 else 1.0), (ts(d), "c", 5.0))
    }.toDF("ts", "event_type", "value")
    val grid = TimeSeries.dailyGrid(events)
    val r = TimeSeries.forecastOfGrid(grid).collect()
      .map(x => (x.getString(0), x.getDate(1).toString, x.getLong(2), x.getDouble(3)))
    assert(r.length == 2 * 7, s"got ${r.length} forecast rows")
    // horizons start the day after the last grid day (2024-01-21)
    assert(r.map(_._2).min == "2024-01-22" && r.map(_._2).max == "2024-01-28")
    r.filter(_._1 == "c").foreach { case (_, _, _, f) =>
      assert(f == 5.0, s"constant series forecast $f != 5.0") }
    // "a": days divisible by 7 carry 7.0 — Jan 22..28 includes Jan 28
    r.filter(_._1 == "a").foreach { case (_, d, _, f) =>
      val expected = if (d == "2024-01-28") 7.0 else 1.0
      assert(f == expected, s"dow-pattern forecast $d: $f != $expected")
    }
  }

  test("backtest: self-similar planted series score zero MAE over the 7-day holdout") {
    import spark.implicits._
    // 28 planted days: train = first 21, holdout = last 7.  Both
    // series repeat their weekly pattern exactly, so every forecast
    // must hit its actual and MAE must be exactly 0 for both
    val events = (1 to 28).flatMap { d =>
      Seq((ts(d), "a", if (d % 7 == 0) 7.0 else 1.0), (ts(d), "c", 5.0))
    }.toDF("ts", "event_type", "value")
    val r = TimeSeries.backtestOfGrid(TimeSeries.dailyGrid(events)).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getDouble(2))).toSet
    assert(r == Set(("a", 7L, 0.0), ("c", 7L, 0.0)),
      s"planted backtest should score 7 cells at zero MAE per series: $r")
  }

  test("seasonal anomaly: a planted spike tops the ranking; pure patterns never fire") {
    import spark.implicits._
    // "a" is purely weekly except a huge spike on day 17; "c" is
    // constant.  The weekly pattern itself must produce no signal
    // (its residuals are absorbed by dow_mean), so the spike day
    // dominates the z ranking; "c" has zero residual variance and is
    // excluded by the va > 0 gate
    val events = (1 to 21).flatMap { d =>
      val base = if (d % 7 == 0) 7.0 else 1.0
      val va = if (d == 17) base + 1000.0 else base
      Seq((ts(d), "a", va), (ts(d), "c", 5.0))
    }.toDF("ts", "event_type", "value")
    val r = TimeSeries.anomalySeasonalOfGrid(TimeSeries.dailyGrid(events))
      .collect().map(x => (x.getString(0), x.getDate(1).toString, x.getDouble(4)))
    assert(r.nonEmpty, "no anomaly rows")
    assert(r.forall(_._1 == "a"), s"constant series leaked into ranking: $r")
    assert(r.head._2 == "2024-01-17",
      s"spike day not top-ranked: ${r.head}")
    assert(math.abs(r.head._3) > math.abs(r(1)._3),
      s"spike z not strictly dominant: ${r.take(2).mkString(", ")}")
  }

  test("z-normalization: scaling a series leaves its distances unchanged") {
    import spark.implicits._
    // two series with identical SHAPE at different scales plus a
    // third distinct one: the scaled twin must sit at distance ~0
    val base = Seq(1.0, 5.0, 2.0, 8.0, 3.0, 9.0, 4.0, 6.0, 2.0)
    val events = base.zipWithIndex.flatMap { case (v, i) =>
      Seq((ts(i + 1), "click", v), (ts(i + 1), "twin", 100.0 + 10.0 * v),
        (ts(i + 1), "other", base(base.length - 1 - i)))
    }.toDF("ts", "event_type", "value")
    val r = TimeSeries.tsWindowSearchOf(events, w = 7, k = 100).collect()
    val twinAtStart = r.find(x =>
      x.getString(0) == "twin" && x.getDate(1).toString == "2024-01-01").get
    assert(twinAtStart.getDouble(2) == 0.0,
      s"affine twin at dist ${twinAtStart.getDouble(2)}, want 0")
  }
}
