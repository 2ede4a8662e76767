package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable as-of join: each fact row gets the LATEST tick row at or
  * before its timestamp (fcd joins rewards/swaps to the price effective
  * at that moment — reference: src/collector/dashboard/blockReward.ts:19,
  * src/service/dashboard/rewardsInfo.ts — the same shape recurs across
  * services, so it is a library operator, not a per-query plan).
  *
  * Spark-first strategy (no built-in as-of join in Spark SQL):
  * turn the tick stream into half-open validity intervals
  * [tick_ts, next_tick_ts), explode each interval into the fixed-width
  * buckets it overlaps, and EQUI-join facts on bucket — the range check
  * then runs only against the handful of intervals in the fact's own
  * bucket.  A raw range-predicate join would be a nested-loop
  * (O(facts × ticks)); a global `last(...) over (order by ts)` window
  * would single-partition-sort the fact stream.  Both are wrong at
  * 100 TB; this is neither.
  *
  * Scale shape:
  *  - `lead()` runs inside per-DAY window partitions (parallel across
  *    days); each day's last interval is stitched closed with the next
  *    tick-day's first tick.  Only the day-level first-tick series
  *    (1 row/day, calendar-bounded) uses a deliberate single-partition
  *    window (constant pmod key).
  *  - the interval-bucket table grows with tick history, so it is
  *    broadcast only under the session threshold
  *    (PlanHints.broadcastIfSmall); above it the join shuffles on
  *    bucket and AQE re-plans/splits skew at runtime.
  *
  * Contract: `factTs`/`tickTs` are epoch-µs longs; `tickTie` breaks
  * same-µs tick order (later tie wins, matching `ORDER BY ts, tie` —
  * earlier ties get empty intervals and drop out).  Output = all fact
  * columns + all tick columns (left join; tick columns null when no
  * tick precedes the fact).  Tick column names must not collide with
  * fact column names — rename before calling.
  */
object AsOf {

  private val DayUs = 86400000000L

  def joinLatest(
      facts: DataFrame, factTs: String,
      ticks: DataFrame, tickTs: String, tickTie: String,
      bucketUs: Long = 3600000000L): DataFrame = {
    // end-cap: one row; the last interval must cover every later fact
    val endCap = facts.agg((max(col(factTs)) + 1).as("__cap_us"))
    val t = ticks.withColumn("__day", (col(tickTs) / DayUs).cast("long"))
    // lead within day partitions; __day is a prefix of the (ts, tie)
    // order, so in-day leads equal the global-order leads
    val wDay = Window.partitionBy(col("__day")).orderBy(col(tickTs), col(tickTie))
    val inDay = t.withColumn("__lead", lead(col(tickTs), 1).over(wDay))
    // one row per tick-day; lead over the day series closes each day's
    // last interval with the NEXT tick-day's first tick (gap-safe).
    // Deliberate single-partition window over the calendar-bounded
    // series — the constant pmod key marks intent.
    val nextDayFirst = t
      .groupBy(col("__day")).agg(min(col(tickTs)).as("__day_first"))
      .withColumn("__next_day_first",
        lead(col("__day_first"), 1)
          .over(Window.partitionBy(pmod(col("__day"), lit(1L))).orderBy(col("__day"))))
      .select(col("__day"), col("__next_day_first"))
    val intervals = inDay
      .join(broadcast(nextDayFirst), Seq("__day"))
      .crossJoin(broadcast(endCap))
      .withColumn("__next", coalesce(col("__lead"), col("__next_day_first")))
      .withColumn("__end", coalesce(col("__next"), col("__cap_us")))
    val buckets = intervals
      .filter(col("__end") > col(tickTs)) // drop empty intervals (same-ts ticks)
      .withColumn("__bucket", explode(sequence(
        (col(tickTs) / bucketUs).cast("long"),
        ((col("__end") - 1) / bucketUs).cast("long"))))
      .drop("__day", "__lead", "__next_day_first", "__day_first", "__cap_us", "__end")
    facts
      .join(PlanHints.broadcastIfSmall(buckets),
        (col(factTs) / bucketUs).cast("long") === col("__bucket") &&
          col(factTs) >= col(tickTs) &&
          (col("__next").isNull || col(factTs) < col("__next")),
        "left")
      .drop("__bucket", "__next")
  }
}
