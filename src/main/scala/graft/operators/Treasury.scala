package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Exact.{sumx, avgx, roundx}
import graft.sources.Tables

/** Treasury / supply queries (reference: src/service/treasury/).
  *
  * Scale notes: all shapes collapse facts with partial aggregation
  * before anything else; scalars (circulating supply) are single-row
  * aggregates, never collect()ed mid-plan.
  */
object Treasury {

  /** Circulating supply = issued − burned/locked
    * (reference: src/service/treasury/circulatingSupply.ts:12 — total
    * supply minus unvested/locked balances). */
  def circulatingSupply(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .agg(
        roundx(sumx(when(col("event_type") === "signup", col("value")).otherwise(0.0)), 4)
          .as("issued"),
        roundx(sumx(when(col("event_type") === "error", col("value")).otherwise(0.0)), 4)
          .as("locked"),
        roundx(
          sumx(when(col("event_type") === "signup", col("value")).otherwise(0.0)) -
            sumx(when(col("event_type") === "error", col("value")).otherwise(0.0)), 4)
          .as("circulating"))

  /** Schedule-based vesting supply (reference: src/collector/
    * unvested.ts:27 + circulatingSupply.ts — fcd walks each vesting
    * account's schedule and counts only tranches whose release time has
    * passed; the two-conditional-sum approximation in
    * `circulatingSupply` above loses that time dependence).
    *
    * Spark-first: EXPLODE each issuance into its vesting-schedule
    * tranches (4 equal tranches, one per week after issue), join the
    * as-of instant (max event ts — a broadcast single-row aggregate),
    * and sum the tranches already released.  The schedule derivation is
    * a narrow per-row transform; the only shuffle is the final
    * single-group aggregate, so the shape survives any corpus size. */
  def vestingSupply(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val WeekMs = 604800000L
    val Tranches = 4
    val tsMs = unix_millis(col("ts").cast("timestamp"))
    val asof = t.events.agg(max(tsMs).as("asof_ms"))
    val issued = t.events.filter(col("event_type") === "signup")
      .select(tsMs.as("ts_ms"), col("value"))
    issued
      .withColumn("tranche", explode(sequence(lit(1), lit(Tranches))))
      .withColumn("unlock_ms", col("ts_ms") + col("tranche") * WeekMs)
      .crossJoin(broadcast(asof))
      .agg(
        roundx(sumx(col("value") / Tranches), 4).as("issued"),
        roundx(sumx(when(col("unlock_ms") > col("asof_ms"), col("value") / Tranches)
          .otherwise(0.0)), 4).as("unvested"),
        roundx(sumx(when(col("unlock_ms") <= col("asof_ms"), col("value") / Tranches)
          .otherwise(0.0)), 4).as("circulating"))
  }

  /** Daily tax proceeds
    * (reference: src/service/treasury/tax.ts:8 getTaxProceeds — fcd sums
    * the per-block tax rewards; here sum(extendedprice×tax) per day). */
  def taxProceeds(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .groupBy(to_date(col("l_shipdate")).as("date"))
      .agg(roundx(sumx(col("l_extendedprice") * col("l_tax")), 4).as("tax_proceeds"),
        count(lit(1)).as("n_items"))

  /** Trailing-30-DAY tax proceeds per flag — a RANGE window frame over
    * the calendar, not a ROWS frame over rows: ship dates have gaps, so
    * "last 30 days" ≠ "last 30 rows" (fcd's period reports are
    * calendar-denominated the same way, reference:
    * src/service/treasury/tax.ts date-range params).  The frame key is
    * the integer epoch-day; the window sums the DECIMAL daily rollup
    * (order-independent), partitioned by flag over per-day rows —
    * calendar-bounded per partition at any corpus size. */
  def trailingTaxProceeds(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables(spark, dir).lineitem
      .groupBy(to_date(col("l_shipdate")).as("date"), col("l_returnflag").as("flag"))
      .agg(sum((col("l_extendedprice") * col("l_tax")).cast("decimal(30,6)")).as("vol"))
      .withColumn("day_n", datediff(col("date"), lit("1970-01-01").cast("date")))
    val w = Window.partitionBy(col("flag")).orderBy(col("day_n")).rangeBetween(-29, 0)
    daily.select(col("date"), col("flag"),
      roundx(sum(col("vol")).over(w).cast("double"), 4).as("trailing_30d"))
  }
}
