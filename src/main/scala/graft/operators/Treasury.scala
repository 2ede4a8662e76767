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

  /** Daily tax proceeds
    * (reference: src/service/treasury/tax.ts:8 getTaxProceeds — fcd sums
    * the per-block tax rewards; here sum(extendedprice×tax) per day). */
  def taxProceeds(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .groupBy(to_date(col("l_shipdate")).as("date"))
      .agg(roundx(sumx(col("l_extendedprice") * col("l_tax")), 4).as("tax_proceeds"),
        count(lit(1)).as("n_items"))
}
