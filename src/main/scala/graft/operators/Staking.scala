package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Exact.{sumx, avgx, roundx}
import graft.sources.Tables

/** Staking / validator / treasury queries
  * (reference: src/service/staking/, src/collector/staking/,
  * src/collector/richlist.ts, src/service/treasury/).
  *
  * Mapping (SURVEY §3): supplier ⇔ validator, customer ⇔ delegator/
  * account, lineitem ⇔ reward+delegation ledger, nation ⇔ denom.
  *
  * Scale notes: every fact-side aggregation collapses lineitem to the
  * (suppkey[,date]) grain before any window runs; `sum() over ()` for
  * the voting-power share runs over the collapsed per-validator rollup
  * (bounded by validator count, thousands at most), never over facts.
  * Top-k-per-group uses rank over a partitioned window on the collapsed
  * grain.  fcd's per-validator N+1 loops become one shuffled agg.
  */
object Staking {

  /** Validators ranked by revenue with voting-power share
    * (reference: src/service/staking/getValidators.ts:13 — votingPower
    * weight = share of total, computed in JS; here `sum over ()`). */
  def validatorsByPower(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val rev = t.lineitem
      .groupBy(col("l_suppkey"))
      .agg(sumx(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    // single partition on purpose: rev is one row per validator —
    // bounded by the validator set, not the ledger; pmod constant key
    // marks intent + quiets the WindowExec warning
    val all = Window.partitionBy(pmod(col("l_suppkey"), lit(1L)))
    val byRev = Window.partitionBy(pmod(col("l_suppkey"), lit(1L)))
      .orderBy(col("revenue").desc, col("l_suppkey"))
    rev.join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .withColumn("total_rev", sum(col("revenue").cast("decimal(30,6)")).over(all).cast("double"))
      .select(col("s_suppkey"), col("s_name"),
        roundx(col("revenue"), 2).as("revenue"),
        roundx(col("revenue") / col("total_rev"), 8).as("voting_power_weight"),
        rank().over(byRev).cast("long").as("power_rank"))
  }

  /** Composite per-account staking view: ONE account's delegations,
    * undelegations and rewards per validator, assembled in a single
    * multi-aggregation plan (reference: src/service/staking/
    * getStaking.ts:105 — fcd fires separate delegation/undelegation/
    * reward queries per account and stitches them in JS; here one
    * filtered scan + one conditional-sum groupBy produces all sections,
    * so the fact table is read once).
    *
    * Mapping: delegation ledger = lineitem⋈orders rows of the account;
    * l_returnflag = 'R' marks an undelegation (returned), anything else
    * an active delegation; rewards = price×discount accrued per
    * validator.  The account filter reaches the orders scan
    * (PushedFilters), so at 100 TB this is a pruned read, not a scan. */
  def accountStaking(spark: SparkSession, dir: String, account: Long = 7L): DataFrame = {
    val t = Tables(spark, dir)
    val mine = t.orders.filter(col("o_custkey") === account)
      .select(col("o_orderkey"), col("o_custkey"))
    t.lineitem
      .join(broadcast(mine), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("account"), col("l_suppkey"))
      .agg(
        roundx(sumx(when(col("l_returnflag") =!= "R",
          col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(0.0)), 2)
          .as("delegated"),
        roundx(sumx(when(col("l_returnflag") === "R",
          col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(0.0)), 2)
          .as("undelegated"),
        roundx(sumx(col("l_extendedprice") * col("l_discount")), 4).as("rewards"),
        count(lit(1)).as("n_entries"))
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .select(col("account"), col("l_suppkey"), col("s_name"),
        col("delegated"), col("undelegated"), col("rewards"), col("n_entries"))
  }

  /** Per-validator daily return: (reward+commission)/avg voting power
    * (reference: src/collector/staking/collectValidatorReturn.ts:31). */
  def validatorReturn(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .groupBy(col("l_suppkey"), to_date(col("l_shipdate")).as("date"))
      .agg(
        sumx(col("l_extendedprice") * col("l_discount")).as("reward"),
        avgx(col("l_extendedprice")).as("avg_power"))
      .select(col("l_suppkey"), col("date"),
        roundx(col("reward"), 4).as("reward"),
        roundx(col("avg_power"), 4).as("avg_power"),
        roundx(col("reward") / col("avg_power"), 8).as("daily_return"))

  /** Delegation tx page: filter by msg type, recent-first
    * (reference: src/service/staking/getDelegationTxs.ts:26). */
  def delegationsPage(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .filter(col("event_type").isin("signup", "purchase"))
      .orderBy(col("event_id").desc)
      .limit(25)
      .select(col("event_id"),
        unix_millis(col("ts").cast("timestamp")).as("ts_ms"),
        col("user_id"), col("event_type"), roundx(col("value"), 4).as("amount"))

  /** Top-5 delegators per validator by delegated revenue
    * (reference: src/service/staking/getDelegators.ts:18). */
  def delegatorsTop(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val perPair = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_suppkey"), col("o_custkey"))
      .agg(sumx(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("delegated"))
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("delegated").desc, col("o_custkey"))
    perPair
      .withColumn("delegator_rank", row_number().over(w))
      .filter(col("delegator_rank") <= 5)
      .select(col("l_suppkey"), col("o_custkey"),
        roundx(col("delegated"), 2).as("delegated"),
        col("delegator_rank").cast("long").as("delegator_rank"))
  }

  /** Richlist: top accounts by balance with share of total supply
    * (reference: src/collector/richlist.ts:20 — fcd divides by total in
    * JS; here a window over the top-k only plus a broadcast total). */
  def richlist(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val total = t.customer.agg(sumx(col("c_acctbal")).as("total_bal"))
    t.customer
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
      .limit(20)
      .crossJoin(broadcast(total))
      .select(col("c_custkey"), col("c_name"),
        roundx(col("c_acctbal"), 2).as("balance"),
        roundx(col("c_acctbal") / col("total_bal"), 8).as("share"))
  }

  /** Per-denom richlist — the `/richlist/:denom` route (reference:
    * src/service/treasury/richList.ts:19 — find({where: {denom}},
    * order amount DESC, paged).  The denom resolves to its nationkey
    * through the K-row nation dim FIRST (driver-side metadata lookup,
    * like any partition-pruning predicate build — nation is 25 rows,
    * not data), so the big customer scan gets a pushed-down EQUALITY
    * filter on c_nationkey: at 100 TB with balances partitioned by
    * denom that is partition pruning, not a post-scan filter.  Share
    * denominator is the DENOM's total, per the per-denom response. */
  def richlistByDenom(spark: SparkSession, dir: String,
      denom: String = "NATION_7", pageSize: Int = 20): DataFrame = {
    val t = Tables(spark, dir)
    val nationKeys = t.nation.filter(col("n_name") === denom)
      .select(col("n_nationkey")).collect().map(_.get(0))
    require(nationKeys.length == 1, s"unknown denom: $denom")
    val members = t.customer.filter(col("c_nationkey") === nationKeys.head)
    val total = members.agg(sumx(col("c_acctbal")).as("total_bal"))
    members
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
      .limit(pageSize)
      .crossJoin(broadcast(total))
      .select(col("c_custkey"), col("c_name"), lit(denom).as("denom"),
        roundx(col("c_acctbal"), 2).as("balance"),
        roundx(col("c_acctbal") / col("total_bal"), 8).as("share"))
  }

  /** `q_richlist_gini`: per-denom wealth concentration — the Gini
    * coefficient over member balances, the summary statistic the
    * richlist family reports next to its top-k (concentration
    * monitoring: a rising Gini is the alert, the richlist is the
    * drill-down).  G = (2·Σᵢ i·xᵢ − (n+1)·Σx)/(n·Σx) over ascending
    * balances.
    *
    * Exactness: balances quantize to integer cents (floor(x·100+0.5)
    * — the s_embed_cov fixed-point discipline), every sum rides
    * DECIMAL(38,0), ONE double division + 6-dp roundx at the end; an
    * all-zero denom yields NULL.  Rank ties are a non-issue by
    * construction: equal values contribute q·Σ(ranks of the block)
    * regardless of intra-block order.
    *
    * Scale: the naive form ranks every account inside ~25 denom
    * partitions — a skewed giant window.  This plan instead
    * aggregates to the (denom, cents) VALUE HISTOGRAM first (one
    * uniform shuffle; the StatsWarehouse trick), then computes the
    * rank-block identity Σᵢ i·xᵢ = Σ_v q_v·(c_v·cum_{<v} +
    * c_v(c_v+1)/2) over histogram rows — metadata-scale after the
    * first aggregation at ANY account count.  The ORACLE is the
    * naive row_number formula; the two are equal integers by the
    * tie-block identity (spec also pins a shuffled-input invariance
    * and textbook planted values). */
  def richlistGini(spark: SparkSession, dir: String): DataFrame =
    giniOf(Tables(spark, dir).customer
      .join(broadcast(Tables(spark, dir).nation),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("denom"), col("c_acctbal").as("bal")))

  /** Same, over an arbitrary (denom, bal) frame — the spec entry
    * point. */
  private[graft] def giniOf(balances: DataFrame): DataFrame =
    giniOfHist(balances
      .select(col("denom"), floor(col("bal") * 100 + 0.5).cast("long").as("q"))
      .groupBy(col("denom"), col("q")).agg(count(lit(1)).as("c")))

  /** The Gini tail over an already-built (denom, q, c) value
    * histogram — shared by the inline query and BalanceWarehouse's
    * histogram-served probe (the TsWarehouse corrOfGrid pattern:
    * identical tail ⇒ the probe holds the inline oracle verbatim). */
  private[graft] def giniOfHist(hist: DataFrame): DataFrame = {
    val byVal = Window.partitionBy(col("denom")).orderBy(col("q"))
    val cum = hist
      .withColumn("cum_before", sum(col("c")).over(byVal) - col("c"))
      // all-LONG rank-block sum: c(c+1) is even, so DIV 2 is exact —
      // a Column `/` here would detour through double
      .withColumn("rank_sum",
        expr("c * cum_before + (c * (c + 1)) DIV 2"))
    val g = cum.groupBy(col("denom")).agg(
      sum(col("c")).as("n_accounts"),
      sum((col("q") * col("c")).cast("decimal(38,0)")).as("sq"),
      sum((col("q") * col("rank_sum")).cast("decimal(38,0)")).as("siq"))
    g.select(col("denom"), col("n_accounts"),
      col("sq").cast("long").as("total_bal_x100"),
      when(col("sq") =!= 0,
        roundx((lit(2) * col("siq") - (col("n_accounts") + 1) * col("sq")).cast("double") /
          (col("n_accounts") * col("sq")).cast("double"), 6)).as("gini"))
  }

  /** Total supply per denom (nation)
    * (reference: src/service/treasury/getTotalSupply.ts:8). */
  def totalSupply(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer.join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("denom"))
      .agg(roundx(sumx(col("c_acctbal")), 2).as("total_supply"),
        count(lit(1)).as("n_accounts"))
  }

  /** Claims page for one validator: recent-first rewards ledger
    * (reference: src/service/staking/getClaims.ts:13 — claims by
    * operator, keyset-paginated).  Pushed-down equality + top-k. */
  def claimsPage(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .filter(col("l_suppkey") === 3)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        to_date(col("l_shipdate")).as("date"),
        roundx(col("l_extendedprice") * col("l_discount"), 4).as("claim_amount"))
      .orderBy(col("l_orderkey").desc, col("l_linenumber").desc)
      .limit(15)

  /** Validator detail: one supplier with its denom and lifetime revenue
    * (reference: src/service/staking/getValidatorDetail.ts:21). */
  def validatorDetail(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val rev = t.lineitem.filter(col("l_suppkey") === 3)
      .groupBy(col("l_suppkey"))
      .agg(roundx(sumx(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_rewards"))
    rev.join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name").as("denom"),
        roundx(col("s_acctbal"), 2).as("self_delegation"), col("revenue"), col("n_rewards"))
  }

  /** Single-account balance lookup
    * (reference: src/service/bank/getBalance.ts:29). */
  def balanceLookup(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer.filter(col("c_custkey") === 42)
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"),
        roundx(col("c_acctbal"), 2).as("balance"), col("n_name").as("denom"))
  }
}
