package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Exact.{sumx, avgx, roundx}
import graft.sources.Tables

/** Governance queries (reference: src/service/governance/).
  * Mapping: orders ⇔ proposals; o_orderpriority ⇔ proposal,
  * o_orderstatus ⇔ vote option / proposal status.
  *
  * Scale notes: straight partial-aggregating groupBys; the shuffle
  * carries only (proposal, option) groups.
  */
object Governance {

  /** Vote tally per (proposal, option)
    * (reference: src/service/governance/getVotes.ts:60 + helper/voteSummary.ts:12). */
  def voteTally(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .groupBy(col("o_orderpriority").as("proposal"),
        col("o_orderstatus").as("option"))
      .agg(count(lit(1)).as("votes"),
        roundx(sumx(col("o_totalprice")), 2).as("voting_power"))

  /** Vote tally PIVOTED to one row per proposal with per-option count
    * columns — the wire shape fcd's tally endpoint actually returns
    * (reference: src/service/governance/helper/voteSummary.ts:12 builds
    * the {Yes, No, Abstain, NoWithVeto} object in JS).  Spark `pivot`
    * with explicit values keeps the plan a single two-phase aggregate —
    * no per-option scans. */
  def votePivot(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .groupBy(col("o_orderpriority").as("proposal"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("proposal"),
        coalesce(col("F"), lit(0L)).as("votes_f"),
        coalesce(col("O"), lit(0L)).as("votes_o"),
        coalesce(col("P"), lit(0L)).as("votes_p"))

  /** A voter's LATEST vote is the one that counts — fcd reverses the
    * vote list and uniqBy(voter) before tallying/paging (reference:
    * src/service/governance/getVotes.ts:61 `uniqBy(reverse(votes),
    * 'voter')`): re-votes supersede, so every per-voter dedup must keep
    * the newest row.  Mapping: voter ⇔ o_custkey, vote time ⇔
    * o_orderdate with o_orderkey as the insertion-order tiebreak.
    *
    * Spark-first: row_number over (proposal, voter) ordered newest
    * first, rn=1 — the window partitions by the high-cardinality voter
    * key, so the dedup is parallel; no driver-side uniqBy loop. */
  private def latestVotes(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"), col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    t.orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
  }

  /** One proposal's unique-voter vote page, newest-first (the
    * getVotes.ts response list).  The proposal filter pushes to the
    * scan BEFORE the window, so the dedup runs over one proposal's
    * votes only; top-k page = TakeOrderedAndProject. */
  def votesLatest(spark: SparkSession, dir: String,
      proposal: String = "1-URGENT", pageSize: Int = 25): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables(spark, dir).orders
      .filter(col("o_orderpriority") === proposal)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey").as("voter"), col("o_orderstatus").as("option"),
        to_date(col("o_orderdate")).as("vote_date"), col("o_orderkey").as("vote_id"))
      .orderBy(col("vote_id").desc)
      .limit(pageSize)
  }

  /** Vote tally with the uniqBy-voter semantics applied: count each
    * voter's latest vote only, per (proposal, option) — what fcd's
    * tally actually reports for re-voting voters. */
  def voteTallyLatest(spark: SparkSession, dir: String): DataFrame =
    latestVotes(Tables(spark, dir))
      .groupBy(col("o_orderpriority").as("proposal"),
        col("o_orderstatus").as("option"))
      .agg(count(lit(1)).as("votes"),
        roundx(sumx(col("o_totalprice")), 2).as("voting_power"))

  /** EVERY proposal's deposit rows, proposal-keyed — the shared body:
    * the deposits page filters one proposal and wraps newest-first
    * top-k, the detail composite aggregates one proposal's rows, the
    * proposals PAGE group-aggregates all of them (and the oracle
    * composes the SAME hoisted SQL, so the registrations cannot
    * drift). */
  private def depositRowsAll(t: Tables): DataFrame =
    t.orders
      .select(col("o_orderpriority").as("proposal"),
        col("o_orderkey"), col("o_custkey"),
        to_date(col("o_orderdate")).as("date"),
        roundx(col("o_totalprice"), 2).as("deposit"))

  private def depositRows(t: Tables, proposal: String): DataFrame =
    depositRowsAll(t)
      .filter(col("proposal") === proposal)
      .select(col("o_orderkey"), col("o_custkey"), col("date"), col("deposit"))

  /** The per-proposal vote summary over a (proposal, option, votes,
    * voting_power) tally frame — the ONE aggregate the detail
    * composite and the proposals page both fold through (a rounding
    * drift must break both registrations or neither). */
  private def voteSummaryOf(tally: DataFrame): DataFrame =
    tally.groupBy(col("proposal"))
      .agg(
        coalesce(sum(when(col("option") === "F", col("votes"))), lit(0L))
          .cast("long").as("votes_f"),
        coalesce(sum(when(col("option") === "O", col("votes"))), lit(0L))
          .cast("long").as("votes_o"),
        coalesce(sum(when(col("option") === "P", col("votes"))), lit(0L))
          .cast("long").as("votes_p"),
        roundx(sumx(col("voting_power")), 2).as("voting_power"))

  /** Deposits of one proposal, recent-first
    * (reference: src/service/governance/getDeposits.ts:14 — deposit
    * list for a proposal id, paginated newest-first). */
  def proposalDeposits(spark: SparkSession, dir: String): DataFrame =
    depositRows(Tables(spark, dir), "1-URGENT")
      .orderBy(col("o_orderkey").desc)
      .limit(20)

  /** `q_proposal_detail`: the `/proposals/:proposalId` composite — the
    * one reference route whose ingredients were all registered but
    * never COMPOSED (reference: src/service/governance/getProposals.ts
    * getProposal + helper/voteSummary.ts:12 build exactly this
    * payload: the proposal's own row, the per-option vote summary
    * under uniqBy-voter latest-vote semantics, and the deposit
    * rollup).  Composition is the q_general_info pattern
    * (Dashboard.generalInfo): each leg collapses to a single row, the
    * final join is a broadcast 1-row cross join — no shuffle joins
    * anywhere above the leg aggregates.
    *
    * Exactness: vote counts are integers; voting_power sums the
    * per-option 2-dp-rounded powers through DECIMAL (both engines add
    * the identical doubles); the deposit rollup sums the 2-dp-rounded
    * deposit column the page query emits — the oracle composes the
    * hoisted vote-tally and deposit-rows SQL bodies VERBATIM, so a
    * drift in either leg breaks both registrations at once. */
  def proposalDetail(spark: SparkSession, dir: String,
      proposal: String = "1-URGENT"): DataFrame = {
    val t = Tables(spark, dir)
    val votes = voteSummaryOf(voteTallyLatest(spark, dir)
      .filter(col("proposal") === proposal))
    val dep = depositRows(t, proposal)
      .agg(count(lit(1)).as("n_deposits"),
        roundx(sumx(col("deposit")), 2).as("total_deposit"),
        min(col("date")).as("first_deposit_date"),
        max(col("date")).as("last_deposit_date"))
    votes.crossJoin(broadcast(dep))
  }

  /** `q_proposals_page`: the proposals LIST page as ONE PLAN — the
    * reference's classic N+1 made structural (reference:
    * src/service/governance/getProposals.ts:25 maps getProposal over
    * every proposal id, re-running the vote and deposit queries per
    * row).  Here every leg is GROUP-KEYED by proposal: the
    * uniqBy-voter latest-vote tally folds through the SAME
    * voteSummaryOf aggregate the detail composite uses (unfiltered),
    * the deposit rollup group-aggregates depositRowsAll, and the two
    * ~K-row leg results join on proposal — no per-id loop, no
    * broadcast-1-row panels, newest-first by last deposit activity
    * with the proposal key as tiebreak.  Adding a proposal to the
    * corpus changes the ROW COUNT, never the plan.  ORACLED by
    * composing the hoisted tally and deposit-rows bodies VERBATIM
    * (the q_proposal_detail discipline, minus its point filter). */
  def proposalsPage(spark: SparkSession, dir: String,
      pageSize: Int = 20): DataFrame = {
    val t = Tables(spark, dir)
    val votes = voteSummaryOf(voteTallyLatest(spark, dir))
    val dep = depositRowsAll(t)
      .groupBy(col("proposal"))
      .agg(count(lit(1)).as("n_deposits"),
        roundx(sumx(col("deposit")), 2).as("total_deposit"),
        min(col("date")).as("first_deposit_date"),
        max(col("date")).as("last_deposit_date"))
    votes.join(dep, Seq("proposal"))
      .orderBy(col("last_deposit_date").desc, col("proposal"))
      .limit(pageSize)
  }

  /** Proposal summary per status: counts, sums, date range
    * (reference: src/service/governance/getProposals.ts:15). */
  def proposalsSummary(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n_proposals"),
        roundx(sumx(col("o_totalprice")), 2).as("total_deposit"),
        roundx(avgx(col("o_totalprice")), 4).as("avg_deposit"),
        min(to_date(col("o_orderdate"))).as("first_date"),
        max(to_date(col("o_orderdate"))).as("last_date"))
}
