package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.functions.Exact.{roundx, sumx}
import graft.functions.TextFunctions.words
import graft.sources.Tables

/** Bigram language-model scoring with stupid backoff — the context-
  * aware upgrade of `t_perplexity`'s unigram CCNet triage (same
  * base-split training convention, same nll output contract).
  *
  * Model (Brants et al. 2007, "Large Language Models in Machine
  * Translation" — the web-scale recipe precisely BECAUSE it avoids
  * discount estimation):
  *   S(w_i | w_{i-1}) = c2(w_{i-1}, w_i) / c1(w_{i-1})   if c2 > 0
  *                    = α · (c1(w_i)+1) / (n_base + V)    otherwise
  * with α = 0.4, and the document's FIRST token scored by the
  * Laplace unigram (no left context).  Scores are unnormalized
  * (stupid backoff's defining trade); −ln S still ranks fluency, and
  * a doc's mean −ln S is the emitted `nll` — monotone in the
  * model's perplexity, `exp`-free for the oracle hash (the
  * t_perplexity argument verbatim).
  *
  * Spark shape: tokens with POSITION (posexplode) → the previous-token
  * frame is the same table shifted one slot, joined on
  * (doc_id, pos−1) — an equi-join that reuses the token shuffle, NOT a
  * window (a lag() window would sort every doc's tokens; the join
  * partial-aggregates away).  c2 is vocabulary²-bounded in principle
  * but Zipf-bounded in practice (distinct OBSERVED bigrams ≪ tokens);
  * both count tables join back on term keys.  n_base and V are two
  * driver scalars (one agg head(), the t_perplexity pattern).
  *
  * Engine-exactness: all count quotients are integer/integer — one
  * correctly-rounded double op each; α·x is one more; ln's ≤1-ulp
  * license is washed by the 9-dp round + DECIMAL sum; the per-doc
  * mean divides a DECIMAL-exact sum by an integer then rounds to
  * 6 dp.  The c2-exists branch condition is integer NULL-ness —
  * no float boundary anywhere.
  *
  * 100 TB: three term-keyed shuffles (tokens→bigrams, c1, c2) plus
  * one doc-keyed partial agg; the LM side tables are
  * vocabulary-bounded and join under AQE (broadcast at test SF,
  * sort-merge on the already-shuffled term key at scale) — the
  * LmWarehouse at-rest layout applies verbatim when the model is
  * trained once and probed by many batches.
  */
object BigramLm {

  private val Alpha = 0.4

  /** `t_perplexity_bigram`: per-doc mean −ln S under the base-split
    * bigram LM.  Columns (doc_id, n_tokens, bigram_hits, nll). */
  def perplexityBigram(spark: SparkSession, dir: String): DataFrame =
    perplexityBigramOf(Tables(spark, dir).documents)

  private[graft] def perplexityBigramOf(docs: DataFrame): DataFrame = {
    // tokenize ONCE into (doc_id, pos, w, pw) — the PREVIOUS token
    // rides each row from the start (optimization r15, guide §2.4):
    // pw = element_at(toks, pos) over the materialized token array
    // (1-based element_at at 0-based pos IS the previous token; pos 0
    // → null), so BOTH (doc_id, pos)-keyed corpus self-joins the old
    // shape paid — one building the bigram counts, one re-attaching
    // pw at scoring — are gone outright.  The array frame is pinned
    // first (the minhashBandCandidates lesson: an expression carried
    // alongside posexplode re-evaluates per generated row), then the
    // exploded frame is pinned for its five consumers.  Rows and
    // values are identical to the join form — same bigram pairs, same
    // nulls at pos 0.
    val arr = docs
      .select(col("doc_id"), words(col("text")).as("toks")).localCheckpoint()
    val toks = arr
      .select(col("doc_id"), col("toks"), posexplode(col("toks")).as(Seq("pos", "w")))
      .select(col("doc_id"), col("pos"), col("w"),
        when(col("pos") > 0, element_at(col("toks"), col("pos"))).as("pw"))
      .localCheckpoint()
    val isBase: Column = pmod(col("doc_id"), lit(10L)) < 8
    val base = toks.filter(isBase)

    val c1 = base.groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val c2 = base.filter(col("pw").isNotNull)
      .groupBy(col("pw"), col("w"))
      .agg(count(lit(1)).as("c2"))

    // the denominator rides the plan as a broadcast 1-row relation
    // instead of an eager head() per run (optimization r15) —
    // value-identical arithmetic
    val stats = broadcast(toks.agg(
      (sum(when(isBase, 1L).otherwise(0L)) +
        count_distinct(col("w"))).cast("double").as("__denom")))

    val scored = toks
      .join(c1.select(col("w"), col("c1").as("cw")), Seq("w"), "left")
      .join(c1.select(col("w").as("pw"), col("c1").as("cpw")), Seq("pw"), "left")
      .join(c2, Seq("pw", "w"), "left")
      .crossJoin(stats)
    val laplace = (coalesce(col("cw"), lit(0L)) + lit(1.0)) / col("__denom")
    val nllTok = roundx(-log(
      when(col("pw").isNull, laplace)                       // first token
        .when(col("c2").isNotNull,
          col("c2").cast("double") / col("cpw").cast("double"))
        .otherwise(lit(Alpha) * laplace)), 9)               // backoff
    scored
      .groupBy(col("doc_id"))
      .agg(sumx(nllTok).as("nll_sum"), count(lit(1)).as("n_tokens"),
        sum(when(col("c2").isNotNull, 1L).otherwise(0L)).as("bigram_hits"))
      .select(col("doc_id"), col("n_tokens"), col("bigram_hits"),
        roundx(col("nll_sum") / col("n_tokens"), 6).as("nll"))
  }
}
