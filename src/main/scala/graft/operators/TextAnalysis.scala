package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.Exact.roundx
import graft.sources.Tables

/** Text-analysis operators over `documents` — language ID, quality
  * scoring, token counting, fingerprinting.  All single-pass, per-row
  * column math (HOFs, no UDF, no shuffle at all): at 100 TB these run
  * scan-speed and whole-stage-codegen'd.
  */
object TextAnalysis {

  /** Predicted language as a column — the argmax-with-precedence rule
    * shared by `langId` and the corpus funnel. */
  def predLangCol(text: Column): Column = {
    val en = stopwordHits(text, StopEn)
    val es = stopwordHits(text, StopEs)
    val de = stopwordHits(text, StopDe)
    val fr = stopwordHits(text, StopFr)
    when(en >= es && en >= de && en >= fr && en > 0, "en")
      .when(es >= de && es >= fr && es > 0, "es")
      .when(de >= fr && de > 0, "de")
      .when(fr > 0, "fr")
      .otherwise("unknown")
  }

  /** Quality score as a column (already roundx'd to 4 — threshold
    * comparisons against it are engine-stable), shared by `quality`
    * and the corpus funnel. */
  def qualityScoreCol(text: Column): Column = {
    val nWords = size(words(text)).cast("double")
    val stopRatio = stopwordHits(text, StopEn).cast("double") / nWords
    roundx(least(nWords / 100.0, lit(1.0)) * (lit(0.5) + lit(0.5) * stopRatio), 4)
  }

  /** Stopword-hit language ID: count hits per language list, argmax
    * with a fixed precedence (en > es > de > fr > unknown). */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val en = stopwordHits(col("text"), StopEn)
    val es = stopwordHits(col("text"), StopEs)
    val de = stopwordHits(col("text"), StopDe)
    val fr = stopwordHits(col("text"), StopFr)
    t.documents.select(
      col("doc_id"),
      en.cast("long").as("en_hits"), es.cast("long").as("es_hits"),
      de.cast("long").as("de_hits"), fr.cast("long").as("fr_hits"),
      predLangCol(col("text")).as("pred_lang"))
  }

  /** Quality score from length / punctuation / stopword signals —
    * deterministic arithmetic mirror of fcd-era heuristic filters. */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val nWords = size(words(col("text"))).cast("double")
    val nChars = length(col("text")).cast("double")
    val nPunct = regexTokenCount(col("text")) - size(regexp_extract_all(col("text"), lit("[a-zA-Z]+|[0-9]+"), lit(0)))
    val stopRatio = stopwordHits(col("text"), StopEn).cast("double") / nWords
    t.documents.select(
      col("doc_id"),
      nWords.cast("long").as("n_words"),
      roundx(nChars / nWords, 4).as("avg_word_len"),
      nPunct.cast("long").as("n_punct"),
      roundx(stopRatio, 4).as("stopword_ratio"),
      qualityScoreCol(col("text")).as("quality_score"))
  }

  /** Token counts: whitespace tokens and BPE-ish regex tokens. */
  def tokens(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents.select(
      col("doc_id"),
      size(words(col("text"))).cast("long").as("ws_tokens"),
      regexTokenCount(col("text")).cast("long").as("re_tokens"),
      length(col("text")).cast("long").as("n_chars_computed"))
  }

  /** Registered `t_fertility`: TOKENIZER FERTILITY by language —
    * regex-tokenizer tokens per whitespace word, the standard measure
    * of how expensively a tokenizer encodes each language (fertility
    * ~1 = near word-level; high fertility = the language pays more
    * sequence positions per word, which skews both training cost and
    * effective context length — the metric multilingual-corpus teams
    * track per release).  Pure single-pass column math + one tiny
    * (lang)-keyed aggregate; the ratio is integer ppm (LONG DIV), so
    * the report is hash-exact — ORACLED.  On single-spaced text every
    * whitespace word holds ≥ 1 token character, so regex tokens ≥
    * whitespace words and fertility_ppm ≥ 1,000,000 — a property of
    * the corpus contract, not of arbitrary text (consecutive spaces
    * would produce empty "words"; review r12b).  The synthetic corpus
    * is punctuation-free, so it reads exactly 1.0 per language — the
    * registered value exercises the mechanism and the oracle; the
    * separation shows on real multilingual text. */
  def fertility(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("lang"),
        size(words(col("text"))).cast("long").as("ws"),
        regexTokenCount(col("text")).cast("long").as("re"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws")).as("ws_tokens"), sum(col("re")).as("re_tokens"))
      .select(col("lang"), col("n_docs"), col("ws_tokens"), col("re_tokens"),
        // the ppm multiply runs on DECIMAL(38,0), not LONG: past ~9.2e12
        // tokens per language a LONG re_tokens * 1e6 would wrap silently
        // (non-ANSI) while the DuckDB oracle promotes to HUGEINT — the
        // d_corpus_stats wide-type discipline (ADVICE r12); DIV still
        // returns LONG, so the served schema is unchanged
        expr("CAST(re_tokens AS DECIMAL(38,0)) * 1000000 DIV ws_tokens")
          .as("fertility_ppm"))

  /** Gopher-style quality rule flags (Rae et al. 2021 §A1.1: the
    * repetition-free heuristic gate MassiveText applies before any
    * model-based scoring).  Six measures, each with its published-
    * style threshold, plus the conjunction — all single-pass HOF
    * column math over one scan, codegen'd, no shuffle: at 100 TB this
    * is the cheapest filter in the funnel and runs at scan speed.
    * Ratios are roundx'd to 4 BEFORE thresholding so flag values are
    * engine-stable (the qualityScoreCol convention). */
  def gopherRules(spark: SparkSession, dir: String): DataFrame =
    gopherRulesOf(Tables(spark, dir).documents)

  /** Same, over an arbitrary (doc_id, text) frame — the spec entry
    * point. */
  def gopherRulesOf(documents: DataFrame): DataFrame = {
    val ws = words(col("text"))
    val nWords = size(ws).cast("double")
    val meanLen = roundx(
      aggregate(transform(ws, w => length(w).cast("long")), lit(0L),
        (acc, x) => acc + x).cast("double") / nWords, 4)
    val symbolRatio = roundx(
      size(regexp_extract_all(col("text"), lit("#|\\.\\.\\.|…"), lit(0)))
        .cast("double") / nWords, 4)
    val lines = split(col("text"), "\n")
    val bulletFrac = roundx(
      size(filter(lines, l => l.startsWith("- ") || l.startsWith("* ") ||
        l.startsWith("• "))).cast("double") / size(lines), 4)
    val alphaFrac = roundx(
      size(filter(ws, w => w.rlike("[a-zA-Z]"))).cast("double") / nWords, 4)
    val stopHits = stopwordHits(col("text"), StopEn).cast("long")
    val flags = Seq(
      nWords >= 50 && nWords <= 100000,
      meanLen >= 3 && meanLen <= 10,
      symbolRatio <= 0.1,
      bulletFrac <= 0.9,
      alphaFrac >= 0.8,
      stopHits >= 2)
    documents.select(
      col("doc_id"),
      nWords.cast("long").as("n_words"),
      meanLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"),
      bulletFrac.as("bullet_frac"),
      alphaFrac.as("alpha_frac"),
      stopHits.as("stop_hits"),
      flags.reduce(_ && _).cast("long").as("gopher_pass"))
  }

  /** C4-style quality rule flags (Raffel et al. 2020 §2.2: the
    * line-and-page heuristics applied to Common Crawl before any
    * dedup) — the LINE-shaped sibling of the word-shaped
    * `gopherRules`: a line is retained iff it ends in terminal
    * punctuation AND has ≥ 5 words; a page passes iff it has ≥ 3
    * sentences, at least one retained line, no "lorem ipsum", and no
    * curly brace (the code-page signal).  Same execution contract as
    * gopherRules: single-pass HOF column math, codegen'd, zero
    * shuffle — scan-speed at 100 TB; the ratio is roundx'd to 4
    * before any consumer thresholds it.  ORACLED. */
  def c4Rules(spark: SparkSession, dir: String): DataFrame =
    c4RulesOf(Tables(spark, dir).documents)

  /** Same, over an arbitrary (doc_id, text) frame — the spec entry
    * point. */
  def c4RulesOf(documents: DataFrame): DataFrame = {
    val lines = split(col("text"), "\n")
    val kept = filter(lines, l =>
      (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") ||
        l.endsWith("\"")) && size(split(l, " ")) >= 5)
    val nLines = size(lines).cast("long")
    val nKept = size(kept).cast("long")
    val nSent = size(regexp_extract_all(col("text"), lit("[.!?]"), lit(0)))
      .cast("long")
    val hasLorem = lower(col("text")).contains("lorem ipsum").cast("long")
    val hasBrace = col("text").contains("{").cast("long")
    documents.select(
      col("doc_id"),
      nLines.as("n_lines"),
      nKept.as("n_kept"),
      roundx(nKept.cast("double") / nLines, 4).as("kept_frac"),
      nSent.as("n_sentences"),
      hasLorem.as("has_lorem"),
      hasBrace.as("has_brace"),
      (nSent >= 3 && hasLorem === 0 && hasBrace === 0 && nKept >= 1)
        .cast("long").as("c4_pass"))
  }

  /** Per-document unigram word entropy in NATS — the information-
    * theoretic repetition signal (a boilerplate page repeating one
    * phrase scores near 0; natural prose scores near ln of its
    * vocabulary).  One explode + two doc-keyed partial aggs; per-term
    * contributions go through the 9-dp + DECIMAL route so the
    * cross-partition sum is order-free, and the log is NATURAL on both
    * sides — the ln ⇔ ln pairing t_perplexity's oracle already
    * validated (log2 would risk cross-engine ULP drift at tie
    * boundaries). */
  def wordEntropy(spark: SparkSession, dir: String): DataFrame =
    wordEntropyOf(Tables(spark, dir).documents)

  /** Same, over an arbitrary (doc_id, text) frame — the spec entry
    * point. */
  def wordEntropyOf(documents: DataFrame): DataFrame = {
    val tf = documents
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    val byDoc = tf.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_distinct"),
        graft.functions.Exact.sumx(
          roundx(-(col("c") * log(col("c"))), 9)).as("clog"))
    // H = ln(n) − (Σ c·ln c)/n — one pass, no per-row p division
    byDoc.select(col("doc_id"), col("n_tokens"), col("n_distinct"),
      roundx(log(col("n_tokens")) + col("clog") / col("n_tokens"), 6)
        .as("entropy"))
  }

  /** Document fingerprints: polynomial rolling hash (order-sensitive)
    * + bag-of-words md5 (order-insensitive). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents.select(
      col("doc_id"),
      rollingFingerprint(col("text")).as("rolling_fp"),
      bagFingerprint(col("text")).as("bag_fp"))
  }
}
