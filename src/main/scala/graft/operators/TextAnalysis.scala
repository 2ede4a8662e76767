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
