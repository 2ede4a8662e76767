package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text column functions — whitespace/regex tokenization, shingling,
  * deterministic word hashing, language-ID stopword hits, fingerprints.
  *
  * Everything here is built from `org.apache.spark.sql.functions` and
  * higher-order functions (transform/filter/aggregate), so it stays
  * inside whole-stage codegen — no Scala UDFs, no serialization
  * round-trips on the 100 TB hot path.
  */
object TextFunctions {

  /** Whitespace word list. */
  def words(text: Column): Column = split(text, " ")

  /** Distinct n-word shingles ("the fast key" …) — the dedup unit.
    * Docs with fewer than n words yield an empty set (guard needed:
    * Spark's sequence(0, -1) would count *down*, unlike SQL series). */
  def shingles(text: Column, n: Int): Column = {
    val w = words(text)
    when(size(w) >= n,
      array_distinct(
        transform(sequence(lit(0), size(w) - n),
          i => array_join(slice(w, i + 1, lit(n)), " "))))
      .otherwise(typedLit(Seq.empty[String]))
  }

  /** Deterministic 60-bit word hash from md5 hex — engine-portable (the
    * DuckDB oracle reproduces it with the same md5 arithmetic), unlike
    * murmur/xxhash whose seeds differ across engines. */
  def wordHash(w: Column): Column =
    conv(substring(md5(w), 1, 15), 16, 10).cast("long")

  /** Polynomial rolling hash of the word sequence, mod 1e9+7.
    * acc stays < 1e9 so acc*31 + h < 2^63 — no ANSI overflow. */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      transform(words(text), wordHash _),
      lit(0L),
      (acc, h) => (acc * 31L + h) % 1000000007L)

  /** Order-insensitive bag-of-words fingerprint. */
  def bagFingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(words(text))), " "))

  /** Stopword hit count for one language's list. */
  def stopwordHits(text: Column, stops: Seq[String]): Column =
    size(filter(words(text), w => w.isInCollection(stops)))

  val StopEn = Seq("the", "a", "of", "and", "to", "in")
  val StopEs = Seq("el", "la", "de", "que", "y", "en")
  val StopDe = Seq("der", "die", "und", "das", "ist", "ein")
  val StopFr = Seq("le", "la", "de", "et", "un", "est")

  /** Regex token count — a BPE-ish split into letter runs, digit runs,
    * and single punctuation marks. */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0)))
}
