package graft.dedup

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Tables

/** Character-level near-duplicate pairs at bounded edit distance —
  * the dedup family member the token-level passes cannot express:
  * OCR noise, typo farms, and template fills differ by a handful of
  * CHARACTER edits that leave word-shingle Jaccard high but are
  * invisible to exact/chunk hashing, while a fixed edit budget (not a
  * similarity ratio) is the contract dedup-by-provenance pipelines
  * want ("same doc up to k keystrokes").
  *
  * Semantics: all pairs (a_id < b_id) with levenshtein(a.text, b.text)
  * ≤ d, with the exact distance.  Output is all-integer — no float
  * boundary anywhere.
  *
  * Plan shape (Ed-Join, Xiao et al. VLDB 2008 — the edit-distance
  * sibling of d_dedup_ngram's AllPairs/PPJoin):
  *   1. distinct char-q-gram hashes per doc (one native GramHashes
  *      call per row — gram strings never materialize);
  *   2. global gram frequency (groupBy — map-side combined, never a
  *      per-gram window);
  *   3. rarity prefix: one edit op destroys at most q distinct
  *      q-grams, so ed ≤ d ⇒ |G(a) ∩ G(b)| ≥ max(|G|) − q·d; with
  *      every doc's grams in one global (freq, hsh) order, any
  *      qualifying pair must collide within its q·d + 1 RAREST grams
  *      (the AllPairs prefix argument) — the candidate join indexes a
  *      FIXED q·d + 1 rows per doc, independent of document length;
  *   4. length filter |len(a) − len(b)| ≤ d rides inside the join
  *      (ed ≥ length difference);
  *   5. exact verify: Spark's banded `levenshtein(a, b, d)` — O(L·d)
  *      per candidate, not O(L²), and the only stage that touches
  *      text pairs.
  *
  * q = 4 (not 3): char-4-grams span word-boundary bigrams, so their
  * per-doc rarity survives even a SMALL-VOCABULARY corpus where every
  * 3-gram is corpus-hot and the df cap would starve the prefix (this
  * exact failure dropped a true pair on the 30-word synthetic corpus
  * at q = 3; at q = 4 every doc keeps a capped-clean prefix).
  *
  * 100 TB: the prefix index is q·d + 1 = 41 rows/doc (8 B hashes), the
  * collision join shuffles on the gram key, and the verify join is
  * candidate-bounded.  The df cap (`maxDfRatio`, same guard-rail as
  * ngramStages) keeps adversarial boilerplate corpora from inflating
  * hot-gram buckets; the only pairs it can lose are docs whose every
  * rare gram is corpus-hot — true duplicates among those are caught by
  * the exact-hash pass dedupGroups unions in.
  *
  * Completeness domain: the count bound is vacuous when BOTH sides
  * have ≤ q·d grams (len ≤ q·d + q − 1 = 43 chars) — two wholly
  * different 20-char strings sit at ed ≤ 20 while sharing nothing.
  * Such micro-docs go through `shortPairs`, a length-banded quadratic
  * stratum: bounded in practice because production corpora drop
  * sub-minimum-length docs upstream (the Gopher length filter) and
  * every member is ≤ 32 chars.  Mixed short×long pairs are covered by
  * the prefix join (the short side's WHOLE gram set fits its prefix).
  */
object EditDist {

  /** Intermediates exposed for the spec's volume instrumentation. */
  final case class EditDistStages(collisions: DataFrame, pairs: DataFrame)

  /** `d_dedup_editdist`: near-dup pairs at edit distance ≤ 10 over the
    * documents table.  Columns (a_id, b_id, ed). */
  def editDistPairs(spark: SparkSession, dir: String): DataFrame =
    stages(Tables(spark, dir).documents, d = 10).pairs

  def stages(docs: DataFrame, d: Int, q: Int = 4,
      maxDfRatio: Double = 0.1): EditDistStages = {
    val prefixLen = q * d + 1
    val shortLen = q * d + q - 1 // count bound vacuous at/below this
    val base = docs.select(col("doc_id"), col("text"),
      length(col("text")).as("len"))

    // distinct char-q-gram hashes: split("") is Java code-unit chars
    // (corpus is single-byte text; gram identity only has to be
    // self-consistent — the verify is exact levenshtein either way)
    val shh = base.select(col("doc_id"), col("len"),
      explode(graft.functions.GramHashes(split(col("text"), ""), q)).as("hsh"))
    val freq = shh.groupBy(col("hsh")).agg(count(lit(1)).as("freq"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val byRarity = Window.partitionBy(col("doc_id"))
      .orderBy(col("freq"), col("hsh"))
    val prefix = shh
      .join(freq, Seq("hsh"))
      .withColumn("rn", row_number().over(byRarity))
      .filter(col("rn") <= prefixLen)
      .crossJoin(broadcast(nDocs))
      // the floor keeps the cap meaningful only at corpus scale: on a
      // 4-doc frame 0.1·n rounds to zero and would drop EVERY gram
      .filter(col("freq") <= greatest(col("n_docs") * maxDfRatio, lit(20)))
      .select(col("doc_id"), col("len"), col("hsh"))

    val collisions = prefix.as("a")
      .join(prefix.as("b"), col("a.hsh") === col("b.hsh") &&
        col("a.doc_id") < col("b.doc_id") &&
        abs(col("a.len") - col("b.len")) <= d)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))

    // micro-doc stratum: banded quadratic among ≤ shortLen-char docs
    // (empty on this corpus — min doc is 48 chars; kept for domain
    // completeness, see Scaladoc)
    val short = base.filter(col("len") <= shortLen)
    val shortPairs = short.as("a")
      .join(short.as("b"), col("a.doc_id") < col("b.doc_id") &&
        abs(col("a.len") - col("b.len")) <= d)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))

    val cand = collisions.union(shortPairs).distinct()
    val texts = base.select(col("doc_id"), col("text"))
    val pairs = cand
      .join(texts.select(col("doc_id").as("a_id"), col("text").as("a_text")),
        Seq("a_id"))
      .join(texts.select(col("doc_id").as("b_id"), col("text").as("b_text")),
        Seq("b_id"))
      // banded levenshtein: returns −1 when the distance exceeds d
      .withColumn("ed", levenshtein(col("a_text"), col("b_text"), d))
      .filter(col("ed") >= 0)
      .select(col("a_id"), col("b_id"), col("ed").cast("bigint").as("ed"))
    EditDistStages(collisions, pairs)
  }
}
