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
  * 100 TB: the prefix index is ≤ q·d + 1 = 41 rows/doc (8 B hashes),
  * the collision join shuffles on the gram key, and the verify join is
  * candidate-bounded.  The df cap (`maxDfRatio`, same guard-rail as
  * ngramStages) keeps adversarial boilerplate corpora from inflating
  * hot-gram buckets.
  *
  * Completeness is UNCONDITIONAL — the staged plan equals the naive
  * all-pairs join exactly (the oracle pairing): the prefix argument
  * only covers a doc while ≥ q·d + 1 of its grams survive the df cap
  * (one edit destroys ≤ q grams, so a qualifying partner must collide
  * within the q·d + 1 rarest SURVIVING grams); a doc left with ≤ q·d
  * surviving grams — because it is short (|G| ≤ L − q + 2 ≤ q·d; note
  * Spark's split(text, "") keeps a trailing empty element, so grams
  * per doc number L − q + 2, not L − q + 1 — no derivation here rests
  * on a length threshold) or because boilerplate made its whole gram
  * set corpus-hot — is STARVED and falls back to the quadratic
  * stratum: starved docs join the ENTIRE corpus on a length-band
  * equi-key (band = ⌊len/(d+1)⌋; |Δlen| ≤ d ⇒ band diff ≤ 1, so each
  * starved doc probes 3 bands).  The stratum is |starved| × band
  * occupancy, not corpus², and starved docs are empty on
  * Gopher-filtered real corpora (min doc length clears q·d + q − 2);
  * the spec pins both the starved-boilerplate case and the micro-doc
  * case to the naive join.
  */
object EditDist {

  /** Intermediates exposed for the spec's volume instrumentation and —
    * since round 16 — for EdgeWarehouse.ingest, whose frozen index rows
    * (.edfreq/.edpfx/.edstarved) ARE this plan's freq/prefix/starved
    * byproducts at ingest time (the frozen order at ingest is the
    * corpus order), so ingest writes them instead of recomputing. */
  final case class EditDistStages(prefix: DataFrame, collisions: DataFrame,
    pairs: DataFrame, freq: DataFrame, starved: DataFrame)

  /** `d_dedup_editdist`: near-dup pairs at edit distance ≤ 10 over the
    * documents table.  Columns (a_id, b_id, ed). */
  def editDistPairs(spark: SparkSession, dir: String): DataFrame =
    stages(Tables(spark, dir).documents, d = 10).pairs

  /** `grams`: an optional precomputed (doc_id, len, hsh) distinct-gram
    * frame (optimization r16 — EdgeWarehouse.ingest pins ONE gram pass
    * and feeds it to both this plan and the frozen index derivation);
    * must equal the default expression's rows.  `pinPrefix`
    * localCheckpoints the prefix before its three consumers (the
    * collision self-join's two sides + the starved count). */
  def stages(docs: DataFrame, d: Int, q: Int = 4,
      maxDfRatio: Double = 0.1, grams: Option[DataFrame] = None,
      pinPrefix: Boolean = false): EditDistStages = {
    val prefixLen = q * d + 1
    val base = docs.select(col("doc_id"), col("text"),
      length(col("text")).as("len"))

    // distinct char-q-gram hashes: split("") is Java code-unit chars
    // (corpus is single-byte text; gram identity only has to be
    // self-consistent — the verify is exact levenshtein either way)
    val shh = grams.getOrElse(base.select(col("doc_id"), col("len"),
      explode(graft.functions.GramHashes(split(col("text"), ""), q)).as("hsh")))
    val freq = shh.groupBy(col("hsh")).agg(count(lit(1)).as("freq"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val byRarity = Window.partitionBy(col("doc_id"))
      .orderBy(col("freq"), col("hsh"))
    val prefix0 = shh
      .join(freq, Seq("hsh"))
      .withColumn("rn", row_number().over(byRarity))
      .filter(col("rn") <= prefixLen)
      .crossJoin(broadcast(nDocs))
      // the floor keeps the cap meaningful only at corpus scale: on a
      // 4-doc frame 0.1·n rounds to zero and would drop EVERY gram
      .filter(col("freq") <= greatest(col("n_docs") * maxDfRatio, lit(20)))
      .select(col("doc_id"), col("len"), col("hsh"))
    val prefix = if (pinPrefix) prefix0.localCheckpoint() else prefix0

    val collisions = prefix.as("a")
      .join(prefix.as("b"), col("a.hsh") === col("b.hsh") &&
        col("a.doc_id") < col("b.doc_id") &&
        abs(col("a.len") - col("b.len")) <= d)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))

    // STARVED stratum (see Scaladoc): docs whose surviving prefix has
    // ≤ q·d grams — micro-docs AND cap-starved boilerplate — lose the
    // count-bound guarantee, so they pair quadratically against the
    // whole corpus on a length-band equi-key (no cartesian: band is
    // the join key, each starved doc probes its 3 adjacent bands).
    // Empty on this corpus (min doc 48 chars, no gram corpus-hot).
    val bandW = d + 1
    val nSur = prefix.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sur"))
    val starved = base
      .join(nSur, Seq("doc_id"), "left")
      .filter(coalesce(col("n_sur"), lit(0L)) <= q.toLong * d)
      .select(col("doc_id"), col("len"))
    val banded = base.select(col("doc_id"), col("len"),
      floor(col("len") / bandW).as("band"))
    val probes = starved.select(col("doc_id"), col("len"),
      explode(array(floor(col("len") / bandW) - 1, floor(col("len") / bandW),
        floor(col("len") / bandW) + 1)).as("band"))
    val starvedPairs = probes.as("a")
      .join(banded.as("b"), col("a.band") === col("b.band") &&
        col("a.doc_id") =!= col("b.doc_id") &&
        abs(col("a.len") - col("b.len")) <= d)
      .select(least(col("a.doc_id"), col("b.doc_id")).as("a_id"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("b_id"))

    val cand = collisions.union(starvedPairs).distinct()
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
    EditDistStages(prefix, collisions, pairs, freq, starved)
  }
}
