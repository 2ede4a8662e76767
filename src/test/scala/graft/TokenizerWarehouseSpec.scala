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
