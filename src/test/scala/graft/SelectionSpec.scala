package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.operators.{TextAnalysis, TrainPrep}
import graft.sources.Tables

/** The two corpus-selection verbs: canonical-representative choice
  * (quality argmax per near-dup group — NOT min-id) and greedy
  * selection under a token budget (the registered threshold
  * decomposition must equal the naive global cumsum per-row, at every
  * budget regime: zero, boundary-splitting, and all-kept).
  */
class SelectionSpec extends GraftSpec {

  test("keepBest picks the highest-quality member, not the lowest doc_id") {
    val s = spark
    import s.implicits._
    val groups = Seq((1L, 1L, 2L), (2L, 1L, 2L), (3L, 3L, 1L))
      .toDF("doc_id", "group_id", "group_size")
    val quality = Seq((1L, 0.2), (2L, 0.9), (3L, 0.5))
      .toDF("doc_id", "quality_score")
    val kept = Dedup.keepBestFrom(groups, quality).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(kept == Set((1L, 2L, 2L, 0.9), (3L, 3L, 1L, 0.5)),
      s"representative selection wrong: $kept")
  }

  test("keepBest on the real corpus: one row per group, members dominated by their representative") {
    val groups = Dedup.dedupGroups(spark, Dir)
    val kept = Dedup.keepBest(spark, Dir)
    assert(kept.count() ==
      groups.select(col("group_id")).distinct().count(),
      "not exactly one representative per group")
    // no member strictly dominates its group's representative
    val q = Tables(spark, Dir).documents.select(col("doc_id"),
      TextAnalysis.qualityScoreCol(col("text")).as("qs"))
    val dominated = groups.join(q, Seq("doc_id"))
      .join(kept, Seq("group_id"))
      .filter(col("qs") > col("best_quality") ||
        (col("qs") === col("best_quality") && col("doc_id") < col("kept_doc_id")))
    assert(dominated.count() == 0, "a member dominates its representative")
  }

  /** The naive global-cumsum reference the oracle also uses. */
  private def naiveKept(budget: Long): Set[(Long, Long)] = {
    val scored = Tables(spark, Dir).documents.select(
      col("doc_id"),
      TextAnalysis.qualityScoreCol(col("text")).as("quality_score"),
      graft.functions.TextFunctions.regexTokenCount(col("text"))
        .cast("long").as("re_tokens"))
    scored.withColumn("ct", sum(col("re_tokens")).over(
        Window.orderBy(col("quality_score").desc, col("doc_id"))))
      .select(col("doc_id"), (col("ct") <= budget).cast("long").as("kept"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("budgetSelect equals the naive global cumsum at every budget regime") {
    for (b <- Seq(0L, 2000L, 10000L, 1000000L)) {
      val got = TrainPrep.budgetSelect(spark, Dir, b)
        .select(col("doc_id"), col("kept"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naiveKept(b), s"threshold decomposition wrong at budget $b")
    }
    // the regimes are real: 0 keeps nothing, the big budget everything
    val all = TrainPrep.budgetSelect(spark, Dir, 1000000L)
    assert(all.filter(col("kept") === 1L).count() == all.count())
    val none = TrainPrep.budgetSelect(spark, Dir, 0L)
    assert(none.filter(col("kept") === 1L).count() == 0)
    // and the default budget actually splits the corpus
    val mid = TrainPrep.budgetSelect(spark, Dir)
    val keptN = mid.filter(col("kept") === 1L).count()
    assert(keptN > 0 && keptN < mid.count(), s"default budget degenerate: $keptN")
  }

  test("budgetSelect fails loudly on an unquantized score (the driver-fold domain guard)") {
    // an over-domain score: one distinct double per row, well past the
    // 4-dp bucket bound — the silent-corpus-scale-collect hazard
    val overDomain = spark.range(TrainPrep.MaxQualityBuckets + 50L).select(
      col("id").as("doc_id"),
      (col("id").cast("double") / 1e9).as("quality_score"),
      lit(3L).as("re_tokens"))
    val e = intercept[IllegalArgumentException](
      TrainPrep.budgetSelectFrom(overDomain, budget = 100L))
    assert(e.getMessage.contains("QUANTIZED"),
      s"wrong failure mode: ${e.getMessage}")
    // and a quantized frame of the same size folds fine
    val quantized = spark.range(TrainPrep.MaxQualityBuckets + 50L).select(
      col("id").as("doc_id"),
      (pmod(col("id"), lit(7L)).cast("double") / 10000.0).as("quality_score"),
      lit(3L).as("re_tokens"))
    val kept = TrainPrep.budgetSelectFrom(quantized, budget = 9L)
      .filter(col("kept") === 1L).count()
    assert(kept == 3L, s"quantized fold kept $kept docs for a 9-token budget")
  }
}
