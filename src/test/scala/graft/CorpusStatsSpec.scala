package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.shingles
import graft.operators.{CorpusStats, TrainPrep}

/** Invariants of the corpus-profiling + decontamination operators
  * beyond the value-level oracle: plan shapes (top-k never global-sorts,
  * repetition shuffles at most twice) and cross-operator consistency
  * (decontamination only ever flags train-split docs, and every flag is
  * backed by a real shared n-gram). */
class CorpusStatsSpec extends GraftSpec {

  test("vocab top-k compiles to TakeOrderedAndProject and tf sums to corpus words") {
    val v = CorpusStats.vocabTopK(spark, Dir, k = 1000000)
    val plan = v.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k global-sorted:\n$plan")
    val tfSum = v.agg(sum(col("tf"))).collect()(0).getLong(0)
    val words = graft.sources.Tables(spark, Dir).documents
      .select(size(split(col("text"), " ")).as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(tfSum == words, s"tf total $tfSum != corpus words $words")
  }

  test("bpe pair counts cover exactly the adjacent positions") {
    // with the limit lifted, Σn over all pairs must equal Σ(words−1):
    // one pair per adjacent position, none dropped, none double-counted
    val p = CorpusStats.bpePairs(spark, Dir, k = 1000000)
    assert(p.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    val nSum = p.agg(sum(col("n"))).collect()(0).getLong(0)
    val positions = graft.sources.Tables(spark, Dir).documents
      .select((size(split(col("text"), " ")) - 1).as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(nSum == positions, s"pair total $nSum != adjacent positions $positions")
    val badDf = p.filter(col("df") > col("n") || col("df") < 1).count()
    assert(badDf == 0)
  }

  test("repetition metrics are in [0,1] and the plan shuffles at most twice") {
    val r = CorpusStats.repetition(spark, Dir)
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(r.queryExecution.executedPlan.toString).size
    assert(exchanges <= 2, s"repetition plan has $exchanges shuffle exchanges")
    val bad = r.filter(
      col("top_word_frac") < 0 || col("top_word_frac") > 1 ||
        col("dup_2gram_frac") < 0 || col("dup_2gram_frac") > 1 ||
        col("dup_3gram_frac") < 0 || col("dup_3gram_frac") > 1 ||
        (col("repetitive") =!= 0 && col("repetitive") =!= 1)).count()
    assert(bad == 0)
    // the flag must split the corpus, not rubber-stamp it
    val flagged = r.filter(col("repetitive") === 1).count()
    assert(flagged > 0 && flagged < r.count())
  }

  test("decontamination flags only train-split docs, each backed by a shared 8-gram") {
    val flagged = TrainPrep.decontaminate(spark, Dir)
    val splits = TrainPrep.sampleSplit(spark, Dir)
    val nonTrain = flagged.join(splits, Seq("doc_id"))
      .filter(col("split") =!= "train").count()
    assert(nonTrain == 0, "decontamination flagged a non-train doc")

    // independent re-verify: every flagged doc really shares an 8-gram
    // with some test-split doc
    val docs = graft.sources.Tables(spark, Dir).documents
      .join(splits, Seq("doc_id"))
      .select(col("doc_id"), col("split"), explode(shingles(col("text"), 8)).as("gram"))
    val truth = docs.filter(col("split") === "train").select(col("doc_id"), col("gram"))
      .join(docs.filter(col("split") === "test").select(col("gram")), Seq("gram"))
      .select(col("doc_id")).distinct()
    assert(flagged.select(col("doc_id")).except(truth).count() == 0)
    assert(truth.except(flagged.select(col("doc_id"))).count() == 0)
    assert(flagged.count() > 0, "test data should contain cross-split near-dups")
  }

  test("approx corpus stats: exact columns agree, percentiles meet the rank guarantee") {
    val approx = CorpusStats.corpusStatsApprox(spark, Dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = CorpusStats.corpusStats(spark, Dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    // non-sketch columns are identical
    approx.foreach { case (lang, a) =>
      val e = exact(lang)
      assert((1 to 4).forall(i => a.getLong(i) == e.getLong(i)), s"$lang scalar mismatch")
    }
    // rank guarantee: each approx percentile is a real data value whose
    // rank lands within the GK tolerance (1/accuracy = 0.1%) + the
    // discreteness slack of its target rank
    val lens = graft.sources.Tables(spark, Dir).documents
      .select(col("lang"),
        org.apache.spark.sql.functions.size(
          graft.functions.TextFunctions.words(col("text"))).cast("long").as("nw"))
      .collect().groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(1)).sorted).toMap
    for ((lang, a) <- approx; (p, idx) <- Seq(0.5 -> 5, 0.9 -> 6, 0.99 -> 7)) {
      val v = a.getLong(idx)
      val arr = lens(lang)
      assert(arr.contains(v), s"$lang p$p=$v is not a data value")
      val below = arr.count(_ < v).toDouble
      val atMost = arr.count(_ <= v).toDouble
      val target = p * arr.length
      val tol = arr.length * 0.001 + 1
      assert(below - tol <= target && target <= atMost + tol,
        s"$lang p$p=$v rank [$below,$atMost] misses target $target")
    }
  }

  test("LM scoring: frequent-token docs beat rare-token docs, OOV worst") {
    // the real corpus has ZERO held-out OOV (measured), so the LM
    // ordering claim needs an INJECTED frequency profile.  Base split
    // (doc_id mod 10 < 8) establishes "common" as high-probability;
    // held-out docs then score by how typical their tokens are.
    import spark.implicits._
    val base = (0L until 40L).filter(_ % 10 < 8)
      .map(i => (i, "en", Seq.fill(10)("common").mkString(" ") + s" rare$i"))
    val held = Seq(
      (8L, "en", Seq.fill(10)("common").mkString(" ")),   // all high-p tokens
      (18L, "en", (0 until 10).map(j => s"rare$j").mkString(" ")), // all low-p
      (28L, "en", (0 until 10).map(j => s"oov$j").mkString(" ")))  // unseen
    val docs = (base ++ held).toDF("doc_id", "lang", "text")
    val nll = graft.operators.CorpusStats.perplexityOf(docs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("nll")).toMap
    assert(nll(8L) < nll(18L), "frequent-token doc must score below rare-token doc")
    assert(nll(18L) < nll(28L), "in-vocab rare tokens must score below OOV")
    assert(nll.values.forall(_ > 0), "smoothed probabilities are < 1, so nll > 0")
  }

  test("perplexity registered query: coverage and token-count parity") {
    val out = graft.operators.CorpusStats.perplexity(spark, Dir)
    val docs = graft.sources.Tables(spark, Dir).documents
    assert(out.count() == docs.count(), "every doc gets a score")
    val mismatch = out.join(docs, Seq("doc_id"))
      .filter(col("n_tokens") =!= org.apache.spark.sql.functions.size(
        graft.functions.TextFunctions.words(col("text"))).cast("long"))
      .count()
    assert(mismatch == 0, "n_tokens must equal the doc's word count")
  }
}
