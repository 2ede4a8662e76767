package graft

import org.apache.spark.sql.functions._

/** Specs for the dedup family + knn + text ops (sf0.001).  These cover
  * the sketch operators that have no SQL oracle: MinHash/LSH and
  * SimHash are checked against the exact n-gram Jaccard ground truth,
  * LSH-ANN against brute-force KNN. */
class DedupSpec extends GraftSpec {

  test("exact dedup partitions the corpus") {
    val d = dedup.Dedup.exact(spark, Dir)
    val total = d.agg(sum("n_dups")).head().getLong(0)
    assert(total == sources.Tables(spark, Dir).documents.count())
  }

  test("minhash LSH finds the high-jaccard pairs the exact method finds") {
    // ground truth: exact 3-shingle Jaccard >= 0.8
    val exactPairs = dedup.Dedup.ngramJaccard(spark, Dir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val lshRows = dedup.Dedup.minhashLsh(spark, Dir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    // the first-agreeing-band predicate must emit each pair once
    assert(lshRows.distinct.length == lshRows.length,
      "candidate pairs emitted more than once")
    val lshPairs = lshRows.toSet
    // MinHash(128) with 32 bands at est>=0.7 should recall nearly all
    // true >=0.8 pairs; allow a small miss margin
    val missed = exactPairs -- lshPairs
    assert(missed.size <= math.max(1, exactPairs.size / 10),
      s"LSH missed ${missed.size} of ${exactPairs.size}: $missed")
  }

  test("minhash estimates are close to exact jaccard") {
    val exact = dedup.Dedup.ngramJaccard(spark, Dir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) -> r.getAs[Double]("jaccard")).toMap
    val est = dedup.Dedup.minhashLsh(spark, Dir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) -> r.getAs[Double]("est_jaccard")).toMap
    val common = exact.keySet.intersect(est.keySet)
    common.foreach { k =>
      assert(math.abs(exact(k) - est(k)) < 0.2, s"$k exact=${exact(k)} est=${est(k)}")
    }
  }

  test("simhash finds the shingle near-dups; tight hamming pairs are true dups") {
    // SimHash approximates cosine over term-frequency vectors, so
    // hamming 2-3 may legitimately pair docs that differ by shingle
    // Jaccard.  The invariants that must hold:
    //  - hamming <= 1 pairs are true >=0.8-Jaccard near-dups
    //  - recall over the exact near-dup set is high
    val exact = dedup.Dedup.ngramJaccard(spark, Dir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val sim = dedup.Dedup.simhash(spark, Dir).collect()
      .map(r => ((r.getAs[Long]("a_id"), r.getAs[Long]("b_id")), r.getAs[Long]("hamming")))
    sim.foreach { case (_, h) => assert(h <= 3) }
    val tight = sim.filter(_._2 <= 1).map(_._1).toSet
    assert((tight -- exact).isEmpty, s"tight-hamming false positives: ${tight -- exact}")
    val recall = sim.map(_._1).toSet.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"simhash recall too low: $recall")
  }

  test("production 128-bit cosine gate (16 bands × 8 bits) recovers duplicate cliques") {
    // the wide gate exceeds one signature long — this drives the
    // word-array path (the packed form wrapped 1L << p past 64)
    val s = spark
    val base = sources.Tables(s, Dir).embeddings
      .select(col("vec_id"), graft.functions.VectorFunctions.toDouble(col("embedding")).as("v"))
    val reps = 3
    val e = base.crossJoin(s.range(reps).toDF("r"))
      .select((col("vec_id") * reps + col("r")).as("vec_id"), col("v"))
    val pairs = dedup.Dedup.cosinePairsFrom(e, 0.95, 8, 16).collect()
    // identical replicas: every base vector becomes a 3-clique at
    // cosine 1.0, and identical signatures match every band — all
    // clique pairs MUST surface, exactly once each
    val nBase = base.count()
    val clique = pairs.filter(r => r.getAs[Long]("a_id") / reps == r.getAs[Long]("b_id") / reps)
    assert(clique.length == nBase * reps * (reps - 1) / 2,
      s"expected ${nBase * 3} clique pairs, got ${clique.length}")
    assert(pairs.map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).distinct.length == pairs.length)
    pairs.foreach(r => assert(r.getAs[Double]("cosine") >= 0.95))
  }

  test("cosine pairs: LSH-candidate plan matches exact all-pairs, no nested-loop join") {
    import graft.functions.VectorFunctions._
    val df = dedup.Dedup.cosinePairs(spark, Dir)
    // plan shape: candidates come from the banded equi-join — the
    // all-pairs BroadcastNestedLoopJoin/CartesianProduct must be gone
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin") && !physical.contains("CartesianProduct"),
      s"expected bucketed candidate join, got:\n${physical.take(2000)}")
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id"))
      assert(r.getAs[Double]("cosine") >= 0.4)
    }
    // recall/precision 1.0 vs the exact all-pairs join (the shape the
    // DuckDB oracle computes): LSH candidates must be a superset of the
    // true pairs at the threshold, and verification kills the rest
    val t = sources.Tables(spark, Dir)
    val e = t.embeddings
      .select(org.apache.spark.sql.functions.col("vec_id"),
        toDouble(org.apache.spark.sql.functions.col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val exact = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cos") >= 0.4)
      .select(col("a.vec_id"), col("b.vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(got == exact, s"missed=${exact -- got} extra=${got -- exact}")
  }

  test("knn brute force returns 10 ordered neighbors") {
    val rows = similarity.Knn.bruteForce(spark, Dir).collect()
    assert(rows.length == 10)
    val cos = rows.map(_.getAs[Double]("cosine"))
    assert(cos.sameElements(cos.sorted.reverse))
  }

  test("batched knn: query 0's slice equals brute force; top-k pushes below the shuffle") {
    val batch = similarity.Knn.knnBatch(spark, Dir, nQueries = 10, k = 5)
    val rows = batch.collect()
    // every query present, exactly k ranked neighbors each
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet == (0L until 10L).toSet)
    byQ.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("rnk")).sorted.sameElements(1L to 5L))
      val cos = rs.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("cosine"))
      assert(cos.sameElements(cos.sorted.reverse))
    }
    // the query_id = 0 slice must equal the single-query brute force
    val slice = rows.filter(_.getAs[Long]("query_id") == 0L)
      .sortBy(_.getAs[Long]("rnk"))
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq
    val brute = similarity.Knn.bruteForce(spark, Dir).collect().take(5)
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq
    assert(slice == brute)
    // rank<=k must compile to WindowGroupLimit (partial top-k heaps
    // below the exchange — only ~|Q|·k rows shuffle, not |Q|·corpus)
    val plan = batch.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in plan:\n$plan")
  }

  test("batched multi-probe lsh: each query's slice equals its single-query ranking") {
    val batch = similarity.Knn.lshBatch(spark, Dir, nQueries = 3, k = 5)
    val rows = batch.collect()
    assert(rows.map(_.getAs[Long]("query_id")).toSet == (0L until 3L).toSet)
    assert(batch.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
    // query 0's slice must equal the registered single-query
    // multi-probe ranking (same planes, same probe set)
    val single = similarity.Knn.lshAnnMulti(spark, Dir).collect().take(5)
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq
    val slice = rows.filter(_.getAs[Long]("query_id") == 0L)
      .sortBy(_.getAs[Long]("rnk"))
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq
    assert(slice == single, s"batch $slice vs single $single")
  }

  test("recall report: intersection arithmetic exact, multi-probe >= single-probe") {
    val (nQ, k) = (10, 5)
    val rows = similarity.Knn.recallReport(spark, Dir, nQ, k).collect()
      .map(r => r.getAs[String]("method") ->
        (r.getAs[Long]("matched"), r.getAs[Double]("recall"),
          r.getAs[Double]("worst_recall"))).toMap
    assert(rows.keySet == Set("ivf", "lsh", "lsh_multiprobe"))
    // independent recomputation of each method's matched count
    def matchedOf(approx: org.apache.spark.sql.DataFrame): Long = {
      val truth = similarity.Knn.knnBatch(spark, Dir, nQ, k)
        .select(col("query_id"), col("vec_id"))
      truth.join(approx.select(col("query_id"), col("vec_id")),
        Seq("query_id", "vec_id")).count()
    }
    assert(rows("lsh")._1 ==
      matchedOf(similarity.Knn.lshBatch(spark, Dir, nQ, k, multiProbe = false)),
      "single-probe matched diverges from the independent join")
    assert(rows("lsh_multiprobe")._1 ==
      matchedOf(similarity.Knn.lshBatch(spark, Dir, nQ, k, multiProbe = true)),
      "multi-probe matched diverges from the independent join")
    assert(rows("ivf")._1 ==
      matchedOf(similarity.Knn.ivfBatch(spark, Dir, nQ, k)),
      "ivf matched diverges from the independent join")
    // the superset lever: multi-probe candidates ⊇ single-probe ⇒
    // matched (and so recall) can only be >=
    assert(rows("lsh_multiprobe")._1 >= rows("lsh")._1)
    rows.values.foreach { case (m, rec, worst) =>
      assert(m >= 0 && m <= nQ.toLong * k)
      assert(rec >= 0.0 && rec <= 1.0 && worst >= 0.0 && worst <= 1.0)
      assert(worst <= rec + 1e-9, "worst recall cannot exceed the average")
    }
    // the evaluation has signal on the synthetic corpus: the
    // multi-probe path finds a nonzero share of true neighbors
    assert(rows("lsh_multiprobe")._2 > 0.0)
    // REGRESSION GATE (VERDICT r12, ask #5): the registered SERVING
    // paths hold their recall floors on this corpus — multi-probe and
    // IVF are what serving callers use; single-probe is the demoted
    // candidate-generation baseline (see Knn.lshAnn's Scaladoc) and
    // deliberately carries NO floor: its monitor row exists to show
    // why multi-probe exists.  Floors sit below the measured values
    // (ivf 0.94, multiprobe 0.46 at sf0.1) with drift margin.
    assert(rows("ivf")._2 >= 0.6,
      s"IVF serving recall regressed: ${rows("ivf")._2}")
    assert(rows("lsh_multiprobe")._2 >= 0.25,
      s"multi-probe serving recall regressed: ${rows("lsh_multiprobe")._2}")
  }

  test("batched ivf: each query's slice equals the single-query ivf ranking") {
    val batch = similarity.Knn.ivfBatch(spark, Dir, nQueries = 3, k = 5)
    val rowsB = batch.collect()
    assert(rowsB.map(_.getAs[Long]("query_id")).toSet == (0L until 3L).toSet)
    // per-query top-k must compile to WindowGroupLimit partial heaps
    assert(batch.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
    // query 0's slice must equal the registered single-query IVF
    // ranking (same coarse quantizer, same nProbe)
    val single = similarity.Knn.ivfAnn(spark, Dir).collect().take(5)
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq
    val slice = rowsB.filter(_.getAs[Long]("query_id") == 0L)
      .sortBy(_.getAs[Long]("rnk"))
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq
    assert(slice == single, s"batch $slice vs single $single")
    // a vector lives in exactly one list: no (query, vector) pair
    // scores twice
    val pairs = rowsB.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id")))
    assert(pairs.distinct.length == pairs.length)
  }

  test("token rarity: hapax docs score 1.0, df bounds hold") {
    val rows = operators.CorpusStats.tokenRarity(spark, Dir).collect()
    assert(rows.length == sources.Tables(spark, Dir).documents.count())
    rows.foreach { r =>
      val (minDf, hapax) = (r.getAs[Long]("min_df"), r.getAs[Double]("hapax_frac"))
      assert(minDf >= 1L)
      assert(hapax >= 0.0 && hapax <= 1.0)
      if (hapax > 0.0) assert(minDf == 1L, "hapax tokens imply min_df 1")
      assert(r.getAs[Double]("mean_token_df") >= minDf.toDouble)
    }
    // the signal separates docs (not a constant column); the synthetic
    // vocab is small enough that hapax tokens may not exist at sf0.001,
    // so the separation check runs on mean_token_df
    assert(rows.map(_.getAs[Double]("mean_token_df")).distinct.length > 10)
  }

  test("lsh ann neighbors are a subset of the same bucket, ranked like brute force") {
    val brute = similarity.Knn.bruteForce(spark, Dir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cosine")).toMap
    val ann = similarity.Knn.lshAnn(spark, Dir).collect()
    assert(ann.nonEmpty, "query bucket empty")
    // ANN cosines must match brute-force cosines where both rank the vec
    ann.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      brute.get(id).foreach(b => assert(math.abs(b - r.getAs[Double]("cosine")) < 1e-9))
    }
  }

  test("multi-probe lsh recall dominates single-probe") {
    val brute = similarity.Knn.bruteForce(spark, Dir).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val single = similarity.Knn.lshAnn(spark, Dir).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val multi = similarity.Knn.lshAnnMulti(spark, Dir).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    // candidate pool is a superset, so true-top-10 overlap cannot drop
    assert(multi.intersect(brute).size >= single.intersect(brute).size,
      s"multi-probe recall ${multi.intersect(brute).size} < single ${single.intersect(brute).size}")
    // and cosines must still be exact where both rank a vec
    val bruteCos = similarity.Knn.bruteForce(spark, Dir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cosine")).toMap
    similarity.Knn.lshAnnMulti(spark, Dir).collect().foreach { r =>
      bruteCos.get(r.getAs[Long]("vec_id"))
        .foreach(b => assert(math.abs(b - r.getAs[Double]("cosine")) < 1e-9))
    }
  }

  test("ivf ann returns ranked in-list neighbors with exact cosines") {
    val brute = similarity.Knn.bruteForce(spark, Dir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cosine")).toMap
    val ivf = similarity.Knn.ivfAnn(spark, Dir).collect()
    assert(ivf.length == 10)
    val cos = ivf.map(_.getAs[Double]("cosine"))
    assert(cos.sameElements(cos.sorted.reverse))
    // where IVF and brute agree on a vec, the cosine must be identical
    ivf.foreach { r =>
      brute.get(r.getAs[Long]("vec_id"))
        .foreach(b => assert(math.abs(b - r.getAs[Double]("cosine")) < 1e-9))
    }
    // probing 4 of 16 lists should still recover some true neighbors
    val recall = ivf.count(r => brute.contains(r.getAs[Long]("vec_id")))
    assert(recall >= 2, s"IVF recall too low: $recall of 10")
  }

  test("substring spans excise exactly the cross-doc shared range") {
    val s = spark
    import s.implicits._
    // docs 1 and 2 share words 5..14 of doc 1 (a 10-word run → three
    // overlapping 8-grams at starts 5,6,7); doc 3 shares nothing
    val shared = (0 until 10).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, (0 until 5).map(i => s"a$i").mkString(" ") + " " + shared + " " +
        (0 until 5).map(i => s"b$i").mkString(" ")),
      (2L, (0 until 5).map(i => s"c$i").mkString(" ") + " " + shared + " " +
        (0 until 5).map(i => s"d$i").mkString(" ")),
      (3L, (0 until 20).map(i => s"e$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = dedup.Dedup.substringSpansOf(docs, n = 8).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // both sharers: one island, starts at word 5, covers grams 5..7 →
    // end = 7 + 8 − 1 = 14 (exactly the shared run), 3 grams
    assert(out == Map(1L -> ((5L, 14L, 3L)), 2L -> ((5L, 14L, 3L))))

    // disjoint shared runs become SEPARATE islands (gap > n)
    val far = Seq(
      (1L, shared + " " + (0 until 12).map(i => s"x$i").mkString(" ") + " " + shared),
      (2L, shared)
    ).toDF("doc_id", "text")
    val spans1 = dedup.Dedup.substringSpansOf(far, n = 8)
      .filter(col("doc_id") === 1L)
      .orderBy(col("start_word")).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(spans1.length == 2, s"expected 2 islands, got ${spans1.mkString(",")}")
    assert(spans1(0) == ((0L, 9L)) && spans1(1) == ((22L, 31L)))

    // excision cuts exactly the span words and keeps everything else
    // in order; the fully-covered doc 2 (pure shared run) drops
    val ex = dedup.Dedup.substringExciseOf(far, n = 8).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getString(2)))).toMap
    assert(ex.keySet == Set(1L), s"fully-covered doc must drop: ${ex.keySet}")
    assert(ex(1L) == ((12L, (0 until 12).map(i => s"x$i").mkString(" "))))
  }

  test("connected components converge on a long chain (pointer jumping)") {
    val s = spark
    import s.implicits._
    // a 2048-node chain has diameter 2047: plain one-hop min-label
    // propagation could NOT converge inside the 50-round cap; pointer
    // jumping gets there in ~O(log n) rounds
    val n = 2048L
    val nodes = (0L until n).toDF("doc_id")
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val labels = dedup.Dedup.connectedComponents(nodes, pairs).collect()
    assert(labels.length == n)
    assert(labels.map(_.getAs[Long]("group_id")).distinct.sameElements(Array(0L)))
  }

  test("an ed<=10 pair merges two components the token-level edges cannot reach") {
    val s = spark
    import s.implicits._
    // three character substitutions spread across words: ed = 3, but
    // 7 of 8 word-3-gram shingles differ (Jaccard 1/15 << 0.8) and the
    // texts are not exact dups — only the editdist channel links them
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = a.replace("beta", "betq").replace("epsilon", "epsilqn")
      .replace("iota", "iotq")
    val docs = Seq((1L, a), (2L, b),
      (3L, "a wholly unrelated document about completely different subject matter entirely"))
      .toDF("doc_id", "text")
    assert(dedup.Dedup.ngramStages(docs, maxDfRatio = 0.1).pairs
      .filter((col("a_id") === 1 && col("b_id") === 2)).count() == 0,
      "test premise broken: the ngram leg pairs the docs itself")
    val g = dedup.Dedup.dedupGroupsFrom(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("group_id"), r.getAs[Long]("group_size"))).toMap
    assert(g(1L) == ((1L, 2L)) && g(2L) == ((1L, 2L)),
      s"ed<=10 pair did not merge: $g")
    assert(g(3L) == ((3L, 1L)))
  }

  test("foldIntoComponents: bridge via a new node merges standing components; untouched labels stay") {
    val s = spark
    import s.implicits._
    // standing components {1,2}, {5,6}, {9} with canonical min labels
    val standing = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L), (9L, 9L))
      .toDF("doc_id", "group_id")
    val newNodes = Seq(10L, 11L).toDF("doc_id")
    // new node 10 touches BOTH standing components; 11 arrives edgeless
    val delta = Seq((10L, 2L), (10L, 6L)).toDF("a_id", "b_id")
    val out = dedup.Dedup.foldIntoComponents(standing, newNodes, delta)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L, 10L -> 1L,
      9L -> 9L, 11L -> 11L), s"unexpected fold: $out")
  }

  test("foldIntoComponents: a new node with a smaller id becomes the canonical label") {
    val s = spark
    import s.implicits._
    val standing = Seq((5L, 5L), (6L, 5L)).toDF("doc_id", "group_id")
    val newNodes = Seq(2L).toDF("doc_id")
    val delta = Seq((2L, 6L)).toDF("a_id", "b_id")
    val out = dedup.Dedup.foldIntoComponents(standing, newNodes, delta)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(2L -> 2L, 5L -> 2L, 6L -> 2L), s"unexpected fold: $out")
  }

  test("incremental CC fold is indistinguishable from the full recompute") {
    val docs = sources.Tables(spark, Dir).documents
    val full = dedup.Dedup.dedupGroupsFrom(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val inc = dedup.Dedup.dedupGroupsIncrementalFrom(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc == full,
      s"fold drift: only-inc=${(inc -- full).take(5)} only-full=${(full -- inc).take(5)}")
    // the premise that makes the test non-vacuous: some delta edge
    // actually crosses the base/incoming split on this corpus
    val edges = dedup.Dedup.nearDupEdges(docs)
    assert(edges.filter(pmod(col("a_id"), lit(10)) >= 8 ||
      pmod(col("b_id"), lit(10)) >= 8).count() > 0,
      "corpus has no cross-split or batch-side edges; fold untested")
  }

  test("chunk dedup: one survivor per distinct chunk, and it is the first occurrence") {
    val out = dedup.Dedup.dedupChunks(spark, Dir).localCheckpoint()
    val chunks = operators.TrainPrep.chunkDocs(spark, Dir)
      .select(col("doc_id"), col("chunk_id"), md5(col("chunk_text")).as("h"))
    val j = out.join(chunks, Seq("doc_id", "chunk_id"))
    // exactly one kept row per hash, n_dups = group size on every row
    val perHash = j.groupBy(col("h"))
      .agg(sum(col("kept")).as("n_kept"), count(lit(1)).as("n"),
        min(col("n_dups")).as("dmin"), max(col("n_dups")).as("dmax"),
        min(struct(col("doc_id"), col("chunk_id"))).as("first"))
    assert(perHash.filter(col("n_kept") =!= 1).count() == 0)
    assert(perHash.filter(col("dmin") =!= col("n") || col("dmax") =!= col("n")).count() == 0)
    // the kept row IS the minimal (doc_id, chunk_id) of its hash group
    val keptNotFirst = j.filter(col("kept") === 1)
      .join(j.groupBy(col("h"))
        .agg(min(struct(col("doc_id"), col("chunk_id"))).as("f")), Seq("h"))
      .filter(col("doc_id") =!= col("f.doc_id") || col("chunk_id") =!= col("f.chunk_id"))
    assert(keptNotFirst.count() == 0)
    // the corpus HAS duplicate chunks (else the operator proves nothing)
    assert(out.filter(col("kept") === 0).count() > 0)
  }

  test("line dedup: cross-doc shared lines flagged, within-doc repeats are not") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "shared footer\nunique one"),
      (2L, "shared footer\nunique two"),
      (3L, "only unique here\nrepeat\nrepeat") // within-doc only
    ).toDF("doc_id", "text")
    val m = dedup.Dedup.dedupLinesOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(1L).getAs[Long]("n_lines") == 2 &&
      m(1L).getAs[Long]("n_shared_lines") == 1 &&
      m(1L).getAs[Double]("shared_line_frac") == 0.5 &&
      m(1L).getAs[Long]("para_keep") == 0L) // 0.5 > 0.3 gate
    assert(m(2L).getAs[Long]("n_shared_lines") == 1)
    // 'repeat' appears twice but only in doc 3 → docs_with = 1 → clean
    assert(m(3L).getAs[Long]("n_lines") == 3 &&
      m(3L).getAs[Long]("n_shared_lines") == 0 &&
      m(3L).getAs[Long]("para_keep") == 1L)
  }

  test("fingerprints: identical text => identical fingerprints") {
    val docs = sources.Tables(spark, Dir).documents
    val fps = operators.TextAnalysis.fingerprint(spark, Dir)
    val joined = docs.select(col("doc_id"), col("text"))
      .join(fps, "doc_id").collect()
      .groupBy(_.getAs[String]("text"))
    joined.values.filter(_.length > 1).foreach { group =>
      assert(group.map(_.getAs[Long]("rolling_fp")).distinct.length == 1)
      assert(group.map(_.getAs[String]("bag_fp")).distinct.length == 1)
    }
  }
}
