package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.similarity.{Knn, Pq}

/** Product-quantization invariants: code-table shape (M codes per
  * vector, each within the subspace codebook), ADC recall against the
  * exact brute-force baseline, and bit-determinism of the top-k cut.
  *
  * Recall note: random synthetic embeddings are PQ's worst case (no
  * cluster structure for the codebooks to exploit), so the bound here
  * is intentionally loose — the spec guards against the pipeline
  * degenerating (e.g. all vectors coding identically), not for
  * production recall, which real embedding distributions and 8-bit
  * codebooks (Ksub=256) deliver.
  */
class PqSpec extends GraftSpec {

  test("every vector gets 8 codes, each inside the 16-entry subspace codebook") {
    val e = graft.sources.Tables(spark, Dir).embeddings
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val (codebook, codes) = Pq.encode(e)
    assert(codebook.count() == 8 * 16)
    val perVec = codes.groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n"), countDistinct(col("m")).as("nm"))
      .filter(col("n") =!= 8 || col("nm") =!= 8).count()
    assert(perVec == 0, "a vector is missing subspace codes")
    assert(codes.filter(col("code") < 0 || col("code") >= 16).count() == 0)
    // codes must discriminate: if every vector coded identically the
    // quantizer collapsed
    val distinctWords = codes.groupBy(col("vec_id"))
      .agg(concat_ws(",", collect_list(col("code"))).as("w"))
      .select(countDistinct(col("w"))).collect()(0).getLong(0)
    assert(distinctWords > 1)
  }

  test("IVF-PQ results come only from probed lists and overlap plain PQ") {
    val r = Pq.ivfPqAnn(spark, Dir).collect()
    assert(r.length == 10)
    // nprobe=4 of k=16 lists: results must span at most 4 distinct cids
    val cids = r.map(_.getInt(2)).toSet
    assert(cids.size <= 4, s"results from ${cids.size} lists > nprobe=4")
    // pruning can only REMOVE candidates relative to exhaustive PQ:
    // any result also in plain PQ's top-10 must carry the same ADC
    val pq = Pq.pqAnn(spark, Dir).collect()
      .map(row => row.getLong(0) -> row.getDouble(1)).toMap
    r.foreach { row =>
      pq.get(row.getLong(0)).foreach { adc =>
        assert(adc == row.getDouble(1), s"ADC mismatch for vec ${row.getLong(0)}")
      }
    }
    val again = Pq.ivfPqAnn(spark, Dir).collect()
    assert(r.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("PQ warehouse probe prunes cid partitions and matches inline IVF-PQ row for row") {
    val path = java.nio.file.Files.createTempDirectory("graft_pq_").toString + "/codes"
    graft.similarity.PqWarehouse.materialize(spark, Dir, path)
    val qv = graft.sources.Tables(spark, Dir).embeddings
      .filter(col("vec_id") === 0).head()
      .getSeq[Float](1).map(_.toDouble).toArray
    val probe = graft.similarity.PqWarehouse.probe(spark, path, qv, excludeId = 0L)
    val physical = probe.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters") && physical.contains("cid"),
      s"expected cid partition pruning, got:\n${physical.take(2000)}")
    // the at-rest probe and the inline computation are the same math —
    // stored doubles round-trip exactly and the LUT folds sequentially
    val stored = probe.collect().map(r => (r.getLong(0), r.getDouble(1)))
    val inline = Pq.ivfPqAnn(spark, Dir).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(stored.toSeq == inline.toSeq,
      s"warehouse probe diverged from inline:\n stored=${stored.toSeq}\n inline=${inline.toSeq}")
  }

  test("PQ warehouse batched probe == per-query probe, pruned union scan") {
    val path = java.nio.file.Files.createTempDirectory("graft_pqb_").toString + "/codes"
    graft.similarity.PqWarehouse.materialize(spark, Dir, path)
    val queries = graft.sources.Tables(spark, Dir).embeddings
      .filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"),
        graft.functions.VectorFunctions.toDouble(col("embedding")).as("qv"))
    val batch = graft.similarity.PqWarehouse.probeBatch(spark, path, queries)
    val physical = batch.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters") && physical.contains("cid"))
    assert(physical.contains("WindowGroupLimit"))
    val rows = batch.collect()
    (0L until 3L).foreach { q =>
      val qv = graft.sources.Tables(spark, Dir).embeddings
        .filter(col("vec_id") === q).head()
        .getSeq[Float](1).map(_.toDouble).toArray
      val single = graft.similarity.PqWarehouse.probe(spark, path, qv, excludeId = q)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val slice = rows.filter(_.getAs[Long]("query_id") == q)
        .sortBy(_.getAs[Long]("rnk"))
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("adc_cosine"))).toSeq
      assert(slice == single, s"query $q: batch/single ADC divergence")
    }
  }

  test("ADC top-10 overlaps the exact baseline and is deterministic") {
    val pq = Pq.pqAnn(spark, Dir)
    val rows = pq.collect()
    assert(rows.length == 10)
    val pqIds = rows.map(_.getLong(0)).toSet
    val brIds = Knn.bruteForce(spark, Dir).collect().map(_.getLong(0)).toSet
    assert((pqIds & brIds).size >= 2,
      s"ADC recall collapsed: ${(pqIds & brIds).size}/10 overlap with brute force")
    val again = Pq.pqAnn(spark, Dir)
    assert(pq.except(again).count() == 0 && again.except(pq).count() == 0)
  }

  test("two-stage refine: exact cosines, recall dominates raw ADC, deterministic") {
    val brute = Knn.bruteForce(spark, Dir).collect()
    val bruteIds = brute.map(_.getLong(0)).toSet
    val bruteCos = brute.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val refined = Pq.pqRefine(spark, Dir).collect()
    assert(refined.length == 10)
    // stage-2 cosines are EXACT: any refined id that is also in the
    // brute top-10 carries bit-identical cosine (same expression)
    refined.filter(r => bruteCos.contains(r.getLong(0))).foreach { r =>
      assert(r.getDouble(1) == bruteCos(r.getLong(0)),
        s"refined cosine diverges from exact for vec ${r.getLong(0)}")
    }
    // re-ranking a 250-deep exact shortlist can only improve on the
    // raw ADC cut
    val adcIds = Pq.pqAnn(spark, Dir).collect().map(_.getLong(0)).toSet
    val refinedIds = refined.map(_.getLong(0)).toSet
    assert((refinedIds & bruteIds).size >= (adcIds & bruteIds).size,
      "refined recall fell below raw ADC recall")
    assert((refinedIds & bruteIds).size > (adcIds & bruteIds).size ||
      refinedIds == bruteIds,
      "refine should visibly improve the worst-case ADC ranking here")
    val again = Pq.pqRefine(spark, Dir).collect()
    assert(refined.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("REGRESSION GATE: refined serving paths hold their recall floors") {
    // the LSH demotion discipline applied to the quantized lane
    // (VERDICT r13, ask #2): the REFINED paths are what serving
    // callers use — raw ADC is the demoted candidate-generation stage
    // (Pq's Scaladoc) and deliberately carries NO floor.  Floors sit
    // below the measured values (sf0.1 BENCH ann: pq_refined 0.8,
    // ivfpq_refined 0.9) with drift margin — the DedupSpec ivf >= 0.6
    // precedent.
    val bruteIds = Knn.bruteForce(spark, Dir).collect().map(_.getLong(0)).toSet
    val pqR = Pq.pqRefine(spark, Dir).collect().map(_.getLong(0)).toSet
    val ivfR = Pq.ivfPqRefine(spark, Dir).collect().map(_.getLong(0)).toSet
    assert((pqR & bruteIds).size / 10.0 >= 0.6,
      s"pq_refined serving recall regressed: ${(pqR & bruteIds).size}/10")
    assert((ivfR & bruteIds).size / 10.0 >= 0.7,
      s"ivfpq_refined serving recall regressed: ${(ivfR & bruteIds).size}/10")
  }

  test("at-rest PQ monitor: refined row dominates ADC row over the same truth") {
    val rows = SparkEntry.queries("s_knn_recall_report_pq")(spark, Dir)
      .collect().map(r => r.getAs[String]("method") -> r).toMap
    assert(rows.keySet == Set("pq_warehouse_adc", "pq_warehouse_refined"))
    // same standing population ⇒ same truth on both rows
    assert(rows("pq_warehouse_adc").getAs[Long]("truth_n") ==
      rows("pq_warehouse_refined").getAs[Long]("truth_n"))
    assert(rows("pq_warehouse_adc").getAs[Long]("truth_n") > 0L)
    rows.values.foreach { r =>
      val (tn, m) = (r.getAs[Long]("truth_n"), r.getAs[Long]("matched"))
      assert(m >= 0L && m <= tn)
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
    }
    // the exact re-rank of a 4k-deep ADC shortlist can only improve
    // on the raw ADC cut — per query, hence in aggregate
    assert(rows("pq_warehouse_refined").getAs[Long]("matched") >=
      rows("pq_warehouse_adc").getAs[Long]("matched"),
      "refined at-rest recall fell below raw ADC")
    // the retraction residue takes query id 4 with it (the ivf
    // monitor's domain-shrink contract on this lane too)
    assert(rows("pq_warehouse_adc").getAs[Long]("n_queries") == 9L)
  }

  test("at-rest refined serving verb: containment, exact cosines, deterministic (r14)") {
    import graft.functions.VectorFunctions.toDouble
    val probe = SparkEntry.queries("s_knn_pq_probe_refined")(spark, Dir)
    val rows = probe.collect()
    assert(rows.map(_.getAs[Long]("query_id")).toSet == Set(0L, 1L, 2L))
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Long]("rnk")).sorted.toSeq == (1L to rs.length),
        s"query $q rank shape broken")
      assert(rs.length <= 10)
      assert(rs.forall(_.getAs[Long]("vec_id") != q), "self-exclusion lost")
    }
    // CONTAINMENT: stage 2 can only re-rank stage 1's shortlist —
    // every served id sits in the (expand·k)-deep ADC pull
    val path = similarity.RecallMonitor.pqMonitorPath(spark, Dir)
    val standing = sources.Tables(spark, Dir).embeddings
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .join(similarity.PqWarehouse.standingIds(spark, path), Seq("vec_id"))
      .localCheckpoint()
    val queries = standing.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val shortIds = similarity.PqWarehouse
      .probeBatch(spark, path, queries, nprobe = 4, k = 40)
      .select(col("query_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.forall(r => shortIds(
      (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id")))),
      "served id outside the ADC shortlist")
    // EXACT stage-2 cosines: bit-equal to the brute expression over
    // the same (query, vector) pairs
    val brute = similarity.Knn.knnBatchOver(standing, queries, k = 2000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("cosine"))
      .toMap
    rows.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))
      assert(brute.contains(key) && brute(key) == r.getAs[Double]("cosine"),
        s"stage-2 cosine diverges from brute for $key")
    }
    // determinism
    val again = SparkEntry.queries("s_knn_pq_probe_refined")(spark, Dir).collect()
    assert(rows.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("refined stage 2 PLANS as a broadcast fetch: no shuffle of the vectors side (r15 ask #3)") {
    import graft.functions.VectorFunctions.toDouble
    val path = java.nio.file.Files.createTempDirectory("graft_pqbc_").toString + "/codes"
    similarity.PqWarehouse.materialize(spark, Dir, path)
    val vectors = sources.Tables(spark, Dir).embeddings
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val queries = vectors.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    // disable size-based auto-broadcast: at test SF the vectors table
    // is tiny and Spark would broadcast it ANYWAY, which would keep
    // this pin green even with the explicit hint removed — the pin
    // must fail exactly when the hint is gone (VERDICT r14 #1's done
    // criterion), so only the hint may produce the BroadcastHashJoin
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probe = similarity.PqWarehouse
        .probeBatchRefined(spark, path, queries, vectors)
      val physical = probe.queryExecution.executedPlan.toString
      // the shortlist-side hint is the ONLY thing that can plan a
      // broadcast here — a shuffle join anywhere in stage 2 means the
      // 100 TB primary store would be shuffle-written to fetch ~120 rows
      assert(physical.contains("BroadcastHashJoin"),
        s"stage-2 fetch is not a broadcast join:\n${physical.take(3000)}")
      assert(!physical.contains("SortMergeJoin") &&
        !physical.contains("ShuffledHashJoin"),
        s"stage 2 shuffles the vectors side:\n${physical.take(3000)}")
      // and the result itself is unchanged by the plan shape: exact
      // stage-2 cosines ride the rounded ranking key (ADVICE r14)
      val rows = probe.collect()
      assert(rows.nonEmpty && rows.forall(_.getAs[Long]("rnk") <= 10))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }

  test("gated requantize SWAPS on improvement: staged quantizers serve (r15 ask #1)") {
    // the registered drifted shape (base ingest under trained
    // quantizers, frozen-quantizer refresh, cross-cutting retract,
    // compact): measured on this corpus the re-train on the compacted
    // survivors IMPROVES both serving stages, so the gate must ship it
    val dirTmp = java.nio.file.Files.createTempDirectory("graft_pqgate_").toString
    val path = dirTmp + "/codes"
    val e = sources.Tables(spark, Dir).embeddings
      .select(col("vec_id"),
        graft.functions.VectorFunctions.toDouble(col("embedding")).as("v"))
    similarity.PqWarehouse.materializeFrom(spark,
      e.filter(pmod(col("vec_id"), lit(10L)) < 8), path)
    similarity.PqWarehouse.refresh(spark,
      e.filter(pmod(col("vec_id"), lit(10L)) >= 8), path)
    similarity.PqWarehouse.retract(
      e.filter(pmod(col("vec_id"), lit(13L)) === 4).select(col("vec_id")), path)
    similarity.PqWarehouse.compact(spark, path)
    val g = similarity.PqWarehouse.requantizeIfBetter(spark, path, Dir)
    assert(g.swapped, s"gate refused an improvement: $g")
    assert(g.recallStaged >= g.recallStanding,
      s"premise lost — the re-train no longer improves the drifted state: $g")
    // the swap SHIPPED: the monitor now grades the staged value
    val regrade = similarity.RecallMonitor.pqRows(spark, path, Dir)
      .collect().map(r => r.getAs[String]("method") -> r.getAs[Double]("recall"))
      .toMap
    assert(regrade("pq_warehouse_refined") == g.recallStaged)
    // the staging base is retired (cleared; vacuum reclaims later)
    val stSnap = sources.CommitLog.snapshot(spark, s"$path.staged")
    assert(stSnap.readOpt(s"$path.staged").isEmpty &&
      stSnap.readOpt(s"$path.staged.codebook").isEmpty &&
      stSnap.readOpt(s"$path.staged.centroids").isEmpty,
      "staging base must be cleared after the verdict")
  }

  test("gated requantize HOLDS on regression: standing quantizers untouched (r15 ask #1)") {
    // the hold construction: standing index at the default K=16 —
    // nprobe=4 prunes to cosine-COHERENT lists, which filters the
    // distant distractors PQ's noisy ADC estimate overranks — vs a
    // re-train collapsed to K=1, where the single list makes the
    // shortlist the GLOBAL ADC race and refined recall drops
    // (measured: global-race refined ≈ 0.56 vs pruned ≈ 0.70 on this
    // corpus).  The misconfigured-repair case the gate must refuse.
    val path = java.nio.file.Files.createTempDirectory("graft_pqhold_").toString + "/codes"
    similarity.PqWarehouse.materialize(spark, Dir, path)
    def state() = {
      val snap = sources.CommitLog.snapshot(spark, path)
      (snap.read(path).collect().map(_.toSeq).toSet,
        snap.read(s"$path.codebook").collect().map(_.toSeq).toSet,
        snap.read(s"$path.centroids").collect().map(_.toSeq).toSet)
    }
    val before = state()
    val g = similarity.PqWarehouse.requantizeIfBetter(spark, path, Dir, k = 1)
    assert(!g.swapped, s"gate shipped a recall regression: $g")
    assert(g.recallStaged < g.recallStanding,
      s"premise lost — the global race no longer regresses vs pruned: $g")
    // hold means HOLD: codes and both quantizers bit-identical
    assert(state() == before, "no-swap must leave the standing state untouched")
    // and the serving path still grades at the standing recall
    val regrade = similarity.RecallMonitor.pqRows(spark, path, Dir)
      .collect().map(r => r.getAs[String]("method") -> r.getAs[Double]("recall"))
      .toMap
    assert(regrade("pq_warehouse_refined") == g.recallStanding)
  }

  test("registered requantize row: verdict consistent with its own recalls (r15)") {
    val r = SparkEntry.queries("s_knn_requantize_gated")(spark, Dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[String]("method") == "pq_requantize_gate")
    assert(row.getAs[Long]("truth_n") > 0L)
    val (refOld, refNew) = (row.getAs[Double]("recall_standing"),
      row.getAs[Double]("recall_staged"))
    assert(row.getAs[Boolean]("swapped") == (refNew >= refOld),
      s"verdict contradicts its own refined recalls: $row")
    // determinism of the cached verdict
    val again = SparkEntry.queries("s_knn_requantize_gated")(spark, Dir).collect()
    assert(r.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("IVF-PQ refine: exact cosines, probed lists only, recall dominates raw IVF-PQ") {
    val brute = Knn.bruteForce(spark, Dir).collect()
    val bruteIds = brute.map(_.getLong(0)).toSet
    val bruteCos = brute.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val refined = Pq.ivfPqRefine(spark, Dir).collect()
    assert(refined.length == 10)
    // stage-2 cosines are EXACT — bit-identical to the brute expression
    refined.filter(r => bruteCos.contains(r.getLong(0))).foreach { r =>
      assert(r.getDouble(1) == bruteCos(r.getLong(0)),
        s"refined cosine diverges from exact for vec ${r.getLong(0)}")
    }
    // containment: results can only come from the raw IVF-PQ probe's
    // candidate universe (same coarse quantizer, same nprobe)
    val rawRows = Pq.ivfPqAnn(spark, Dir).collect()
    val probedCids = rawRows.map(_.getInt(2)).toSet
    assert(probedCids.size <= 4)
    // re-ranking the probed shortlist exactly can only improve recall
    val rawIds = rawRows.map(_.getLong(0)).toSet
    val refinedIds = refined.map(_.getLong(0)).toSet
    assert((refinedIds & bruteIds).size >= (rawIds & bruteIds).size,
      "refined IVF-PQ recall fell below raw IVF-PQ recall")
    val again = Pq.ivfPqRefine(spark, Dir).collect()
    assert(refined.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }
}
