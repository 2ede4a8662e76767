package graft

import org.apache.spark.sql.functions._

import graft.similarity.{Pca, PcaWarehouse}

/** PcaWarehouse contracts: the refresh fold is BIT-EQUAL to a
  * one-shot rebuild (associative integer moments — the strongest
  * equality in the warehouse matrix), the eigen probe rides the same
  * equality, and compaction merges deltas without perturbing probes.
  */
class PcaWarehouseSpec extends GraftSpec {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-pcawh-$tag-").toString + "/data"

  private def covMap(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
    df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

  test("materialize(base) + refresh(incoming) == one-shot moments over the union, bit for bit") {
    val path = tmp("refresh")
    val e = graft.sources.Tables(spark, Dir).embeddings
    PcaWarehouse.materialize(spark, Dir, path)
    PcaWarehouse.refresh(spark, e.filter(pmod(col("vec_id"), lit(10L)) >= 8), path)

    val got = covMap(PcaWarehouse.cov(spark, path))
    val want = covMap(Pca.covFrom(e))
    assert(got.size == 64 * 65 / 2 && want.size == got.size)
    assert(got == want, "warehouse cov diverged from one-shot")
    // delta layout really is append-only: two generations of rows
    // (2080 triangle + 64 dim sentinels + 1 count row each)
    assert(graft.sources.CommitLog.snapshot(spark, path).read(path).count() == 2 * 2145)
  }

  test("pca probe equals the inline eigensolve over the full table") {
    val path = PcaWarehouse.builtPath(spark, Dir)
    val got = PcaWarehouse.pcaProbe(spark, Dir, path).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    val want = Pca.pcaComponents(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got == want)
  }

  test("compact merges deltas to one row per key; probes bit-identical") {
    val path = tmp("compact")
    val e = graft.sources.Tables(spark, Dir).embeddings
    PcaWarehouse.materializeFrom(e.filter(col("vec_id") % 2 === 0), path)
    PcaWarehouse.refresh(spark, e.filter(col("vec_id") % 2 === 1), path)
    val before = covMap(PcaWarehouse.cov(spark, path))
    PcaWarehouse.compact(spark, path)
    assert(graft.sources.CommitLog.snapshot(spark, path).read(path).count() == 2145)
    assert(covMap(PcaWarehouse.cov(spark, path)) == before)
    // idempotent
    PcaWarehouse.compact(spark, path)
    assert(covMap(PcaWarehouse.cov(spark, path)) == before)
  }

  test("ANN leg: frozen projection bit-equality, dup at projection-distance 0, exact stage 2") {
    import org.apache.spark.sql.functions.pmod
    val path = tmp("ann")
    val e = graft.sources.Tables(spark, Dir).embeddings
    PcaWarehouse.materialize(spark, Dir, path)
    PcaWarehouse.trainProjector(spark, path)
    PcaWarehouse.refreshAnn(spark, e.filter(pmod(col("vec_id"), lit(10L)) < 8), path)
    PcaWarehouse.refreshAnn(spark, e.filter(pmod(col("vec_id"), lit(10L)) >= 8), path)
    // plant an exact duplicate of vec 0 as a refreshed-in newcomer:
    // the frozen projector must map identical input to the identical
    // projection (the index-level "duplicate sits at distance 0")
    val dup = e.filter(col("vec_id") === 0)
      .select((col("vec_id") + 99999L).as("vec_id"), col("embedding"))
    PcaWarehouse.refreshAnn(spark, dup, path)
    val proj = graft.sources.CommitLog.snapshot(spark, path)
      .read(path + ".proj").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(proj(99999L) == proj(0L), "duplicate projection differs from original")

    // standing refreshed rows are bit-equal to a frozen re-projection
    val again = PcaWarehouse.projectWith(
      e.filter(pmod(col("vec_id"), lit(10L)) >= 8),
      PcaWarehouse.projector(spark, path)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    again.foreach { case (id, p) =>
      assert(proj(id) == p, s"vec $id projection drifted from frozen") }

    // stage 2 emits the EXACT rounded cosine for every id it returns
    val r = PcaWarehouse.annProbe(spark, Dir, path).collect()
    assert(r.length == 10 && r.map(_.getLong(0)).distinct.length == 10)
    val exact = {
      import graft.functions.Exact.roundx
      import graft.functions.VectorFunctions._
      import org.apache.spark.sql.functions.broadcast
      val ev = e.select(col("vec_id"), toDouble(col("embedding")).as("v"))
      val q = ev.filter(col("vec_id") === 0)
        .select(col("v").as("qv"), norm(col("v")).as("qnrm"))
      ev.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
        .select(col("vec_id"),
          roundx(dot(col("v"), col("qv")) / (norm(col("v")) * col("qnrm")), 6).as("cos"))
        .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    }
    r.foreach(x => assert(exact(x.getLong(0)) == x.getDouble(1),
      s"vec ${x.getLong(0)}: probe ${x.getDouble(1)} vs exact ${exact(x.getLong(0))}"))
  }


  test("at-rest PCA monitor row: maintained index graded on its own serving verb (r15)") {
    val rows = SparkEntry.queries("s_knn_recall_report_pca")(spark, Dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("method") == "pca_warehouse_topk")
    // the cross-cutting retraction takes query id 4 with it — the
    // monitor's domain visibly SHRINKS (the ivf/pq contract here too)
    assert(r.getAs[Long]("n_queries") == 9L)
    assert(r.getAs[Long]("truth_n") > 0L)
    val rec = r.getAs[Double]("recall")
    assert(rec >= 0.0 && rec <= 1.0)
    assert(r.getAs[Long]("matched") <= r.getAs[Long]("truth_n"))
    val again = SparkEntry.queries("s_knn_recall_report_pca")(spark, Dir).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("batched serving probe == single-query annProbe; stage 2 broadcasts (r15)") {
    import graft.functions.VectorFunctions.toDouble
    val path = PcaWarehouse.builtAnnPath(spark, Dir)
    val e = graft.sources.Tables(spark, Dir).embeddings
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val queries = e.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val single = PcaWarehouse.annProbe(spark, Dir, path).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val slice = PcaWarehouse.annProbeBatch(spark, path, queries, vectors = e)
      .collect().sortBy(_.getAs[Long]("rnk"))
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq
    assert(slice == single, s"batch/single divergence:\n b=$slice\n s=$single")
    // plan pin (the r15 PQ discipline): with auto-broadcast disabled,
    // only the explicit hints can plan broadcasts — a shuffle join
    // anywhere means the primary store would be shuffle-written to
    // fetch a |Q|*Shortlist-row fetch list
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = PcaWarehouse.annProbeBatch(spark, path, queries, vectors = e)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        plan.take(3000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }

  test("annProbe drops outstanding ANN tombstones; bit-invariant through compactAnn (r15 review)") {
    val s2 = spark
    import s2.implicits._
    val path = tmp("annretract")
    val docs = graft.sources.Tables(spark, Dir).embeddings
    PcaWarehouse.materializeFrom(docs, path)
    PcaWarehouse.trainProjector(spark, path)
    PcaWarehouse.refreshAnn(spark, docs, path)
    val before = PcaWarehouse.annProbe(spark, Dir, path).collect()
      .map(_.getLong(0)).toSeq
    // take down three of the current served answers — the probe must
    // stop returning them IMMEDIATELY (between retractAnn and
    // compactAnn), the retractAnn contract the review caught annProbe
    // breaking while annProbeBatch honored it
    val removed = before.take(3)
    PcaWarehouse.retractAnn(removed.toDF("vec_id"), path)
    val after = PcaWarehouse.annProbe(spark, Dir, path).collect()
      .map(_.toSeq).toSeq
    assert(removed.forall(id => !after.exists(_.head == id)),
      s"taken-down vectors still served: $after")
    // and the single-query probe agrees with the batched serving verb
    // on the SAME retracted state
    import graft.functions.VectorFunctions.toDouble
    val e = docs.select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val queries = e.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val batch = PcaWarehouse.annProbeBatch(spark, path, queries, vectors = e)
      .collect().sortBy(_.getAs[Long]("rnk"))
      .map(r => Seq(r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq
    assert(after.map(_.take(2)) == batch, "batch/single divergence under tombstones")
    // physical purge changes nothing the probe serves
    PcaWarehouse.compactAnn(spark, path)
    assert(PcaWarehouse.annProbe(spark, Dir, path).collect()
      .map(_.toSeq).toSeq == after, "compactAnn perturbed the probe")
  }

  test("gated reproject SWAPS on non-regression: the staged projector serves (r15 ask #2)") {
    import graft.functions.VectorFunctions.toDouble
    // the registered drifted shape: projector frozen on BASE moments,
    // incoming projected through it, moments kept current, retract,
    // compact — then the gate re-fits from the CURRENT moments
    val path = tmp("gateswap")
    val docs = graft.sources.Tables(spark, Dir).embeddings
    val isBase = pmod(col("vec_id"), lit(10L)) < 8
    val isGone = pmod(col("vec_id"), lit(13L)) === 4
    PcaWarehouse.materializeFrom(docs.filter(isBase), path)
    PcaWarehouse.trainProjector(spark, path)
    PcaWarehouse.refreshAnn(spark, docs.filter(isBase), path)
    PcaWarehouse.refreshAnn(spark, docs.filter(!isBase), path)
    PcaWarehouse.refresh(spark, docs.filter(!isBase), path)
    PcaWarehouse.retractAnn(docs.filter(isGone).select(col("vec_id")), path)
    PcaWarehouse.retract(spark, docs.filter(isGone), path)
    PcaWarehouse.compactAnn(spark, path)
    val projBefore = PcaWarehouse.projector(spark, path)
    val g = PcaWarehouse.reprojectIfBetter(spark, path, Dir)
    assert(g.swapped, s"gate refused a non-regression: $g")
    assert(g.recallStaged >= g.recallStanding)
    // the swap SHIPPED: the stored projector moved to the candidate...
    assert(PcaWarehouse.projector(spark, path) != projBefore,
      "swap must replace the frozen projector")
    // ...and the standing projections are its frozen re-projection of
    // the surviving vectors, bit for bit
    val survivors = docs.join(
      PcaWarehouse.standingProjIds(spark, path), Seq("vec_id"))
    val expected = PcaWarehouse.projectWith(survivors,
        PcaWarehouse.projector(spark, path))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSet
    val got = graft.sources.CommitLog.snapshot(spark, path)
      .read(s"$path.proj")
      .collect().map(r => (r.getAs[Long]("vec_id"),
        r.getSeq[Double](r.fieldIndex("p")))).toSet
    assert(got == expected, "staged projections are not the frozen re-projection")
    // the serving path re-grades at the staged value
    val regrade = graft.similarity.RecallMonitor.pcaRow(spark, path, Dir)
      .head().getAs[Double]("recall")
    assert(regrade == g.recallStaged)
    // staging retired
    val stSnap = graft.sources.CommitLog.snapshot(spark, s"$path.staged")
    assert(stSnap.readOpt(s"$path.staged.components").isEmpty &&
      stSnap.readOpt(s"$path.staged.proj").isEmpty)
  }

  test("gated reproject HOLDS on regression: standing state untouched (r15 ask #2)") {
    import graft.functions.VectorFunctions.toDouble
    // the hold construction: hand the STANDING index more information
    // than any R-dim re-projection can carry — its "projections" are
    // the full NORMALIZED vectors, so stage-1 L2 ranks exactly by
    // cosine and shortlist misses vanish (recall 1.0 at any depth).
    // The candidate 16-dim re-projection at a tight serving shortlist
    // must lose some truth pairs — and the gate must refuse it.
    val path = tmp("gatehold")
    val docs = graft.sources.Tables(spark, Dir).embeddings
    PcaWarehouse.materializeFrom(docs, path)
    PcaWarehouse.trainProjector(spark, path)
    PcaWarehouse.refreshAnn(spark, docs, path)
    import graft.functions.VectorFunctions.norm
    val full = docs.select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
      .select(col("vec_id"), transform(col("v"), x => x / col("nrm")).as("p"))
    graft.sources.CommitLog.transaction(spark, path)(
      _.replace(full, s"$path.proj"))
    def state() = {
      val snap = graft.sources.CommitLog.snapshot(spark, path)
      (snap.read(s"$path.proj").collect().map(_.toSeq).toSet,
        snap.read(s"$path.components").collect().map(_.toSeq).toSet)
    }
    val before = state()
    val g = PcaWarehouse.reprojectIfBetter(spark, path, Dir, shortlistN = 8)
    assert(!g.swapped, s"gate shipped a recall regression: $g")
    assert(g.recallStanding == 1.0,
      s"premise lost — exact-cosine stage 1 no longer recalls 1.0: $g")
    assert(g.recallStaged < g.recallStanding,
      s"premise lost — the 16-dim shortlist no longer misses at depth 8: $g")
    assert(state() == before, "no-swap must leave the standing state untouched")
  }

  test("registered reproject row: verdict consistent with its own recalls (r15)") {
    val r = SparkEntry.queries("s_knn_reproject_gated")(spark, Dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[String]("method") == "pca_reproject_gate")
    assert(row.getAs[Long]("truth_n") > 0L)
    assert(row.getAs[Boolean]("swapped") ==
      (row.getAs[Double]("recall_staged") >= row.getAs[Double]("recall_standing")),
      s"verdict contradicts its own recalls: $row")
    val again = SparkEntry.queries("s_knn_reproject_gated")(spark, Dir).collect()
    assert(r.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("projector retention drill: vacuum reclaims retired versions; as-of behind is loud (r15 ask #6)") {
    val path = tmp("retention")
    val docs = graft.sources.Tables(spark, Dir).embeddings
    val isBase = pmod(col("vec_id"), lit(10L)) < 8
    PcaWarehouse.materializeFrom(docs.filter(isBase), path)
    PcaWarehouse.trainProjector(spark, path)   // projector v1 (replace)
    PcaWarehouse.refreshAnn(spark, docs.filter(isBase), path)
    val v1gen = graft.sources.CommitLog.history(spark, path).collect()
      .filter(r => r.getAs[String]("part") == ".components")
      .map(_.getAs[Long]("gen")).min
    // moments move, v2 ships: a replace generation supersedes v1 for
    // EVERY reader — projector versions ride the generation fold, so
    // retention needs no extra verb (the rebase/retire drill is the
    // tokenizer's; replace-committed artifacts get it for free)
    PcaWarehouse.refresh(spark, docs.filter(!isBase), path)
    PcaWarehouse.trainProjector(spark, path)   // projector v2 (replace)
    val v2 = PcaWarehouse.projector(spark, path)
    assert(v2 != Nil)
    graft.sources.CommitLog.vacuum(spark, path)
    // the head serves v2 bit-identically after physical reclaim
    assert(PcaWarehouse.projector(spark, path) == v2)
    // replace retention holds for as-of readers too: v1's generation
    // is dead for EVERY cut (the vacuum-safe time-travel contract), so
    // the behind-horizon read fails LOUDLY instead of serving a
    // reclaimed or ghost projector
    val snap = graft.sources.CommitLog.snapshot(spark, path)
    assert(snap.readOpt(s"$path.components", asOfGen = v1gen).isEmpty)
    intercept[IllegalStateException](
      snap.read(s"$path.components", asOfGen = v1gen))
    // and the v1 directory itself is physically reclaimed
    assert(!new java.io.File(s"$path.components/gen-$v1gen").exists())
  }

  test("streaming refresh: any batching folds to the one-shot index, bit for bit") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val path = tmp("stream")
    val e = graft.sources.Tables(s, Dir).embeddings
    val rows = e.collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val stream = MemoryStream[(Long, Seq[Float])]
    val query = PcaWarehouse.streamingRefresh(stream.toDF()
      .withColumnRenamed("_1", "vec_id").withColumnRenamed("_2", "embedding"), path)
    try {
      val (b1, b2) = rows.splitAt(rows.length / 3)
      stream.addData(b1.toIndexedSeq)
      query.processAllAvailable()
      stream.addData(b2.toIndexedSeq)
      query.processAllAvailable()
    } finally query.stop()
    // associativity is the whole contract: the streamed index must
    // serve the identical covariance to the inline one-shot
    assert(covMap(PcaWarehouse.cov(spark, path)) == covMap(Pca.covFrom(e)))
  }

  test("RETRACT: negated moments == rebuild-on-survivors covariance, bit-for-bit") {
    val emb = sources.Tables(spark, Dir).embeddings
    val retracted = java.nio.file.Files
      .createTempDirectory("graft-pw-retr-").resolve("m").toString
    graft.similarity.PcaWarehouse.materializeFrom(
      emb.filter(pmod(col("vec_id"), lit(10L)) < 8), retracted)
    graft.similarity.PcaWarehouse.refresh(spark,
      emb.filter(pmod(col("vec_id"), lit(10L)) >= 8), retracted)
    graft.similarity.PcaWarehouse.retract(spark,
      emb.filter(pmod(col("vec_id"), lit(3L)) === 0), retracted)
    val rebuilt = java.nio.file.Files
      .createTempDirectory("graft-pw-rebuilt-").resolve("m").toString
    graft.similarity.PcaWarehouse.materializeFrom(
      emb.filter(pmod(col("vec_id"), lit(3L)) =!= 0), rebuilt)
    def covRows(p: String): Set[Seq[Any]] =
      graft.similarity.PcaWarehouse.cov(spark, p).collect().map(_.toSeq).toSet
    val r = covRows(retracted)
    assert(r.nonEmpty && r == covRows(rebuilt),
      "retracted covariance diverges from the rebuild on survivors — " +
        "the exact-forgetting claim fails")
  }
}
