package graft

import org.apache.spark.sql.functions._

/** Scale-technique specs: salting equivalence and bucketed co-located
  * joins (plan-shape assertions, not just results). */
class ScaleSpec extends GraftSpec {

  test("salted sum equals direct sum") {
    val t = sources.Tables(spark, Dir)
    val direct = t.events.groupBy(col("event_type").as("key"))
      .agg(sum(col("value")).as("total"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (math.rint(r.getDouble(1) * 100) / 100, r.getLong(2))).toMap
    val salted = operators.Skew.saltedSum(t.events, col("event_type"), col("value"), 8)
      .collect().map(r => r.getString(0) -> (math.rint(r.getDouble(1) * 100) / 100, r.getLong(2))).toMap
    assert(salted == direct)
  }

  test("q_txvol_salted: bit-equal to the unsalted plan, invariant across salt counts") {
    // the registered salted twin's whole point: DECIMAL partials make
    // the two-phase rollup hash-identical to one groupBy at ANY salts
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    val t = sources.Tables(spark, Dir)
    val unsalted = rows(t.events
      .groupBy(col("event_type").as("denom"))
      .agg(graft.functions.Exact.roundx(
          sum(col("value").cast("decimal(30,6)")).cast("double"), 4).as("tx_volume"),
        count(lit(1)).as("n_events")))
    val salted8 = rows(operators.Skew.saltedVolume(spark, Dir, salts = 8))
    val salted3 = rows(operators.Skew.saltedVolume(spark, Dir, salts = 3))
    assert(salted8 == unsalted, "salted(8) diverges from the unsalted aggregate")
    assert(salted3 == unsalted, "salted(3) diverges from the unsalted aggregate")
  }

  test("salted join equals direct join") {
    val t = sources.Tables(spark, Dir)
    val small = t.nation.select(col("n_nationkey").as("c_nationkey"), col("n_name"))
    val direct = t.customer.join(small, Seq("c_nationkey"))
      .select("c_custkey", "n_name").collect().map(_.toSeq).toSet
    val salted = operators.Skew.saltedJoin(t.customer, small, "c_nationkey", 4)
      .select("c_custkey", "n_name").collect().map(_.toSeq).toSet
    assert(salted == direct)
  }

  test("registered salted-join volume is salt-count invariant (the oracle's claim)") {
    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet
    val s8 = rows(operators.Skew.saltedJoinVolume(spark, Dir, salts = 8))
    val s3 = rows(operators.Skew.saltedJoinVolume(spark, Dir, salts = 3))
    assert(s8 == s3, "salted-join volume differs across salt counts")
    assert(s8.nonEmpty && s8.forall(_.size == 3))
  }

  test("asof join: every window is partitioned; no nested-loop join") {
    import org.apache.spark.sql.execution.window.WindowExec
    val df = operators.Olap.asofJoin(spark, Dir)
    val plan = df.queryExecution.sparkPlan
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"unpartitioned window in asof plan:\n$w"))
    // the fact-side probe must be a hash join on the hour bucket; the
    // only nested-loop allowed is the single-row max_us cross join
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val bnljs = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
    bnljs.foreach { j =>
      assert(j.joinType.toString == "Cross" || j.condition.isEmpty,
        s"range-predicate nested-loop join in asof plan:\n$j")
    }
  }

  test("q3 build side broadcasts at test scale (size-guarded hint applied)") {
    val plan = operators.Olap.q3ShippingPriority(spark, Dir)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast joins at test scale:\n${plan.take(2000)}")
  }

  test("IVF warehouse: probe is a partition-pruned scan with ivfAnn's results") {
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_").toString + "/lists"
    similarity.IvfWarehouse.materialize(spark, Dir, path)
    val qv = sources.Tables(spark, Dir).embeddings
      .filter(col("vec_id") === 0).head()
      .getSeq[Float](1).map(_.toDouble).toArray
    val probe = similarity.IvfWarehouse.probe(spark, path, qv, nprobe = 4, k = 11)
    // the scan must prune cid partitions (read nprobe lists, not K)
    val physical = probe.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters") && physical.contains("cid"),
      s"expected cid partition pruning, got:\n${physical.take(2000)}")
    val rows = probe.collect().filter(_.getAs[Long]("vec_id") != 0L).take(10)
    assert(rows.map(_.getAs[Int]("cid")).distinct.length <= 4)
    // identical quantizer + identical probe set => identical results to
    // the inline ivfAnn plan
    val inline = similarity.Knn.ivfAnn(spark, Dir).collect()
    assert(rows.map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq ==
      inline.map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq)
  }

  test("IVF warehouse: recluster repairs cost, keeps rows, probes still prune") {
    val path = java.nio.file.Files.createTempDirectory("graft_ivfr_").toString + "/lists"
    similarity.IvfWarehouse.materialize(spark, Dir, path)
    def idsAtRest() = sources.CommitLog.snapshot(spark, path).read(path)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val before = idsAtRest()
    val (costBefore, costAfter) = similarity.IvfWarehouse.recluster(spark, path)
    // Lloyd from a warm start must not worsen the mean assignment
    // distance (fixed data; each round reassigns-then-recenters)
    assert(costAfter <= costBefore + 1e-9,
      s"recluster worsened cost: $costBefore -> $costAfter")
    // every vector survives the rewrite
    assert(idsAtRest() == before)
    // the rewritten layout still serves pruned probes
    val qv = sources.Tables(spark, Dir).embeddings
      .filter(col("vec_id") === 0).head()
      .getSeq[Float](1).map(_.toDouble).toArray
    val probe = similarity.IvfWarehouse.probe(spark, path, qv, nprobe = 4, k = 10)
    val physical = probe.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters") && physical.contains("cid"))
    assert(probe.count() == 10)
  }

  test("gated recluster HOLDS on recall regression: standing state untouched") {
    // the registered drifted shape: base ingest, frozen-quantizer
    // refresh, cross-cutting retract, compact — measured on this
    // corpus: the re-fit improves assignment cost while REGRESSING
    // serving recall, exactly the two-objective trap the gate exists
    // for (VERDICT r13 ask #1)
    val path = java.nio.file.Files.createTempDirectory("graft_gate_hold_").toString + "/lists"
    val e = sources.Tables(spark, Dir).embeddings
      .select(col("vec_id"),
        graft.functions.VectorFunctions.toDouble(col("embedding")).as("v"))
    similarity.IvfWarehouse.materializeFrom(
      e.filter(pmod(col("vec_id"), lit(10L)) < 8), path)
    similarity.IvfWarehouse.refresh(spark,
      e.filter(pmod(col("vec_id"), lit(10L)) >= 8), path)
    similarity.IvfWarehouse.retract(
      e.filter(pmod(col("vec_id"), lit(13L)) === 4).select(col("vec_id")), path)
    similarity.IvfWarehouse.compact(spark, path)
    def state() = {
      val snap = sources.CommitLog.snapshot(spark, path)
      (snap.read(path).collect().map(r => (r.getAs[Long]("vec_id"),
          r.getAs[Int]("cid"))).sorted.toSeq,
        snap.read(s"$path.centroids").collect()
          .map(r => (r.getAs[Int]("cid"), r.getSeq[Double](r.fieldIndex("cv"))))
          .sortBy(_._1).toSeq)
    }
    val before = state()
    val g = similarity.IvfWarehouse.reclusterIfBetter(spark, path)
    assert(!g.swapped, s"gate shipped a recall regression: $g")
    assert(g.recallStaged < g.recallStanding,
      s"premise lost — the drifted corpus no longer regresses: $g")
    // the trap itself: assignment cost IMPROVED while recall fell —
    // a cost-gated swap would have shipped the worse codebook
    assert(g.costAfter <= g.costBefore + 1e-9, s"cost did not improve: $g")
    // hold means HOLD: lists and codebook bit-identical to pre-verb
    assert(state() == before, "no-swap must leave the standing state untouched")
    // the serving path still grades at the standing recall
    val regrade = similarity.RecallMonitor.ivfRow(spark, path, 10, 5).head()
    assert(regrade.getAs[Double]("recall") == g.recallStanding)
    // the staging base is retired (cleared; vacuum reclaims later)
    val stSnap = sources.CommitLog.snapshot(spark, s"$path.staged")
    assert(stSnap.readOpt(s"$path.staged").isEmpty &&
      stSnap.readOpt(s"$path.staged.centroids").isEmpty,
      "staging base must be cleared after the verdict")
  }

  test("gated recluster SWAPS on improvement: the staged codebook serves") {
    // the repair-needed state, constructed deterministically: a
    // correctly fitted codebook whose POSTING LISTS were scrambled
    // (cid := vec_id mod K — the maintenance-bug analogue of drift's
    // endpoint: co-location gone, codebook fine).  Standing probes
    // read nprobe/K lists of unrelated vectors; the re-fit
    // warm-starts from the good centroids and reassigns every row,
    // so the staged state restores co-location and the gate must
    // ship it.
    val path = java.nio.file.Files.createTempDirectory("graft_gate_swap_").toString + "/lists"
    similarity.IvfWarehouse.materialize(spark, Dir, path)
    val snap0 = sources.CommitLog.snapshot(spark, path)
    sources.CommitLog.transaction(spark, path)(
      _.replace(snap0.read(path)
        .withColumn("cid", pmod(col("vec_id"), lit(16L)).cast("int")),
        path, Seq("cid")))
    val scrambled = similarity.RecallMonitor.ivfRow(spark, path, 10, 5)
      .head().getAs[Double]("recall")
    val g = similarity.IvfWarehouse.reclusterIfBetter(spark, path)
    assert(g.recallStanding == scrambled)
    assert(g.swapped, s"gate refused an improvement: $g")
    assert(g.recallStaged >= g.recallStanding)
    assert(g.recallStaged > scrambled,
      s"premise lost — the re-fit did not improve the scrambled state: $g")
    // the swap SHIPPED: the serving path now grades at the staged value
    val regrade = similarity.RecallMonitor.ivfRow(spark, path, 10, 5).head()
    assert(regrade.getAs[Double]("recall") == g.recallStaged)
    // and still serves pruned probes off the rewritten layout
    val qv = sources.Tables(spark, Dir).embeddings
      .filter(col("vec_id") === 0).head()
      .getSeq[Float](1).map(_.toDouble).toArray
    val physical = similarity.IvfWarehouse.probe(spark, path, qv, nprobe = 4, k = 10)
      .queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters") && physical.contains("cid"))
  }

  test("IVF warehouse: batched probe == per-query probe, one pruned union scan") {
    val path = java.nio.file.Files.createTempDirectory("graft_ivfb_").toString + "/lists"
    similarity.IvfWarehouse.materialize(spark, Dir, path)
    val queries = sources.Tables(spark, Dir).embeddings
      .filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"),
        graft.functions.VectorFunctions.toDouble(col("embedding")).as("qv"))
    val batch = similarity.IvfWarehouse
      .probeBatch(spark, path, queries, nprobe = 4, k = 10)
    // union scan still prunes cid partitions; top-k pushes below shuffle
    val physical = batch.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters") && physical.contains("cid"))
    assert(physical.contains("WindowGroupLimit"))
    val rows = batch.collect()
    // each query's slice must equal its single-query probe, row for row
    (0L until 3L).foreach { q =>
      val qv = sources.Tables(spark, Dir).embeddings
        .filter(col("vec_id") === q).head()
        .getSeq[Float](1).map(_.toDouble).toArray
      val single = similarity.IvfWarehouse.probe(spark, path, qv, nprobe = 4, k = 10)
        .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq
      val slice = rows.filter(_.getAs[Long]("query_id") == q)
        .sortBy(_.getAs[Long]("rnk"))
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq
      assert(slice == single, s"query $q batch/single divergence")
    }
  }

  test("bucketed fact-fact join plans without Exchange") {
    sources.Warehouse.bucketize(spark, Dir, 4)
    val joined = sources.Warehouse.colocatedOrderRevenue(spark)
    val physical = joined.queryExecution.executedPlan.toString
    assert(!physical.contains("Exchange"),
      s"expected shuffle-free co-located join, got:\n${physical.take(2000)}")
    // and it computes the same revenue as the unbucketed path
    val n = joined.count()
    assert(n > 0)
    val direct = sources.Tables(spark, Dir).orders.join(
        sources.Tables(spark, Dir).lineitem,
        col("o_orderkey") === col("l_orderkey"))
      .select(countDistinct(col("o_orderkey"))).head().getLong(0)
    assert(n == direct)
  }

  test("bucketize survives a stale table location left by a dead session") {
    sources.Warehouse.bucketize(spark, Dir, 4)
    // simulate the dead session: catalog entries gone, location dirs
    // left behind with junk files (the state CREATE TABLE refuses)
    spark.sql("DROP TABLE lineitem_b")
    spark.sql("DROP TABLE orders_b")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val conf = spark.sparkContext.hadoopConfiguration
    Seq("lineitem_b", "orders_b").foreach { n =>
      val p = new org.apache.hadoop.fs.Path(wh, n)
      val fs = p.getFileSystem(conf)
      fs.mkdirs(p)
      val out = fs.create(new org.apache.hadoop.fs.Path(p, "stale-junk"))
      out.write(1); out.close()
    }
    // must clear the stale locations (Hadoop FS rung) and rebuild
    sources.Warehouse.bucketize(spark, Dir, 4)
    assert(sources.Warehouse.colocatedOrderRevenue(spark).count() > 0)
  }
}
