package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.functions.Exact.roundx
import graft.sources.{CommitLog, Tables, Tombstones}

/** IVF at rest: the billion-scale ANN layout (Jégou et al. / FAISS IVF)
  * made concrete as a table layout — embeddings written PARTITIONED BY
  * their coarse-centroid id, so a query plans a partition-pruned scan
  * of only its nprobe posting lists instead of the whole corpus.
  * `Knn.ivfAnn` computes the same thing inline per query; at 100 TB the
  * assignment runs once at ingest (this writer) and every probe reads
  * nprobe/K of the data — `IvfWarehouseSpec` asserts the pruned scan.
  */
object IvfWarehouse {

  /** Ingest: assign every embedding to its coarse centroid and write
    * posting lists as cid-partitioned parquet; centroids land next to
    * the table (tiny — K rows) for probe-time list selection. */
  def materialize(spark: SparkSession, dir: String, path: String, k: Int = 16): Unit =
    materializeFrom(Tables(spark, dir).embeddings
      .select(col("vec_id"), toDouble(col("embedding")).as("v")), path, k)

  /** Frame-level ingest (e = (vec_id, v)) — shared with the refresh
    * specs. */
  def materializeFrom(e: DataFrame, path: String, k: Int = 16): Unit = {
    val (centroids, lists) = Knn.coarseQuantizer(e, k)
    // lists + centroids land as ONE transaction (r11): posting rows
    // can never be visible without the codebook that assigned them
    CommitLog.transaction(e.sparkSession, path) { t =>
      t.replace(lists, path, Seq("cid"))
      t.replace(centroids, centroidsPath(path))
    }
  }

  /** REFRESH — fold new vectors into the posting lists at rest: assign
    * the batch to the FROZEN stored centroids (bit-identical to the
    * assignment that produced the standing lists) and append to the
    * cid partitions.  This is FAISS's add-with-frozen-coarse-quantizer
    * contract; distribution drift is the existing `recluster`
    * maintenance pass's job, on its own schedule.  O(batch): K-row
    * centroid broadcast, no standing row read or rewritten. */
  def refresh(spark: SparkSession, batch: DataFrame, path: String): Unit = {
    val done = refreshTxn(spark, batch, path, batchId = None)
    assert(done, "unreachable: un-id'd refreshes never skip")
  }

  /** The refresh transaction body, optionally committing a STREAM
    * BATCH ID atomically with the posting rows — the exactly-once
    * rung (StreamTwin; round 14 extends the twin matrix to the ANN
    * family).  Frozen-quantizer assignment is per-row, so any
    * micro-batch split folds to the same posting lists — refresh is
    * batching-invariant by construction. */
  private[graft] def refreshTxn(spark: SparkSession, batch: DataFrame,
      path: String, batchId: Option[Long]): Boolean =
    graft.sources.StreamTwin.refreshTxnWith(spark, path, batchId) { t =>
      t.append(Knn.assignTo(batch,
        CommitLog.snapshot(spark, path).read(centroidsPath(path))),
        path, Seq("cid"))
    }

  /** The refresh's ONLINE twin at the exactly-once rung: vectors
    * arrive as a (vec_id, embedding) stream, each micro-batch
    * coarse-assigns under the FROZEN stored centroids and appends in
    * one transaction that also commits the engine batch id — a
    * redelivered committed batch folds nothing even when the external
    * marker was lost.  The index must be materialized first (the
    * frozen quantizer IS the standing state a refresh needs). */
  def streamingRefresh(raw: DataFrame, path: String,
      checkpointEvery: Int = 32): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.functions.VectorFunctions.toDouble
    graft.sources.StreamTwin.exactlyOnce(raw, path, checkpointEvery)((s, b, id) =>
      { refreshTxn(s, b.select(col("vec_id"), toDouble(col("embedding")).as("v")),
          path, batchId = Some(id)); () })
  }

  private def centroidsPath(path: String): String = s"$path.centroids"
  private def tombPath(path: String): String = s"$path.tomb"

  /** RETRACT — takedown of vectors from the IVF posting lists
    * (round 11, VERDICT-r10 ask #6: the ANN delete verb extended from
    * the LSH family to the coarse-quantized one).  Same tombstone
    * rung as LshWarehouse.retract: every posting row depends only on
    * its own vector — the FROZEN coarse codebook is corpus-level
    * state, but deleting a member does not change it (FAISS's
    * remove_ids contract: ids leave the inverted lists; the quantizer
    * re-trains on its own recluster schedule) — so pruning IS the
    * rebuild-on-survivors-under-frozen-quantizer.  O(removed) append;
    * probes drop tombstoned candidates on the already-pruned nprobe
    * candidate set (O(candidates), never O(index)); compact
    * physically purges the lists.  IvfWarehouseSpec pins probe-after-
    * retract == probe over lists assigned from the survivors with the
    * same frozen centroids, and bit-invariance across compact. */
  def retract(removedIds: DataFrame, path: String): Unit =
    CommitLog.transaction(removedIds.sparkSession, path)(
      _.append(removedIds.select(col("vec_id")), tombPath(path)))

  /** COMPACT — physically purge tombstoned vectors from the posting
    * lists and clear the tombstones in one transaction (the shared
    * CommitLog.purgeTombstones); probes bit-identical; vacuum is the
    * caller's retention verb. */
  def compact(spark: SparkSession, path: String): Unit =
    CommitLog.purgeTombstones(spark, path, tombPath(path), "vec_id",
      Seq(path -> Seq("cid")), foldStreamIds = true)

  /** Drop tombstoned vectors from a candidate set — O(candidates);
    * the no-tomb path keeps its exact old plan. */
  private def live(snap: CommitLog.Snapshot, cands: DataFrame, path: String): DataFrame =
    Tombstones.dropDf(cands, snap.readOpt(tombPath(path)),
      key = "vec_id", tombCol = "vec_id")

  /** The SURVIVING vectors at rest (vec_id, v) — the posting lists
    * minus outstanding tombstones: the population a probe can serve,
    * which is exactly the population the at-rest recall monitor must
    * grade ground truth over (RecallMonitor). */
  private[similarity] def standingVectors(spark: SparkSession, path: String): DataFrame = {
    val snap = CommitLog.snapshot(spark, path)
    live(snap, snap.read(path), path).select(col("vec_id"), col("v"))
  }

  /** The frozen coarse codebook at rest — shared with the SemDeDup
    * probe (cluster-pruned sweeps assign against exactly the centroids
    * that produced the standing posting lists). */
  private[graft] def centroids(spark: SparkSession, path: String): DataFrame =
    CommitLog.snapshot(spark, path).read(centroidsPath(path))

  /** Probe: rank centroids against the query vector, then top-k exact
    * cosine over ONLY the nprobe nearest posting lists.  Selecting the
    * lists is driver-side METADATA work (bounded by K centroids, like
    * any partition-pruning predicate build) — the literal `isin` filter
    * is what lets the scan prune cid partitions; the data path stays
    * fully distributed. */
  def probe(spark: SparkSession, path: String, qv: Array[Double],
      nprobe: Int = 4, k: Int = 10): DataFrame = {
    val snap = CommitLog.snapshot(spark, path)
    val qvCol = typedLit(qv.toSeq).cast("array<double>")
    val probeCids = snap.read(centroidsPath(path))
      .select(col("cid"),
        (-dot(col("cv"), qvCol) / norm(col("cv"))).as("dist"))
      .orderBy(col("dist"), col("cid")).limit(nprobe)
      .collect().map(_.getAs[Int]("cid"))
    live(snap, snap.read(path)
      .filter(col("cid").isin(probeCids.toIndexedSeq.map(Integer.valueOf): _*)), path)
      .withColumn("cos", roundx(dot(col("v"), qvCol) / (norm(col("v")) * norm(qvCol)), 6))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("cos").as("cosine"), col("cid"))
  }

  /** MAINTENANCE: re-fit the coarse quantizer to the index's CURRENT
    * contents and rewrite the posting lists — the drift repair every
    * IVF deployment schedules (FAISS re-trains when the ingest
    * distribution wanders from the one the centroids were fit on;
    * skewed posting lists are the symptom: probes over-read fat lists
    * and recall sags on thin ones).
    *
    * Reads ONLY the warehouse (vectors already at rest — the source
    * corpus is not re-scanned), runs `rounds` Lloyd refinements
    * SEEDED FROM THE STORED CENTROIDS (warm start: drift repair, not
    * re-training from scratch), rewrites lists + centroids in place.
    * Per round: one broadcast-K assignment pass + one mean update
    * bounded by K×dims groups — the coarseQuantizer shapes.  Returns
    * (cost_before, cost_after) mean-assignment-distance telemetry —
    * two driver scalars, the Kmeans-history pattern.
    * (IvfWarehouseSpec asserts cost non-increase, row preservation,
    * and that probes still prune after the rewrite.)
    *
    * DEMOTED to a MECHANISM, not a deployment verb (VERDICT r13):
    * cost non-increase is mathematical, but assignment cost and
    * serving RECALL are different objectives — the drift-repair
    * exhibit measured this verb improving cost while regressing
    * recall 0.8222 → 0.7333 on the drifted corpus.  An operator
    * repairing a production index must use `reclusterIfBetter`, which
    * stages this same re-fit, grades it against brute truth, and
    * refuses to ship a regression; this in-place form remains for the
    * monitor's before/after exhibits and for callers that own their
    * own gate. */
  def recluster(spark: SparkSession, path: String, rounds: Int = 2): (Double, Double) = {
    val (fin, cents, costBefore, costAfter) = refit(spark, path, rounds)
    CommitLog.transaction(spark, path) { t =>
      t.replace(fin.select(col("vec_id"), col("v"), col("cid")), path, Seq("cid"))
      t.replace(cents, centroidsPath(path))
    }
    // physical reclaim stays the caller's separate vacuum (review r11:
    // inline vacuum tears pinned concurrent probe snapshots)
    (costBefore, costAfter)
  }

  /** The re-fit itself, UNCOMMITTED — compacts, warm-starts Lloyd from
    * the stored centroids, and returns (reassigned lists, new
    * centroids, cost_before, cost_after) as pinned frames for the
    * caller to commit (`recluster`, in place) or stage and grade
    * (`reclusterIfBetter`). */
  private def refit(spark: SparkSession, path: String,
      rounds: Int): (DataFrame, DataFrame, Double, Double) = {
    compact(spark, path) // retire outstanding tombstones: the re-fit must see survivors only
    val snap0 = CommitLog.snapshot(spark, path)
    val e = snap0.read(path)
      .select(col("vec_id"), col("v")).localCheckpoint() // pinned input of the re-fit
    def assigned(c: DataFrame): DataFrame =
      e.crossJoin(broadcast(c))
        .withColumn("dist", -dot(col("v"), col("cv")) / (norm(col("v")) * norm(col("cv"))))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("dist"), col("cid"))).as("best"), first(col("v")).as("v"))
        .select(col("vec_id"), col("v"),
          col("best.cid").as("cid"), col("best.dist").as("dist"))
    var cents = snap0.read(centroidsPath(path)).localCheckpoint()
    val costBefore = assigned(cents).agg(avg(col("dist"))).head.getDouble(0)
    for (_ <- 1 to rounds) {
      // SPHERICAL update: assignment above scores -cosine, so the
      // minimizing centroid direction is the mean of the NORMALIZED
      // members (Dhillon & Modha 2001), not the raw arithmetic mean —
      // with the raw mean the two half-steps optimize different
      // objectives and the cost-non-increase guarantee (asserted by
      // IvfWarehouseSpec) would not be mathematical.  Cosine is scale-
      // invariant in cv, so the mean direction needs no re-normalize.
      val upd = assigned(cents)
        .withColumn("nrm", norm(col("v")))
        .filter(col("nrm") > 0)
        .select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")), col("nrm"))
        .groupBy(col("cid"), col("dim")).agg(avg(col("x") / col("nrm")).as("m"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("cid"), transform(col("dm"), s => s.getField("m")).as("cv_new"))
      // a cluster that lost all members keeps its previous centroid —
      // the rewrite must not silently shrink K (probe-time nprobe math
      // assumes the stored codebook size)
      cents = cents.select(col("cid"), col("cv").as("cv_old"))
        .join(upd, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("cv_new"), col("cv_old")).as("cv"))
        .localCheckpoint()
    }
    val fin = assigned(cents).localCheckpoint()
    val costAfter = fin.agg(avg(col("dist"))).head.getDouble(0)
    (fin, cents, costBefore, costAfter)
  }

  /** The gated repair's verdict — one driver-side record per run
    * (cost/recall scalars are already driver values by the time the
    * gate decides). */
  final case class GateReport(costBefore: Double, costAfter: Double,
      truthN: Long, recallStanding: Double, recallStaged: Double,
      swapped: Boolean)

  private def stagingPath(path: String): String = s"$path.staged"

  /** MONITOR-GATED recluster — blue/green drift repair (VERDICT-r13
    * ask #1).  `recluster` above is the UNGATED form: it optimizes
    * ASSIGNMENT COST, and the engine's own drift-repair exhibit
    * measured a re-fit improving cost while REGRESSING serving recall
    * (0.8222 → 0.7333, SURVEY §5q) — cost and recall are different
    * objectives, so a production deployment must never swap a codebook
    * on the cost metric alone.  This verb does what that deployment
    * does (the reference's materialize-then-validate-then-serve
    * collector pattern, reference: src/collector/richlist.ts:20):
    *
    *  1. re-fit into a STAGING base (`<path>.staged` — its own
    *     CommitLog, so the staged lists+centroids land as one
    *     transaction and the serving path at `path` is untouched);
    *  2. grade BOTH states against brute truth through their own
    *     pruned serving probes (RecallMonitor.ivfRow on each base —
    *     the re-fit preserves rows, so the truth side is IDENTICAL
    *     across the two grades, asserted here, and the recall delta
    *     isolates the quantizer);
    *  3. commit the swap into `path` ONLY if staged recall does not
    *     regress; otherwise keep the standing codebook and surface
    *     the verdict — the regression case serves exactly what it
    *     served before, bit for bit.
    *
    * Either way the staging base is cleared afterwards (its dead
    * generations are vacuum's to reclaim).  Cost shape: one re-fit
    * (the recluster passes) + two monitor grades (each one linear
    * |Q|-bounded truth pass + a pruned probe) + on swap one rewrite of
    * the lists — all corpus-linear once, nothing quadratic.
    * IvfWarehouseSpec drives both branches: hold-on-regression
    * (standing state bit-identical after the verb) and
    * swap-on-improvement (the staged codebook serves, recall
    * re-grades at the staged value).
    *
    * QUERY SLICE (VERDICT-r14 ask #4): `seed`/`oneIn` thread the
    * monitor's seeded hash-mod sampling (RecallMonitor.sliceOf) into
    * the SHIP DECISION itself — the default `None` keeps the
    * deterministic `vec_id < nQueries` prefix (what the registered row
    * uses, for bit-stability), but a production poll should grade on
    * `Some(seed)` rotated per poll: a prefix slice is anchored to the
    * corpus's OLDEST ids and can pass a gate on drift that only newer
    * ingest carries (TokenizerWarehouseSpec exhibits the ship decision
    * FLIPPING under a slice that sees the drifted traffic). */
  def reclusterIfBetter(spark: SparkSession, path: String, rounds: Int = 2,
      nQueries: Int = 10, k: Int = 5, nprobe: Int = 4,
      seed: Option[Long] = None, oneIn: Long = 16L): GateReport = {
    val staging = stagingPath(path)
    val (fin, cents, costBefore, costAfter) = refit(spark, path, rounds)
    CommitLog.transaction(spark, staging) { t =>
      t.replace(fin.select(col("vec_id"), col("v"), col("cid")), staging, Seq("cid"))
      t.replace(cents, centroidsPath(staging))
    }
    def grade(p: String): (Long, Double) = {
      val r = RecallMonitor.ivfRow(spark, p, nQueries, k, nprobe,
        seed, oneIn).head()
      (r.getAs[Long]("truth_n"), r.getAs[Double]("recall"))
    }
    // grade + swap under try/finally (ADVICE r14 #4): a grade that
    // throws — including the truth-equality require — must not leave
    // the staged codebook committed under <path>.staged, where it
    // would shadow nothing but never be reclaimed by the serving
    // base's vacuum; the staging clear runs EITHER WAY
    try {
      val (truthOld, recallOld) = grade(path)
      val (truthNew, recallNew) = grade(staging)
      // the premise of comparing the two recalls at all: same standing
      // rows ⇒ same brute truth (the drift-repair row's argument)
      require(truthOld == truthNew,
        s"gated recluster: truth moved across the re-fit ($truthOld -> $truthNew)" +
          " — staged state does not hold the standing rows")
      val swap = recallNew >= recallOld
      if (swap) {
        val s = CommitLog.snapshot(spark, staging)
        CommitLog.transaction(spark, path) { t =>
          t.replace(s.read(staging), path, Seq("cid"))
          t.replace(s.read(centroidsPath(staging)), centroidsPath(path))
        }
      }
      GateReport(costBefore, costAfter, truthOld, recallOld, recallNew, swap)
    } finally {
      // retire the staging state on every exit — verdict, exception or
      // swap alike; dead staged generations are vacuum's to reclaim on
      // the retention cadence
      CommitLog.transaction(spark, staging) { t =>
        t.clear(staging); t.clear(centroidsPath(staging))
      }
    }
  }

  /** The retraction slice for the registered query — cross-cutting
    * (~8% of vectors, base and refreshed generations alike), residue
    * chosen so query vector 0 survives while served top-10 members at
    * test SF (17, 212, 225 — all ≡ 4 mod 13) are removed: the
    * registered demonstration must visibly bite. */
  private[graft] def isRetractedVec = pmod(col("vec_id"), lit(13L)) === 4

  /** Registered `s_knn_ivf_retracted`: the full maintained loop at
    * rest — ingest the base split, refresh the incoming split against
    * the frozen quantizer, retract the cross-cutting slice — then
    * vector 0's top-10 served from the tombstone-aware probe.  NO SQL
    * oracle (the s_knn_ivf approximate-recall class); the
    * WarehouseRefreshSpec retract test pins probe-after-retract ==
    * rebuild-on-survivors-under-frozen-quantizer and compact
    * bit-invariance. */
  def retractedProbe(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.sources.Materialized.pathFor("ivf_warehouse_retracted", dir) { p =>
      val e = Tables(spark, dir).embeddings
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      materializeFrom(e.filter(pmod(col("vec_id"), lit(10L)) < 8), p)
      refresh(spark, e.filter(pmod(col("vec_id"), lit(10L)) >= 8), p)
      retract(e.filter(isRetractedVec).select(col("vec_id")), p)
    }
    val qv = Tables(spark, dir).embeddings.filter(col("vec_id") === 0)
      .select(toDouble(col("embedding"))).head().getSeq[Double](0).toArray
    // k+1 then drop the query's own row — the ivfAnn self-exclusion
    probe(spark, path, qv, nprobe = 4, k = 11)
      .filter(col("vec_id") =!= 0).limit(10)
  }

  /** BATCHED probe — the serving path under load: a SET of queries
    * against the warehouse in ONE pruned scan.  Per query, its nprobe
    * nearest lists are chosen from the K-row centroid table (driver-
    * side metadata math, |Q|·K distances); the scan prunes to the
    * UNION of all probed cids (still partition pruning — a literal
    * `isin`), and a broadcast (query_id, cid) assignment join restricts
    * each query's scoring to exactly ITS lists, so results are
    * identical to running `probe` per query while the files are read
    * once.  Top-k per query via the rank window Spark rewrites to
    * WindowGroupLimit partial heaps (the Knn.knnBatch shape). */
  def probeBatch(spark: SparkSession, path: String, queries: DataFrame,
      nprobe: Int = 4, k: Int = 10): DataFrame = {
    val snap = CommitLog.snapshot(spark, path)
    val cents = snap.read(centroidsPath(path))
    val byQuery = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("dist"), col("cid"))
    // |Q|·K rows of metadata — collected only to build the literal
    // pruning predicate + the broadcast assignment (bounded by the
    // serving batch and the codebook, never the corpus)
    val assign = queries
      .crossJoin(cents)
      .select(col("query_id"), col("qv"), col("cid"),
        (-dot(col("cv"), col("qv")) / norm(col("cv"))).as("dist"))
      .withColumn("rnk", row_number().over(byQuery))
      .filter(col("rnk") <= nprobe)
      .select(col("query_id"), col("qv"), col("cid"))
      .localCheckpoint()
    val unionCids = assign.select(col("cid")).distinct()
      .collect().map(_.getAs[Int]("cid"))
    val byQ = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    live(snap, snap.read(path)
      .filter(col("cid").isin(unionCids.toIndexedSeq.map(Integer.valueOf): _*)), path)
      .join(broadcast(assign), Seq("cid"))
      .withColumn("cos", roundx(dot(col("v"), col("qv")) / (norm(col("v")) * norm(col("qv"))), 6))
      .withColumn("rnk", row_number().over(byQ))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id"), col("cos").as("cosine"),
        col("cid"), col("rnk").cast("long").as("rnk"))
  }
}
