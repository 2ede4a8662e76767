package graft.similarity

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.functions.Exact.roundx
import graft.sources.Tables

/** Per-dimension embedding DRIFT between the standing corpus and an
  * incoming batch — the monitoring leg of the moments story: a crawl
  * pipeline that maintains covariance moments at rest (PcaWarehouse)
  * watches exactly these statistics to decide when the incoming
  * distribution has moved enough to retrain quantizers (the FAISS
  * add-vs-retrain decision the IVF/PQ warehouses defer to "the
  * recluster maintenance pass" — THIS is the signal that schedules
  * that pass; cf. Jégou et al.'s IVF practice and every production
  * feature-store drift monitor).
  *
  * Output per dimension i: split sizes, fixed-point means, the mean
  * shift, both variances, and |shift| in units of the base std dev
  * (a z-like magnitude — the per-dim summary a dashboard thresholds).
  *
  * Exactness: the s_embed_cov discipline verbatim — elements quantize
  * to 1e-6 fixed-point longs, per-split Σq and Σq² are DECIMAL-exact,
  * means/variances take ONE double division each (+ 9-dp roundx);
  * drift_z = |Δmean| / √var_base is two more correctly-rounded ops on
  * already-rounded inputs, 6-dp roundx — engine-stable, ORACLED.
  * A zero-variance base dimension yields NULL, not an engine-divergent
  * 0/0 NaN.
  *
  * Plan: ONE scan, one posexplode to (split, i, q, q²) rows, one
  * 2×64-group partial-aggregated shuffle — corpus-size-independent
  * wire traffic, the moments shape on a split key.
  *
  * The STREAMING twin monitors a crawl in flight without scanning the
  * standing corpus at all: the base side reads straight off the
  * PcaWarehouse moments index — its (i, −1) sentinels are Σqᵢ and its
  * DIAGONAL (i, i) rows are Σqᵢ² — so each micro-batch pays one pass
  * over itself plus a 2 145-row index read.  Stateless (batch vs
  * index; the Bm25/Lm streamingProbe stance). */
object EmbedDrift {

  private val Scale = 1e6

  /** Per-dim split stats (i, n, sx, sxx) of a vector frame — one
    * posexplode, one partial-aggregated 64-group shuffle. */
  private def statsOf(emb: DataFrame): DataFrame = {
    val q = transform(col("embedding"),
      x => floor(x.cast("double") * Scale + 0.5))
    emb.select(posexplode(q).as(Seq("i", "qx")))
      .groupBy(col("i").cast("long").as("i"))
      .agg(count(lit(1)).as("n"),
        sum(col("qx").cast("decimal(38,0)")).as("sx"),
        sum((col("qx") * col("qx")).cast("decimal(38,0)")).as("sxx"))
  }

  private def mean(sx: Column, n: Column) =
    roundx(sx.cast("double") / (n.cast("double") * Scale), 9)
  private def variance(sxx: Column, sx: Column, n: Column) =
    roundx((n * sxx - sx * sx).cast("double") /
      (n.cast("double") * n * lit(Scale * Scale)), 9)

  /** The shared drift projection over two (i, n, sx, sxx) sides. */
  private def driftFrame(base: DataFrame, inc: DataFrame): DataFrame = {
    val b = base.select(col("i"), col("n").as("n_base"),
      mean(col("sx"), col("n")).as("mean_base"),
      variance(col("sxx"), col("sx"), col("n")).as("var_base"))
    val c = inc.select(col("i"), col("n").as("n_inc"),
      mean(col("sx"), col("n")).as("mean_inc"),
      variance(col("sxx"), col("sx"), col("n")).as("var_inc"))
    b.join(c, Seq("i"))
      .select(col("i"), col("n_base"), col("n_inc"),
        col("mean_base"), col("mean_inc"), col("var_base"), col("var_inc"),
        roundx(col("mean_inc") - col("mean_base"), 9).as("mean_delta"),
        // a zero-variance base dimension has no std-dev unit — NULL,
        // not a 0/0 NaN whose engine representation could diverge
        when(col("var_base") > 0,
          roundx(abs(col("mean_inc") - col("mean_base")) / sqrt(col("var_base")), 6))
          .as("drift_z"))
  }

  /** `d_embed_drift`: base (vec_id mod 10 < 8) vs incoming (rest). */
  def embedDrift(spark: SparkSession, dir: String): DataFrame =
    driftOf(Tables(spark, dir).embeddings)

  private[graft] def driftOf(emb: DataFrame): DataFrame = {
    // ONE scan for both splits: aggregate on (is_base, i) — 128
    // groups — then pin the metadata-scale result so the two side
    // filters below don't re-run the corpus stage
    val q = transform(col("embedding"),
      x => floor(x.cast("double") * Scale + 0.5))
    val agg = emb.select(
      (pmod(col("vec_id"), lit(10L)) < 8).as("is_base"),
      posexplode(q).as(Seq("i", "qx")))
      .groupBy(col("i").cast("long").as("i"), col("is_base"))
      .agg(count(lit(1)).as("n"),
        sum(col("qx").cast("decimal(38,0)")).as("sx"),
        sum((col("qx") * col("qx")).cast("decimal(38,0)")).as("sxx"))
      .localCheckpoint()
    driftFrame(agg.filter(col("is_base")).drop("is_base"),
      agg.filter(!col("is_base")).drop("is_base"))
  }

  /** Base-side stats straight off the PcaWarehouse moments index:
    * n from (−1, −1), Σqᵢ from the (i, −1) sentinels, Σqᵢ² from the
    * diagonal (i, i) — the index at rest already IS the monitor's
    * left side. */
  private[graft] def statsFromMoments(spark: SparkSession, path: String): DataFrame = {
    // the moments index rides CommitLog since round 12 — read the
    // committed fold, exactly like PcaWarehouse.cov
    val m = graft.sources.CommitLog.snapshot(spark, path).read(path)
      .groupBy(col("i"), col("j")).agg(sum(col("m")).as("m"))
    val n = m.filter(col("i") === -1).select(col("m").cast("long").as("n"))
    val sx = m.filter(col("j") === -1 && col("i") >= 0)
      .select(col("i"), col("m").as("sx"))
    val sxx = m.filter(col("i") >= 0 && col("j") === col("i"))
      .select(col("i"), col("m").as("sxx"))
    sx.join(sxx, Seq("i")).crossJoin(broadcast(n))
  }

  /** One micro-batch of vectors against the moments index at rest. */
  def driftVsIndex(spark: SparkSession, path: String, batch: DataFrame): DataFrame =
    driftFrame(statsFromMoments(spark, path), statsOf(batch))

  /** The drift monitor in flight: each arriving micro-batch reports
    * its per-dim drift against the standing moments index inside
    * foreachBatch — no standing-corpus scan, no cross-batch state.
    * (EmbedDriftSpec pins a one-batch stream to the batch operator's
    * exact rows when index split == base split.) */
  def streamingDrift(vectors: DataFrame, path: String)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(driftVsIndex(batch.sparkSession, path, batch))
      }
      .start()
}
