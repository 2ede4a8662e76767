package graft.similarity

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

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
  *
  * Plan: ONE scan, one posexplode to (split, i, q, q²) rows, one
  * 2×64-group partial-aggregated shuffle — corpus-size-independent
  * wire traffic, the moments shape on a split key.
  */
object EmbedDrift {

  private val Scale = 1e6

  /** `d_embed_drift`: base (vec_id mod 10 < 8) vs incoming (rest). */
  def embedDrift(spark: SparkSession, dir: String): DataFrame =
    driftOf(Tables(spark, dir).embeddings)

  private[graft] def driftOf(emb: DataFrame): DataFrame = {
    val q = transform(col("embedding"),
      x => floor(x.cast("double") * Scale + 0.5))
    val rows = emb.select(
      (pmod(col("vec_id"), lit(10L)) < 8).as("is_base"),
      posexplode(q).as(Seq("i", "qx")))
    val agg = rows.groupBy(col("i").cast("long").as("i"), col("is_base"))
      .agg(count(lit(1)).as("n"),
        sum(col("qx").cast("decimal(38,0)")).as("sx"),
        sum((col("qx") * col("qx")).cast("decimal(38,0)")).as("sxx"))
    // mean = Σq/(n·1e6); var via the moment identity (n·Σq² − (Σq)²)/n²
    def mean(sx: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
      roundx(sx.cast("double") / (n.cast("double") * Scale), 9)
    def variance(sxx: org.apache.spark.sql.Column, sx: org.apache.spark.sql.Column,
        n: org.apache.spark.sql.Column) =
      roundx((n * sxx - sx * sx).cast("double") /
        (n.cast("double") * n * lit(Scale * Scale)), 9)
    val base = agg.filter(col("is_base"))
      .select(col("i"), col("n").as("n_base"),
        mean(col("sx"), col("n")).as("mean_base"),
        variance(col("sxx"), col("sx"), col("n")).as("var_base"))
    val inc = agg.filter(!col("is_base"))
      .select(col("i"), col("n").as("n_inc"),
        mean(col("sx"), col("n")).as("mean_inc"),
        variance(col("sxx"), col("sx"), col("n")).as("var_inc"))
    base.join(inc, Seq("i"))
      .select(col("i"), col("n_base"), col("n_inc"),
        col("mean_base"), col("mean_inc"), col("var_base"), col("var_inc"),
        roundx(col("mean_inc") - col("mean_base"), 9).as("mean_delta"),
        // a zero-variance base dimension has no std-dev unit — NULL,
        // not a 0/0 NaN whose engine representation could diverge
        when(col("var_base") > 0,
          roundx(abs(col("mean_inc") - col("mean_base")) / sqrt(col("var_base")), 6))
          .as("drift_z"))
  }
}
