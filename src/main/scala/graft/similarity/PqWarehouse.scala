package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Exact.{roundx, sumx}
import graft.sources.Tables

/** IVF-PQ at rest — the layout a 100 TB deployment actually ships:
  * posting lists partitioned by coarse-centroid id hold 4-bit PQ CODES
  * (8 per vector), not float vectors; the codebook and coarse
  * centroids sit beside the table as KB-scale metadata.  A probe
  * plans a partition-pruned scan of nprobe/K of the CODE table —
  * reading bytes-per-vector where IvfWarehouse reads 256 B of floats —
  * and scores with the broadcast ADC lookup table.  `Pq.ivfPqAnn`
  * computes the identical result inline per query (PqWarehouseSpec
  * asserts row-for-row agreement plus the pruned scan).
  *
  * Driver-side steps are all metadata-bounded: centroid ranking reads
  * K rows, the ADC LUT is M×Ksub=128 entries built from the stored
  * codebook — the same class as IvfWarehouse's list selection.
  */
object PqWarehouse {

  private val M = 8
  private val SubDim = 8

  private def codebookPath(path: String) = s"$path.codebook"
  private def centroidsPath(path: String) = s"$path.centroids"

  /** Ingest: coarse-assign + PQ-encode every embedding; write codes
    * cid-partitioned, codebook and centroids as side tables. */
  def materialize(spark: SparkSession, dir: String, path: String, k: Int = 16): Unit = {
    import graft.functions.VectorFunctions._
    val e = Tables(spark, dir).embeddings
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val (cents, lists) = Knn.coarseQuantizer(e, k)
    val (codebook, codes) = Pq.encode(e)
    codes.join(lists.select(col("vec_id"), col("cid")), Seq("vec_id"))
      .write.mode("overwrite").partitionBy("cid").parquet(path)
    codebook.write.mode("overwrite").parquet(codebookPath(path))
    cents.write.mode("overwrite").parquet(centroidsPath(path))
  }

  /** Probe: rank stored centroids for the query (K-row metadata),
    * build the ADC LUT from the stored codebook (128-row metadata,
    * same sequential-fold arithmetic as the inline path so ADC scores
    * are bit-identical), then scan ONLY the probed cid partitions of
    * the code table.  `excludeId` drops the query's own row when the
    * query vector comes from the corpus. */
  def probe(spark: SparkSession, path: String, qv: Array[Double],
      nprobe: Int = 4, k: Int = 10, excludeId: Long = -1L): DataFrame = {
    import graft.functions.VectorFunctions._
    // normalize exactly like Kmeans.normalize: nrm = sqrt(sequential
    // self-dot), then elementwise divide
    var acc = 0.0
    var i = 0
    while (i < qv.length) { acc += qv(i) * qv(i); i += 1 }
    val qnrm = math.sqrt(acc)
    val qn = qv.map(_ / qnrm)

    val qvCol = typedLit(qv.toSeq).cast("array<double>")
    val probeCids = spark.read.parquet(centroidsPath(path))
      .select(col("cid"), (-dot(col("cv"), qvCol) / norm(col("cv"))).as("dist"))
      .orderBy(col("dist"), col("cid")).limit(nprobe)
      .collect().map(_.getAs[Int]("cid"))

    val lut = spark.read.parquet(codebookPath(path)).collect().map { r =>
      val m = r.getAs[Int]("m")
      val cv = r.getSeq[Double](r.fieldIndex("cv"))
      var part = 0.0
      var j = 0
      val base = m * SubDim
      while (j < math.min(SubDim, cv.length)) {
        part += cv(j) * qn(base + j); j += 1
      }
      (m, r.getAs[Int]("cid"), part)
    }
    import spark.implicits._
    val lutDf = lut.toSeq.toDF("m", "code", "part")

    spark.read.parquet(path)
      .filter(col("cid").isin(probeCids.toIndexedSeq.map(Integer.valueOf): _*))
      .filter(col("vec_id") =!= excludeId)
      .join(broadcast(lutDf), Seq("m", "code"))
      .groupBy(col("vec_id"))
      .agg(roundx(sumx(col("part")), 6).as("adc_cosine"), first(col("cid")).as("cid"))
      .orderBy(col("adc_cosine").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("adc_cosine"), col("cid"))
  }
}
