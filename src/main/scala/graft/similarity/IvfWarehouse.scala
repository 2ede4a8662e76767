package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.functions.Exact.roundx
import graft.sources.Tables

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
  def materialize(spark: SparkSession, dir: String, path: String, k: Int = 16): Unit = {
    val e = Tables(spark, dir).embeddings
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val (centroids, lists) = Knn.coarseQuantizer(e, k)
    lists.write.mode("overwrite").partitionBy("cid").parquet(path)
    centroids.write.mode("overwrite").parquet(centroidsPath(path))
  }

  private def centroidsPath(path: String): String = s"$path.centroids"

  /** Probe: rank centroids against the query vector, then top-k exact
    * cosine over ONLY the nprobe nearest posting lists.  Selecting the
    * lists is driver-side METADATA work (bounded by K centroids, like
    * any partition-pruning predicate build) — the literal `isin` filter
    * is what lets the scan prune cid partitions; the data path stays
    * fully distributed. */
  def probe(spark: SparkSession, path: String, qv: Array[Double],
      nprobe: Int = 4, k: Int = 10): DataFrame = {
    val qvCol = typedLit(qv.toSeq).cast("array<double>")
    val probeCids = spark.read.parquet(centroidsPath(path))
      .select(col("cid"),
        (-dot(col("cv"), qvCol) / norm(col("cv"))).as("dist"))
      .orderBy(col("dist"), col("cid")).limit(nprobe)
      .collect().map(_.getAs[Int]("cid"))
    spark.read.parquet(path)
      .filter(col("cid").isin(probeCids.toIndexedSeq.map(Integer.valueOf): _*))
      .withColumn("cos", roundx(dot(col("v"), qvCol) / (norm(col("v")) * norm(qvCol)), 6))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("cos").as("cosine"), col("cid"))
  }
}
