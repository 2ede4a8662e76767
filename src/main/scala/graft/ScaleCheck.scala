package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** VERDICT-r09 ask #7: one-shot scale spot-check of the most
  * expensive bench rows beyond the largest driver-generated SF.  No
  * sf1 testdata exists in this sandbox (TESTDATA.md: sf0.001/0.01/
  * 0.1 only), so the 10× corpus is DERIVED from sf0.1: documents
  * replicate with REPLICA-PREFIXED words (word w of replica r becomes
  * "r<r>_w"), which makes replicas pairwise-dissimilar in EVERY
  * channel — disjoint shingles, disjoint char grams, distinct md5 —
  * so the derived corpus is `reps` disjoint shards, each isomorphic
  * to sf0.1: a corpus with sf0.1's duplicate DENSITY at reps× the
  * volume, the linear-scaling regime a real 10× crawl has.  (Contrast
  * StressBench, which replicates text VERBATIM on purpose — the
  * re-crawl clique regime; both regimes are now measured.)
  * Embeddings replicate with fresh ids only — the trainers never pair
  * replicas, so verbatim vectors are already the linear regime.  Ids
  * remap as r·10⁶ + id: 10⁶ ≡ 0 (mod 10), so every registered mod-10
  * split keeps its per-shard semantics.
  *
  * Timing: ONE rep per query (the ask's shape) after a tiny-SF warm
  * pass.  Run at reps=1 first for the same-generator baseline — the
  * ratio vs reps=10 is the scaling measurement (comparing against
  * BENCH rows would confound the word-prefix perturbation). */
object ScaleCheck {

  /** The five most expensive BENCH_r09 rows (the ask's list) — the
    * default; extra args override (any registered query whose inputs
    * are documents/embeddings, the two tables `derive` replicates). */
  private val Queries = Seq("s_logreg_ovr5", "d_dedup_groups_lsh",
    "d_dedup_simhash_verified", "s_bm25_probe_compacted", "d_dedup_editdist")

  private def derive(spark: SparkSession, srcDir: String, outDir: String,
      reps: Int): Unit = {
    val t = graft.sources.Tables(spark, srcDir)
    val rep = spark.range(reps).toDF("r")
    t.documents.crossJoin(rep)
      .select((col("r") * 1000000L + col("doc_id")).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          w => concat(lit("r"), col("r"), lit("_"), w)), " ").as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    t.embeddings.crossJoin(rep)
      .select((col("r") * 1000000L + col("vec_id")).as("vec_id"),
        col("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    // orders/lineitem replicate with stride-remapped keys (round 13 —
    // the join-view verbs joined the checkable set): 10⁷ ≡ 0 mod 10,
    // so the mod-10 splits keep per-shard semantics; dates are kept,
    // so the year-cadence build sees the same calendar at reps× rows
    t.orders.crossJoin(rep)
      .withColumn("o_orderkey", col("r") * 10000000L + col("o_orderkey"))
      .drop("r")
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    t.lineitem.crossJoin(rep)
      .withColumn("l_orderkey", col("r") * 10000000L + col("l_orderkey"))
      .drop("r")
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
  }

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 10
    val queries = if (args.length > 2) args.drop(2).toSeq else Queries
    val out = s"/root/repo/target/scalecheck-x$reps"
    val spark = GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    derive(spark, src, out, reps)
    queries.foreach { n => // warm codegen/classloading off the clock
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    queries.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, out).write.format("noop").mode("overwrite").save()
      println(f"SCALE x$reps $n ${(System.nanoTime() - t0) / 1e9}%.2f")
      System.out.flush()
    }
    spark.stop()
  }
}
