package graft

import org.apache.spark.sql.functions._

/** Scratch stage decomposer for optimization work (r15) — times the
  * Ed-Join stages and other hot intermediates through the noop sink.
  * Dev-only; not registered anywhere. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables(spark, sfDir).documents

    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      // by-name: eager construction (trainer loops, CC) re-runs per rep
      // exactly as Bench times it; min-of-3
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"DEV $tag%-28s $best%.3f")
    }

    val st = graft.dedup.EditDist.stages(docs, d = 10)
    val base = docs.select(col("doc_id"), col("text"),
      length(col("text")).as("len"))
    val shh = base.select(col("doc_id"), col("len"),
      explode(graft.functions.GramHashes(split(col("text"), ""), 4)).as("hsh"))
    time("ed.shh")(shh)
    time("ed.freq")(shh.groupBy(col("hsh")).agg(count(lit(1)).as("freq")))
    time("ed.prefix")(st.prefix)
    time("ed.collisions")(st.collisions)
    time("ed.pairs")(st.pairs)
    val cand = st.collisions.select(col("a_id"), col("b_id")).distinct()
    time("ed.cand_distinct")(cand)
    println("counts: shh=" + shh.count() + " freq=" +
      shh.select("hsh").distinct().count() + " prefix=" + st.prefix.count() +
      " collisions=" + st.collisions.count() + " cand=" + cand.count() +
      " pairs=" + st.pairs.count())

    // simhash_verified decomposition


    time("simhash.verified")(graft.dedup.Dedup.simhashVerified(spark, sfDir))
    time("simhash.raw")(graft.dedup.Dedup.simhash(spark, sfDir))

    // neardup cosine
    time("neardup_cosine")(graft.dedup.Dedup.cosinePairs(spark, sfDir))

    // CC loop alone over warehouse edges (d_dedup_groups shape)
    {
      val t1 = System.nanoTime()
      val g = graft.dedup.Dedup.dedupGroups(spark, sfDir)
      val tc = (System.nanoTime() - t1) / 1e9
      g.write.format("noop").mode("overwrite").save()
      println(f"DEV cc.construct(loop)          $tc%.3f")
      time("cc.groups_total")(graft.dedup.Dedup.dedupGroups(spark, sfDir))
    }

    // bpe trainer + encode
    time("bpe.merges")(SparkEntry.queries("t_bpe_merges")(spark, sfDir))
    time("bpe.encode")(SparkEntry.queries("t_bpe_encode")(spark, sfDir))

    spark.stop()
  }
}
