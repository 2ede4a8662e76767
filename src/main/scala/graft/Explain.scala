package graft

/** Dev loop: print the formatted physical plan of named queries (and
  * execute them once so runtime warnings like unpartitioned-window
  * surface in the log). `runMain graft.Explain <sfDir> <name>...`;
  * with no names, audits EVERY registered query. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      // time construction + execution, but not plan printing:
      // iterative operators (connected components, k-means) do their
      // loop work EAGERLY while the DataFrame is being built, so
      // timing only the final write would under-report them
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      println(s"==== $name ====")
      df.explain("formatted")
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val took = tBuild + (System.nanoTime() - t1) / 1e9
      println(f"==== $name took $took%.3f s ====")
    }
    spark.stop()
  }
}
