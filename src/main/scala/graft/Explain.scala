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
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"==== $name ====")
      df.explain("formatted")
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"==== $name took ${(System.nanoTime() - t0) / 1e9}%.3f s ====")
    }
    spark.stop()
  }
}
