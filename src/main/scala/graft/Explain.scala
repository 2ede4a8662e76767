package graft

/** Dev loop: print the formatted physical plan (and optionally time)
  * of registered queries.  Usage:
  *   runMain graft.Explain <sfDir> <name> [name ...]
  * Timing note: each query runs once via the noop sink AFTER the plan
  * print, so cold-build effects (warehouse materialization) land here
  * exactly as in Bench's first pass. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val spark = GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"===== $name =====")
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.explain("formatted")
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[explain] $name ran in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
