package graft

/** Dev utility: time individual registered queries (min-of-3, the
  * Bench discipline) without running the whole suite — the iteration
  * loop for plan work.  `runMain graft.TimeQueries <sfDir> q1 q2 …` */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n => // warm codegen/classloading once at tiny SF
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val times = scala.collection.mutable.Map.empty[String, Double]
    for (_ <- 1 to 3; n <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      times(n) = math.min(times.getOrElse(n, Double.MaxValue), t)
    }
    names.foreach(n => println(f"TIME $n ${times(n)}%.3f"))
    spark.stop()
  }
}
