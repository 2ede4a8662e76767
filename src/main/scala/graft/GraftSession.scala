package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the configs every graft entrypoint needs. */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS); Spark 4 otherwise refuses
      // the file (PARQUET_TYPE_ILLEGAL).  Tables.events converts the
      // resulting long to a µs timestamp.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
}
