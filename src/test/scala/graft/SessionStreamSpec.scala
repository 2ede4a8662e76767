package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stateful streaming sessionization spec: feed the events stream in
  * chunks through flatMapGroupsWithState and check the CLOSED sessions
  * match the batch sessionize result for the same data. */
class SessionStreamSpec extends GraftSpec {

  test("streaming sessionize closed sessions match batch sessionize") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val rows = sources.Tables(s, Dir).events
      .select(col("user_id"),
        unix_millis(col("ts").cast("timestamp")).as("ms"), col("event_id"))
      .as[(Long, Long, Long)]
      .collect()
      .sortBy(r => (r._2, r._3))

    val stream = MemoryStream[(Long, Long, Long)]
    val query = streaming.StreamOps.streamingSessionize(stream.toDS(), inactivityTimeout = false)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      rows.grouped(200).foreach { chunk =>
        stream.addData(chunk.toSeq)
        query.processAllAvailable()
      }
      val streamed = s.table("sess_out")
        .select("user_id", "session_seq", "n_events", "session_start_ms", "duration_ms")
        .collect().map(_.toSeq).toSet

      val batch = operators.Olap.sessionize(s, Dir)
        .collect().map(_.toSeq).toSet
      // streaming emits CLOSED sessions only (without the inactivity
      // timeout the final open session per user stays in state), so:
      // streamed == batch minus at most one open session per user
      assert(streamed.nonEmpty)
      assert(streamed.subsetOf(batch),
        s"streamed-not-in-batch: ${(streamed -- batch).take(3)}")
      val users = rows.map(_._1).distinct.length
      assert(batch.size - streamed.size <= users,
        s"closed ${streamed.size}, batch ${batch.size}, users $users")
    } finally query.stop()
  }
}
