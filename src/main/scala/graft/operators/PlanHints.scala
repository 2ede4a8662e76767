package graft.operators

import org.apache.spark.network.util.JavaUtils
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-guarded plan hints.
  *
  * An unconditional `broadcast(df)` is a promise that df stays small
  * forever — wrong for anything derived from a fact table (filtered
  * orders, price intervals, per-doc rollups), which grows with history
  * and OOMs the driver at 100 TB.  `broadcastIfSmall` applies the hint
  * only when the optimizer's size estimate is under the session's
  * autoBroadcastJoinThreshold; otherwise it returns the plan unhinted
  * and the join falls back to a shuffled equi-join (and AQE can still
  * re-plan a broadcast at runtime if the ACTUAL size turns out small).
  */
object PlanHints {

  private def thresholdBytes(df: DataFrame): Long = {
    val raw = df.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10MB").trim
    if (raw.startsWith("-")) -1L
    else JavaUtils.byteStringAsBytes(raw)
  }

  /** Hint broadcast only under the session broadcast threshold. */
  def broadcastIfSmall(df: DataFrame): DataFrame = {
    val limit = thresholdBytes(df)
    if (limit > 0 && df.queryExecution.optimizedPlan.stats.sizeInBytes <= limit)
      broadcast(df)
    else df
  }
}
