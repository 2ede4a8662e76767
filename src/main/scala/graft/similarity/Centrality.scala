package graft.similarity

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.Exact.{roundx, sumx}

/** PageRank centrality over the kNN graph — graph-based data
  * selection's scoring pass: a document/vector that many
  * neighborhoods point at is a hub of its semantic region, and
  * centrality-ranked subsets are the classic diversity/coreset pick
  * (conversely, the LOWEST-ranked points are isolation candidates —
  * outlier triage).  Brin & Page 1998; damping 0.85, out-degree is
  * exactly k for every node (the kNN graph is k-out-regular), so
  * there are no dangling corrections.
  *
  * Spark shape: the rank vector is an (id, rank) frame; one iteration
  * = one edge-keyed join + one dst-keyed partial-aggregated shuffle —
  * cost bounded by the n·k edge set, iterated `Iters` times (the
  * pointer-jumping CC / Lloyd-iteration stance: a fixed, small
  * iteration count as a registered cost probe).
  *
  * Determinism: double sums over shuffled contributions are
  * order-dependent, so each contribution is 9-dp rounded and summed
  * through DECIMAL (sumx — the engine-wide Exact route); ranks stay
  * bit-stable across partitionings (spec-pinned by re-running).
  * No oracle (iterative — the s_kmeans/s_logreg stance); spec pins
  * mass conservation, the cycle-graph fixed point, and star-graph
  * ordering.
  */
object Centrality {

  private val Damping = 0.85
  private val Iters = 8

  /** `s_graph_centrality`: top-20 PageRank hubs of the 5-NN graph.
    * Edge source here is the exact graph (the registered baseline);
    * pageRank itself is source-agnostic — at 100 TB the edge frame
    * comes from s_knn_graph_lsh's blocked build instead, same plan
    * downstream. */
  def graphCentrality(spark: SparkSession, dir: String): DataFrame = {
    val edges = Knn.knnGraph(spark, dir)
      .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
      .localCheckpoint() // the n²-scored subtree runs once
    pageRank(spark, edges, outDeg = 5)
      .orderBy(col("rank").desc, col("id"))
      .limit(20)
  }

  /** Frame-level PageRank over a fixed-out-degree edge frame —
    * exposed for the spec's closed-form graphs. */
  private[graft] def pageRank(spark: SparkSession, edges: DataFrame,
      outDeg: Int, iters: Int = Iters): DataFrame = {
    val nodes = edges.select(col("src").as("id")).distinct()
      .union(edges.select(col("dst").as("id")).distinct()).distinct()
      .localCheckpoint()
    var ranks = nodes.select(col("id"), lit(1.0).as("rank"))
    for (_ <- 1 to iters) {
      val contribs = edges
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), roundx(col("rank") / outDeg, 9).as("c"))
        .groupBy(col("id")).agg(sumx(col("c")).as("in_mass"))
      ranks = nodes
        .join(contribs, Seq("id"), "left")
        .select(col("id"), roundx(lit(1.0 - Damping) +
          lit(Damping) * coalesce(col("in_mass"), lit(0.0)), 9).as("rank"))
        .localCheckpoint() // pin each iterate: the lineage would
                           // otherwise re-run all prior iterations
                           // per action (and per join side)
    }
    ranks
  }
}
