package graft

import org.apache.spark.sql.functions._

/** Scale-technique specs: salting equivalence and bucketed co-located
  * joins (plan-shape assertions, not just results). */
class ScaleSpec extends GraftSpec {

  test("salted sum equals direct sum") {
    val t = sources.Tables(spark, Dir)
    val direct = t.events.groupBy(col("event_type").as("key"))
      .agg(sum(col("value")).as("total"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (math.rint(r.getDouble(1) * 100) / 100, r.getLong(2))).toMap
    val salted = operators.Skew.saltedSum(t.events, col("event_type"), col("value"), 8)
      .collect().map(r => r.getString(0) -> (math.rint(r.getDouble(1) * 100) / 100, r.getLong(2))).toMap
    assert(salted == direct)
  }

  test("salted join equals direct join") {
    val t = sources.Tables(spark, Dir)
    val small = t.nation.select(col("n_nationkey").as("c_nationkey"), col("n_name"))
    val direct = t.customer.join(small, Seq("c_nationkey"))
      .select("c_custkey", "n_name").collect().map(_.toSeq).toSet
    val salted = operators.Skew.saltedJoin(t.customer, small, "c_nationkey", 4)
      .select("c_custkey", "n_name").collect().map(_.toSeq).toSet
    assert(salted == direct)
  }

  test("bucketed fact-fact join plans without Exchange") {
    sources.Warehouse.bucketize(spark, Dir, 4)
    val joined = sources.Warehouse.colocatedOrderRevenue(spark)
    val physical = joined.queryExecution.executedPlan.toString
    assert(!physical.contains("Exchange"),
      s"expected shuffle-free co-located join, got:\n${physical.take(2000)}")
    // and it computes the same revenue as the unbucketed path
    val n = joined.count()
    assert(n > 0)
    val direct = sources.Tables(spark, Dir).orders.join(
        sources.Tables(spark, Dir).lineitem,
        col("o_orderkey") === col("l_orderkey"))
      .select(countDistinct(col("o_orderkey"))).head().getLong(0)
    assert(n == direct)
  }
}
