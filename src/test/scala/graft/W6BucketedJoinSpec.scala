package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** W6: a join of two tables bucketed on their join keys must run with no
  * Exchange on either side — the write-time shuffle IS the co-location
  * (the 100 TB fact⋈fact shape; the reference gets the same effect by
  * sharding both edge directions on vertex ranges). */
class W6BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed orders⋈lineitem sort-merge join shuffles neither side") {
    val dir = "/root/testdata/sf0.001"
    val (ot, lt) = Tables.bucketedOrdersLineitem(spark, dir)
    // at sf0.001 Catalyst would (rightly) broadcast the small side; the
    // 100 TB claim under test is the fact⋈fact SMJ path, so force it
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table(ot)
        .join(spark.table(lt), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n_items"))
      // force execution so AQE finalizes the physical plan
      assert(joined.collect().nonEmpty)
      def collectAll(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
        (p +: p.children.flatMap(collectAll)) ++ (p match {
          case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            collectAll(q.plan)
          case _ => Seq.empty
        })
      val plan = joined.queryExecution.executedPlan
      val nodes = collectAll(plan)
      // the final aggregation of 5 priorities may exchange; the JOIN
      // inputs must come straight from the bucketed scans — no
      // ShuffleExchange below the join on either side
      val joins = nodes.filter(_.getClass.getSimpleName.contains("Join"))
      assert(joins.nonEmpty, s"no join node found in:\n$plan")
      val belowJoin = joins.flatMap(j => j.children.flatMap(collectAll))
      val joinShuffles = belowJoin.collect {
        case e: Exchange if !e.getClass.getSimpleName.contains("Broadcast") => e
      }
      assert(joinShuffles.isEmpty,
        s"bucketed join must not shuffle its inputs; found: $joinShuffles\n$plan")
      // both scans report the bucketed layout
      assert(nodes.exists(_.toString.contains("Bucketed: true")),
        s"expected bucketed scans in plan:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("w6 bucketed aggregate matches the plain-join result") {
    val dir = "/root/testdata/sf0.001"
    val (ot, lt) = Tables.bucketedOrdersLineitem(spark, dir)
    val bucketed = spark.table(ot)
      .join(spark.table(lt), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bucketed == plain && bucketed.nonEmpty)
  }
}
