package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** W7: a filtered date-dimension join against the day-partitioned event
  * store must prune partition DIRECTORIES at runtime — the dynamic
  * partition pruning subquery has to reach the fact scan's partition
  * filters, and the result must match the unpartitioned computation. */
class W7DppSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("dpp subquery reaches the day-partitioned scan and prunes directories") {
    val dir = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(Tables.eventsByDayPath(spark, dir))
    val dim = Tables.eventDayDim(spark, dir).filter(col("dow") === 1)
    val q = ev.join(dim, "day").agg(count(lit(1)).as("n"))
    // the optimized plan carries the dynamicpruning expression on the
    // partitioned scan (the runtime subquery DPP inserts)
    val explained = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamicpruning partition filter in:\n$explained")
    // and the answer equals the unpartitioned formulation
    val got = q.collect().head.getLong(0)
    val want = Tables.events(spark, dir)
      .select(expr("ts div 86400000000000L").as("day"))
      .withColumn("dow", pmod(col("day"), lit(7)))
      .filter(col("dow") === 1).count()
    assert(got == want && got > 0)
  }
}
