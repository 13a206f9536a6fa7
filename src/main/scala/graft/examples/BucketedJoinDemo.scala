package graft.examples

import graft._
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Demonstrates the co-located-join layout for the 100 TB deployment:
  * the edge table bucketed by `dst` and the vertex table bucketed by
  * `id` (same bucket count) join WITHOUT a shuffle — the Spark analogue
  * of the reference's dst-interval shard alignment, which lets its
  * in-edge sweeps join vertex columns without data movement
  * (reference GraphChiDatabase.scala:1875-1957).
  * Prints the join plan and asserts no Exchange on either side.
  */
object BucketedJoinDemo {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    Tables.orderEdges(spark, dir).write.mode(SaveMode.Overwrite)
      .bucketBy(8, "dst").sortBy("dst").saveAsTable("edges_by_dst")
    Tables.vertices(spark, dir).write.mode(SaveMode.Overwrite)
      .bucketBy(8, "id").sortBy("id").saveAsTable("vertices_by_id")

    val joined = spark.table("edges_by_dst")
      .join(spark.table("vertices_by_id"),
        col("dst") === col("id"))
      .groupBy("vtype").agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    println(s"[bucketed] join+agg rows=${joined.count()} exchanges-in-plan=$shuffles")
    println(plan.linesIterator.filter(l =>
      l.contains("SortMergeJoin") || l.contains("Exchange") || l.contains("Scan"))
      .mkString("\n"))
    assert(shuffles <= 1, // only the final 1-column agg may shuffle
      s"expected shuffle-free bucketed join, got $shuffles exchanges:\n$plan")
    spark.stop()
  }
}
