package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical answer to the superstep-executor question (VERDICT r7 next
  * #7): does a localCheckpoint of a hash-partitioned frame PRESERVE its
  * outputPartitioning on this Spark version (AQE on), so a subsequent
  * join on the same key skips the Exchange? The connectedComponents
  * comment (r6) says no — "a checkpoint under AQE reports
  * UnknownPartitioning" — which forced label frames to re-shuffle every
  * superstep. If Spark 4.1's LogicalRDD now carries the partitioning
  * through, every iterative loop in Traversals can keep its label frame
  * partitioned across rounds for one less exchange per superstep.
  *
  * Prints the executed plan of (checkpointed id-hashed frame) ⋈ id and
  * the Exchange count on the checkpointed side.
  */
object CheckpointPartitioningProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ/shuffle path
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val a = spark.range(1000000).select(col("id"), (col("id") % 7).as("v"))
      .repartition(col("id")).localCheckpoint(true)
    val b = spark.range(1000000).select(col("id"), (col("id") % 5).as("w"))
      .repartition(col("id")).localCheckpoint(true)
    val j = a.join(b, "id")
    j.write.format("noop").mode("overwrite").save()
    val plan = j.queryExecution.executedPlan.toString
    println(plan)
    val nEx = "Exchange".r.findAllIn(plan).length
    println(s"[probe] exchanges in checkpointed-join plan: $nEx " +
      s"(0 = partitioning preserved, 2 = UnknownPartitioning)")

    // the superstep shape proper: alias id -> src, join with an edge
    // frame persisted hashed on src
    val e = spark.range(4000000).select((col("id") % 100000).as("src"),
        ((col("id") * 31) % 100000).as("dst"))
      .repartition(col("src")).persist()
    e.count()
    val labels = spark.range(100000).select(col("id"), col("id").as("label"))
      .repartition(col("id")).localCheckpoint(true)
    val msg = e.join(labels.select(col("id").as("src"), col("label")), "src")
      .groupBy(col("dst").as("id")).agg(min("label").as("m"))
    val nxt = labels.join(msg, Seq("id"), "left_outer")
    nxt.write.format("noop").mode("overwrite").save()
    val p2 = nxt.queryExecution.executedPlan.toString
    println(p2)
    println(s"[probe] superstep exchanges: ${"Exchange".r.findAllIn(p2).length}")
    spark.stop()
  }
}
