package graft.examples

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Replays the driver's t1 smoke: SparkEntry.entry must return rows>0. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows=$rows")
    assert(rows > 0, "entry must return rows")
    spark.stop()
  }
}
