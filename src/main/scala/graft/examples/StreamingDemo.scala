package graft.examples

import graft._
import graft.streaming.OnlineIngest
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Runnable demo of the online-ingest path (S1/C2): micro-batches of edges
  * land as files, each batch is folded into the live GraphDB snapshot, and
  * a continuous computation (degrees) runs per batch — the Spark shape of
  * the reference's buffered-insert + background-merge + read-your-writes
  * mode (reference GraphChiDatabase.scala:913-938, README.md:226-229). */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft-demo").toString
    Seq((10L, 11L, 0), (11L, 12L, 0)).toDF("src", "dst", "etype")
      .write.parquet(s"$dir/b0.parquet")
    Seq((12L, 13L, 0), (13L, 10L, 0)).toDF("src", "dst", "etype")
      .write.parquet(s"$dir/b1.parquet")

    val schema = StructType(Seq(StructField("src", LongType),
      StructField("dst", LongType), StructField("etype", IntegerType)))
    val base = new GraphDB(spark,
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema),
      spark.emptyDataFrame)

    val q = OnlineIngest.ingest(spark, schema, s"$dir/*", base, (snap, bid) => {
      val n = snap.edges.count()
      val deg11 = snap.degrees.filter(col("id") === 11L).collect().mkString
      println(s"[demo] batch=$bid edges=$n deg(11)=$deg11")
    })
    q.awaitTermination()
    println("[demo] ingest complete — final snapshot is base ∪ all batches")
    spark.stop()
  }
}
