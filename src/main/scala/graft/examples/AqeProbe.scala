package graft.examples

import graft._
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Dev probe (guide §1): time registry entries with AQE ON vs OFF to
  * measure the per-superstep adaptive re-planning overhead VERDICT r14
  * next #2 targets. Usage: runMain graft.examples.AqeProbe <sfDir> <reps> <name>...
  */
object AqeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val names = if (args.length > 2) args.drop(2).toSeq
      else Seq("q6_sssp_dist", "g4_weighted_sssp", "c4_cc_labels")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onJobEnd(j: SparkListenerJobEnd): Unit = ()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages += 1
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks += 1
        if (t.taskInfo != null) taskMs += t.taskInfo.duration
      }
    })

    Tables.lineitem(spark, dir).count()
    for (name <- names; aqe <- Seq(true, false); i <- 1 to reps) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      org.apache.spark.graftdev.ListenerDrain.drain(spark.sparkContext)
      jobs = 0; stages = 0; tasks = 0; taskMs = 0L
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftdev.ListenerDrain.drain(spark.sparkContext)
      println(f"[aqeprobe] $name aqe=$aqe rep$i: $wall%.3f s | jobs=$jobs " +
        f"stages=$stages tasks=$tasks taskTime=${taskMs / 1000.0}%.1f s")
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
