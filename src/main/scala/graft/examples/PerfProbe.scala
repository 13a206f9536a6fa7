package graft.examples

import graft._
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Ad-hoc timing probe for a single registry entry (dev tool).
  * Usage: runMain graft.examples.PerfProbe <sfDir> <name> [reps]
  *
  * Prints, per rep, the entry's wall-clock plus the Spark-side job
  * breakdown (job count, per-job wall ms, stage/task counts, summed task
  * time) — the measure-first evidence (guide §1) separating driver-side
  * planning cost from executed work in a superstep loop. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.lift(1).getOrElse("c3_pagerank_top20")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
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
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobWall = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val execSite = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            execSite.put(s.executionId, s.description.takeWhile(_ != '\n').trim)
          case _ => ()
        }
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1
        // label = the SQL execution's action callsite (AQE submits stage
        // jobs from its async pool, so stage/RDD callsites are useless)
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
          .flatMap(id => Option(execSite.get(id.toLong))).getOrElse("")
        jobStart.put(j.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(jobStart.remove(j.jobId))
          .foreach { case (t0, site) =>
            jobWall.add(((System.nanoTime() - t0) / 1000000L, site)) }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages += 1
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks += 1
        if (t.taskInfo != null) taskMs += t.taskInfo.duration
      }
    })

    Tables.lineitem(spark, dir).count() // session warm
    (1 to reps).foreach { i =>
      jobs = 0; stages = 0; tasks = 0; taskMs = 0L; jobWall.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // deterministic drain (ADVICE r14 #3): block until the async
      // listener bus has delivered every event from this rep before the
      // counters are read (and reset by the next rep)
      org.apache.spark.graftdev.ListenerDrain.drain(spark.sparkContext)
      import scala.jdk.CollectionConverters._
      val jw = jobWall.asScala.toSeq.sortBy(-_._1)
      println(f"[probe] $name rep$i: $wall%.3f s | jobs=$jobs stages=$stages " +
        f"tasks=$tasks taskTime=${taskMs / 1000.0}%.1f s | " +
        s"jobWallMs top=${jw.take(10).map { case (ms, s) => s"$ms@$s" }.mkString(",")} " +
        s"sum=${jw.map(_._1).sum}")
    }
    spark.stop()
  }
}
