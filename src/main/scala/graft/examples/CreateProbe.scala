package graft.examples

import graft._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-phase timing of the DurableStore lifecycle legs that
  * dominate p4b/s21/s5 (guide §1 — attribute before optimizing). */
object CreateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[createprobe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    Tables.lineitem(spark, dir).count()
    (1 to 2).foreach { rep =>
      println(s"[createprobe] --- rep $rep ---")
      val edges = Tables.orderEdges(spark, dir)
      val (e, n) = t("checkpoint+count input") { Traversals.checkpointCount(edges) }
      println(s"[createprobe] rows=$n")
      val root = java.nio.file.Files.createTempDirectory("graft-cp").toString
      val st = t("create (store build)") { DurableStore.create(spark, e, root) }
      val v0 = t("min src (driver read)") {
        e.agg(min("src")).head().getLong(0) }
      val w = t("min dst of v0") {
        st.read(1).filter(col("src") === v0).agg(min("dst")).head().getLong(0) }
      val v2 = t("tombstone delete") { st.deleteEdgeTombstone(1, v0, w) }
      val v3 = t("compact") { st.compact(v2) }
      val _ = t("read+agg latest") {
        st.read(v3).agg(count(lit(1)), sum(col("weight"))).head() }
    }
    spark.stop()
  }
}
