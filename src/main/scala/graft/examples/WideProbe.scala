package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** WIDTH-axis replay (COVERAGE r8 handoff #6): the scale replays cover
  * rows (60M edges, 10M events) and corpus size (500k docs); this probe
  * covers COLUMNS — a 1M-row × 400-int-column parquet table, verifying
  * that the engine's declarative plans keep the two properties a 100 TB
  * wide fact table lives or dies by:
  *
  *   1. COLUMN PRUNING — a 3-column aggregate must reach the scan with
  *      ReadSchema listing exactly those 3 fields (not 400), and its
  *      wall-clock must be a small fraction of the all-column baseline;
  *   2. PREDICATE PUSHDOWN — a single-column filter must appear in the
  *      scan's PushedFilters, and the count must read only that column.
  *
  * The probe SELF-CHECKS (require) rather than just printing: a
  * regression in either property fails the run, not the reader's
  * attention. Both properties are Catalyst's to provide — the point of
  * the declarative discipline (SURVEY §4) is that every graft operator
  * inherits them for free, which is what this probe pins at width.
  *
  * Usage: runMain graft.examples.WideProbe [nRows=1000000] [nCols=400]
  */
object WideProbe {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nCols = if (args.length > 1) args(1).toInt else 400
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[wide] $label%-26s $s%8.2f s   (rows=$n)")
      s
    }

    val dir = java.nio.file.Files.createTempDirectory("graft-wide").toString
    val cols = (0 until nCols).map(j =>
      pmod(hash(col("id"), lit(j)), lit(1000)).as(f"v$j%03d"))
    spark.range(nRows).select(col("id") +: cols: _*)
      .write.mode("overwrite").parquet(s"$dir/wide")
    val t = spark.read.parquet(s"$dir/wide")
    println(s"== wide probe: $nRows rows x ${t.columns.length} cols ==")

    // baseline: force every column through the scan
    val allAgg = t.agg(sum(t.columns.head),
      t.columns.tail.map(c => sum(c)): _*)
    val tAll = timed("agg_all_columns") { allAgg.count() }

    // 3-column projection: ReadSchema must prune to exactly those fields
    val threeAgg = t.agg(sum("v007").as("a"), sum(f"v${nCols / 2}%03d").as("b"),
      sum(f"v${nCols - 1}%03d").as("c"))
    val tThree = timed("agg_3_columns") { threeAgg.count() }
    val threePlan = threeAgg.queryExecution.executedPlan.toString
    val readSchema = threePlan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    val nRead = "v\\d{3}".r.findAllIn(readSchema).toSet.size
    println(s"[wide] 3-col ReadSchema fields: $nRead   ($readSchema)")
    require(nRead == 3,
      s"column pruning broken: 3-column aggregate read $nRead columns")
    require(tThree < tAll / 5,
      f"pruned scan not proportionally cheaper: $tThree%.2f vs $tAll%.2f")

    // single-column filter: predicate must reach the scan
    val filt = t.filter(col("v123") === 7).select("v123")
    val tF = timed("filter_point_count") { filt.count() }
    val fPlan = filt.queryExecution.executedPlan.toString
    val pushed = fPlan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    println(s"[wide] $pushed")
    require(pushed.contains("EqualTo(v123,7)"),
      "predicate pushdown broken: EqualTo(v123,7) not in PushedFilters")
    println(f"[wide] OK: pruning ${tAll / tThree}%.1fx, filter count $tF%.2f s")
    spark.stop()
  }
}
