package graft.examples

import graft._
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-scale envelope run at the WIKI class (VERDICT r8 missing
  * #1): the reference's largest published single-machine workload is the
  * Wikipedia graph — 42.4M pages / >400M links ingested and queried on
  * one box (reference `WikipediaGraph.scala:41-43,76`, `README.md:177`,
  * "billions of edges" `README.md:6`). [[LiveJournalProbe]] closed the
  * 60M-edge LiveJournal class; this probe runs the >400M-link class.
  *
  * Same disjoint-copy construction (k id-shifted copies of the sf0.1
  * order graph, ~600k edges each), different plumbing for the 6.7×
  * scale-up — the changes ARE the findings:
  *
  *   - ingest GENERATES per micro-batch instead of pre-checkpointing the
  *     full edge list: at 400M rows the LiveJournalProbe's
  *     `localCheckpoint` input (~20 GB of block-manager state) would
  *     shoulder out the shuffle memory the timed queries need. Each
  *     batch is a group of copies built from the (tiny, checkpointed)
  *     base by column arithmetic, range-partitioned, sorted, appended —
  *     the Bench shard-writer shape, rate reported as edges/s.
  *   - queries read BACK FROM THE STORE (one parquet scan per superstep)
  *     instead of a cached DataFrame — the honest 100 TB shape, where
  *     the working set never fits an executor tier and every iteration
  *     re-reads columnar storage. Supersteps pay a scan (~seconds at
  *     400M rows) instead of the probe paying a resident 20 GB cache.
  *
  * Workload after ingest, per the VERDICT r8 #7 recipe (q1/c3/c4 once):
  *   q1  fof      — friends-of-friends excluding directs, top 20
  *   c3  pagerank — 3 supersteps, scaled-int, top 20
  *   c4  cc       — min-label propagation to fixpoint (symmetrized)
  *
  * Copies are disjoint, so a correct plan grows linearly in k; gates:
  * no OOM, ingest ≥ 1M edges/s, q1 within 4× of its 60M-edge time.
  * Results go to PERF.md next to the LiveJournal table.
  *
  * Usage: SPARK_DRIVER_MEM=96g runMain graft.examples.WikiEnvelopeProbe [k=667]
  */
object WikiEnvelopeProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = args.headOption.map(_.toInt).getOrElse(667)
    val spark = SparkSession.builder().master("local[32]")
      // 128 partitions: a c4 superstep at 400M directed edges joins ~800M
      // symmetric rows — 128 keeps a partition near ~6M rows (the same
      // per-partition budget LiveJournalProbe's 64 gave 60M edges)
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[wiki] $label%-24s $s%8.2f s   (rows=$n)")
      s
    }

    val base = Tables.orderEdges(spark, dir).localCheckpoint(true)
    val nBase = base.count()
    val nE = nBase * k
    println(s"== Wiki-class envelope probe: k=$k, $nE edges ==")

    // ingest: micro-batches of `group` copies each, generated on the fly
    // from the checkpointed base (offset arithmetic only — the cost that
    // matters, range partition + sort + parquet append, is all inside the
    // timed section, same as LiveJournalProbe's)
    val store = java.nio.file.Files.createTempDirectory("graft-wiki").toString
    val group = 32
    val cols = Seq("etype", "ets", "weight", "rating").map(col)
    def copies(lo: Int, hi: Int) = (lo until hi).map { i =>
      val off = i * 10000000L
      base.select(((col("src") + off).as("src") +: (col("dst") + off).as("dst") +: cols): _*)
    }.reduce(_ unionByName _)
    val ingestSec = timed("ingest_sorted_store") {
      (0 until k by group).foreach { lo =>
        copies(lo, math.min(lo + group, k))
          .repartitionByRange(32, col("src"))
          .sortWithinPartitions("src", "dst")
          .write.mode(SaveMode.Append).parquet(s"$store/edges")
      }
      nE
    }
    println(f"[wiki] ingest_eps ${(nE / ingestSec).toLong}")

    // queries read back from the store — every superstep re-scans parquet
    val e = spark.read.parquet(s"$store/edges")
    val got = e.count()
    require(got == nE, s"store holds $got rows, expected $nE")
    def sym = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst"),
      col("etype"), col("ets"), col("weight"), col("rating")))

    System.gc()
    timed("q1_fof_top20") { Queries.friendsOfFriendsExclTop20(sym).count() }
    System.gc()
    timed("c3_pagerank_3iter") { PageRank.top20(e, 3).count() }
    System.gc()
    timed("c4_cc_labelprop") {
      Traversals.connectedComponents(sym.select("src", "dst")).count()
    }
    spark.stop()
  }
}
