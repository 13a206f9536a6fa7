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
  *   - queries run on the PROJECTED working set, materialized once from
  *     the store: `select(src, dst)` prunes the scan to two of six
  *     columns (pushed to parquet) and ONE localCheckpoint holds the
  *     ~25 GB symmetric pair list for the whole query family — the plan
  *     a 1000-executor cluster would want, where the pruned edge
  *     projection fits aggregate memory even when the full table never
  *     could. The first probe run measured the alternative (re-scan the
  *     store per use): q1 went 193 s vs 7.9 s at 60M — 4 full-store
  *     scans per query is the wrong plan at every scale, not a memory
  *     saving (PERF.md records both numbers).
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
  * Usage: SPARK_DRIVER_MEM=96g runMain graft.examples.WikiEnvelopeProbe \
  *          [k=667] [existing-store-dir] [servedOnly] [noscan] [scanview]
  *          [noiter] [cchalf]
  * (a `/`-prefixed arg reuses a prior run's store, skipping the ingest
  * leg; `servedOnly` stops after the serving leg; `noscan` skips the
  * full-scan q1 — its 2·k·600k-pair checkpoint is the one working set
  * that outgrows this box's DISK first at the 1B class; `scanview`
  * instead runs q1 directly over the UN-materialized symmetric view
  * (store + reversed store as parquet scans — ~3 passes over the
  * 2-column projection, ZERO bytes materialized), the form that closes
  * the 1B full-scan leg on a disk that cannot hold the pair
  * checkpoint, and the plan a cluster would run when the query is a
  * ONE-OFF (a checkpoint only pays for itself when the working set is
  * reused across a query family); `noiter` skips the c3/c4 iterative
  * legs when a run only needs the ingest/index/query samples. The CC
  * leg runs
  * FULL-GRAPH by default via the out-of-core
  * [[graft.Traversals.connectedComponentsScan]] (r11: edges streamed
  * from the store per superstep, labels resident — nothing edge-sized
  * persists, closing the r10 `cchalf` disk bound); pass `cchalf` to run
  * the RESIDENT connectedComponents on the first k/2 copies instead,
  * as the comparison leg. PERF.md records which legs ran at which k.)
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
      // the q1s serving leg answers min(src) from parquet footer stats
      .config("spark.sql.parquet.aggregatePushdown", "true")
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
    val store = args.drop(1).find(_.startsWith("/")).getOrElse {
      val st = java.nio.file.Files.createTempDirectory("graft-wiki").toString
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
            .write.mode(SaveMode.Append).parquet(s"$st/edges")
        }
        nE
      }
      println(f"[wiki] ingest_eps ${(nE / ingestSec).toLong}")
      st
    }
    base.unpersist()

    val e = spark.read.parquet(s"$store/edges").select("src", "dst")
    val got = e.count()
    require(got == nE, s"store holds $got rows, expected $nE")

    // IN-EDGE MIRROR (VERDICT r9 wrong #1): a second materialization of
    // (src, dst) range-partitioned and sorted by dst — the reference's
    // per-shard in-edge index (QueryShard.java:662-812), paid once at
    // index-build time like FastSharder pays it at shard-write time. The
    // served FoF's reversed hop reads THIS, pruning by the mirror's dst
    // sort order — sound on real graphs where dst scatters across every
    // src-sorted file (the prior probe leaned on the disjoint-copy
    // fixture's dst locality, which a real graph doesn't have).
    val mirrorDir = s"$store/medges"
    // reuse is gated on the _SUCCESS marker, not bare existence: a
    // crashed prior run can leave a PARTIAL medges dir, and serving the
    // reversed hop from it would silently drop edges (review r10);
    // SaveMode.Overwrite below replaces any partial dir wholesale
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(mirrorDir, "_SUCCESS"))) {
      val mSec = timed("build_inedge_mirror") {
        e.repartitionByRange(128, col("dst"))
          .sortWithinPartitions("dst", "src")
          .write.mode(SaveMode.Overwrite).parquet(mirrorDir)
        nE
      }
      println(f"[wiki] mirror_eps ${(nE / mSec).toLong}")
    }
    val mirror = spark.read.parquet(mirrorDir)

    // the SERVING-path FoF — the reference's native shape for this query
    // (two rounds of edge-shard lookups, QueryShard.java:207-253): hop 1
    // collects v0's neighborhood with pushed src = v0 (primary) and
    // dst = v0 (mirror) point filters, hop 2 pushes IN (mids) into the
    // primary (src side) and the mirror (dst side) — both directions
    // prune to the files/row groups whose footer min/max cover the probe
    // keys BY SORT ORDER; min(src) comes from footer stats. ONE
    // composition shared with DurableStore.servedFof and the q1s registry
    // entry (Queries.servedFofFrom). At 100 TB the full-scan q1 below is
    // a batch job, this is the online query.
    timed("q1s_fof_served") {
      val v0 = e.agg(min(col("src"))).head().getLong(0)
      Queries.servedFofFrom(
        out = keys => e.filter(col("src").isin(keys: _*)),
        in = keys => mirror.filter(col("dst").isin(keys: _*)),
        v0 = v0).count()
    }
    if (args.contains("servedOnly")) { spark.stop(); return }

    // batch working set for q1: project to (src, dst) — pruned at the
    // parquet scan — and materialize the symmetric pair list (800M
    // pairs; fits this box the same way the pruned projection fits a
    // cluster's aggregate memory at 100 TB). Dropped right after q1:
    // c3/c4 each persist their OWN loop invariant internally, and two
    // simultaneous 800M-row materializations is exactly the disk-
    // pressure shape that OOD-failed the first rerun of this probe.
    val symView = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))

    if (args.contains("scanview")) {
      // q1 over the view itself: hop 1 is a broadcast of the one-row
      // min(src) aggregate, hop 2 re-joins the (AQE-broadcast, ~degree²
      // rows) mid list against the scan — every pass is the pruned
      // 2-column projection, nothing edge-sized is ever materialized.
      // This is the disk-honest full-scan form at the 1B class.
      timed("q1_fof_top20_scanview") {
        Queries.friendsOfFriendsExclTop20(symView).count()
      }
    } else if (!args.contains("noscan")) {
      val sym = symView.localCheckpoint(true)
      System.gc()
      timed("q1_fof_top20") { Queries.friendsOfFriendsExclTop20(sym).count() }
      sym.unpersist()
    }
    if (args.contains("noiter")) { spark.stop(); return }
    System.gc()
    // c3 runs on the DIRECTED store scan: PageRank.top20 projects and
    // persists its own loop invariants (deg, ed) hashed on src
    timed("c3_pagerank_3iter") { PageRank.top20(e, 3).count() }
    System.gc()
    // c4 gets the UNION VIEW — as PARQUET SCANS, never persisted: the
    // full-graph leg runs the OUT-OF-CORE variant
    // (Traversals.connectedComponentsScan, VERDICT r10 next #4), which
    // streams the 2·k·600k-row symmetric frame from the store per
    // superstep and keeps only the ~k·16k-row label table resident
    // (broadcast-hinted under its measured vertex gate) — the ~60 GB
    // persisted frame that disk-bounded the r10 run never exists.
    // `cchalf` keeps the RESIDENT connectedComponents on the first k/2
    // copies as the comparison leg (the r10 shape).
    if (args.contains("cchalf")) {
      val cut = (k / 2) * 10000000L
      timed(s"c4_cc_labelprop_half(k=${k / 2})") {
        Traversals.connectedComponents(
          symView.filter(col("src") < cut && col("dst") < cut)).count()
      }
    } else {
      timed("c4_cc_scan_full") {
        Traversals.connectedComponentsScan(symView,
          broadcastLabelsUpTo = 1L << 27).count()
      }
    }
    spark.stop()
  }
}
