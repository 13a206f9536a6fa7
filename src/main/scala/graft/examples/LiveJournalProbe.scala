package graft.examples

import graft._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** One-off reference-scale envelope run (VERDICT r7 missing #2): the
  * LiveJournal class. The reference's social-network example ingests
  * LiveJournal — ~69M directed edges (reference
  * SocialNetworkExample.scala:77-82) — and runs FoF / PageRank / CC /
  * MultiBFS on it; this probe rebuilds that envelope from `k` id-shifted
  * disjoint copies of the sf0.1 order graph (k=100 ≈ 60M edges) and
  * times the same workload family end to end:
  *
  *   ingest      — the Bench shard-writer shape: micro-batched
  *                 range-partitioned sorted parquet append (edges/s)
  *   q1  fof     — friends-of-friends excluding directs, top 20
  *   c3  pagerank— 3 supersteps, scaled-int, top 20
  *   c4  cc      — min-label propagation to fixpoint (symmetrized)
  *   c5b multibfs— 1,200 simultaneous seeds (the reference's own K,
  *                 MultiBFS.scala:51,61), packed state, depth 3
  *
  * Copies are disjoint, so correct plans grow linearly in k; a
  * quadratic candidate blowup, a vertex-sized broadcast, or an OOM shows
  * up immediately at this scale. Results are recorded in PERF.md.
  *
  * Usage: runMain graft.examples.LiveJournalProbe [k=100]
  */
object LiveJournalProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = args.headOption.map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder().master("local[32]")
      // 64, not 32: at 60M edges a superstep join carries ~1M rows per
      // partition; the bench default of cpus partitions would double that
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[lj] $label%-24s $s%8.2f s   (rows=$n)")
      s
    }

    val base = Tables.orderEdges(spark, dir).localCheckpoint(true)
    val e = (0 until k).map { i =>
      val off = i * 10000000L
      base.select((col("src") + off).as("src"), (col("dst") + off).as("dst"),
        col("etype"), col("ets"), col("weight"), col("rating"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    val nE = e.count()
    println(s"== LiveJournal-class probe: k=$k, $nE edges ==")

    // ingest: the Bench micro-batched sorted shard write, slice count
    // scaled with k so each batch stays file-system-reasonable
    val store = java.nio.file.Files.createTempDirectory("graft-lj").toString
    val sliced = e.withColumn("slice", pmod(col("src"), lit(4)))
      .localCheckpoint(true)
    val ingestSec = timed("ingest_sorted_store") {
      (0 until 4).foreach { s =>
        sliced.filter(col("slice") === s).drop("slice")
          .repartitionByRange(32, col("src"))
          .sortWithinPartitions("src", "dst")
          .write.mode(SaveMode.Append).parquet(s"$store/edges")
      }
      nE
    }
    println(f"[lj] ingest_eps ${(nE / ingestSec).toLong}")

    val sym = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst"),
      col("etype"), col("ets"), col("weight"), col("rating")))
      .localCheckpoint(true)

    // drop the ingest-only input before the query sections so its blocks
    // don't ride as heap pressure under the timed supersteps
    sliced.unpersist()
    System.gc()

    timed("q1_fof_top20") { Queries.friendsOfFriendsExclTop20(sym).count() }
    System.gc()
    timed("c3_pagerank_3iter") { PageRank.top20(e, 3).count() }
    System.gc()
    timed("c4_cc_labelprop") {
      Traversals.connectedComponents(sym.select("src", "dst")).count()
    }
    System.gc()
    // the designed web-scale CC path (SoCC'14 star contraction, O(log n)
    // rounds, hub-proof partial-min) next to the ref-exact label-prop —
    // at diameter-bound graphs label-prop's superstep count is the cost,
    // big-star's round count is data-size-logarithmic
    timed("c10_cc_bigstar") {
      Traversals.ccBigStar(sym.select("src", "dst")).count()
    }
    System.gc()
    // seeds are the 1,200 smallest src ids — all inside the FIRST copy,
    // so packed state stays one-copy-vertex-bounded (the disjointness
    // argument; the frontier never crosses copies)
    val seeds = sym.select("src").distinct().orderBy("src")
      .limit(1200).collect().map(_.getLong(0)).toSeq
    timed("c5b_multibfs_1200") {
      MultiBFSPacked.run(spark, sym.select("src", "dst"), seeds, maxDepth = 3).count()
    }
    spark.stop()
  }
}
