package graft.examples

import org.apache.spark.sql.SparkSession

/** Cluster-shape dry run (VERDICT r5 next-7): execute a representative
  * slice of the registry under `local-cluster[2,8,...]` — REAL separate
  * executor JVMs with their own classpaths and heaps — instead of
  * `local[*]`'s single shared JVM. This catches the failure modes the
  * bench cannot see before the 100× story is claimed:
  *   - closures/Expressions that accidentally capture driver-only state
  *     (anything non-serializable, or a lazy val that only initialized
  *     on the driver);
  *   - custom codegen Expressions (`SimHash60`, `MinHashSig`,
  *     `WinnowArray`, `TopBigramRun`, `ZInterleave`, `FloatDotProduct`)
  *     compiling and evaluating inside executor JVMs that did NOT run
  *     the driver's warm-up;
  *   - exchanged rows actually round-tripping through serialization
  *     (local[*] can short-circuit fetches in-process).
  *
  * The slice spans every operator family: frontier (q1), sketch/distinct
  * (r9), iterative compute (c3), LSH dedup (d2, codegen), text codegen
  * (t7, t9), sweep-join (w3), triangle census (g1), sampled census
  * (q9b), ANN (e2), store-backed point read (n1b), durable COW (s5),
  * the dump-ingest round trip (s2c), the driver-broadcast Bloom sketch
  * probe (d6b — a Broadcast[BloomFilter] must round-trip to executor
  * JVMs), windowed mixture sampling (t13), wedge link prediction (g6),
  * star-contraction CC (c10), the typed ALS Cholesky Aggregator (c6),
  * multimodal typed mapPartitions (m1), and the label-prop-over-
  * candidate-pairs composite (x2).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
  *          sbt -batch "runMain graft.examples.ClusterProbe"
  * Requires SPARK_HOME (/opt/spark) so the worker can fork executors —
  * and SPARK_SCALA_VERSION=2.13 when SPARK_HOME is a jars-only layout
  * (the executor command builder otherwise dies with "Cannot find any
  * build directories"); graft classes reach the executors via
  * spark.executor.extraClassPath.
  */
object ClusterProbe {
  private val Slice = Seq(
    "q1_fof_excl_top20", "r9_sketch_distinct", "c3_pagerank_top20",
    "d2_dedup_minhash_lsh", "t7_winnow_fingerprints", "t10_repetition",
    "w3_sweep_in_join", "g1_triangle_count", "q9b_census_sampled",
    "e2_ann_lsh_topk", "n1_query_out_store", "s5_durable_append_compact",
    "s2c_wiki_dump_ingest", "d6b_contamination_bloom", "t13_mixture_sample",
    "g6_link_predict", "c10_cc_bigstar", "c6_als_rmse",
    "m1_multimodal_meta", "x2_neardup_clusters",
    // r7: HLL register sketches must round-trip executor JVMs (g18b),
    // label-join estimates (g19), RANGE-frame window (r16), cascaded
    // funnel aggs (r17), frontier-restricted walk ranking (g7)
    "g18b_anf_hyperloglog", "g19_landmark_distance",
    "r16_rolling_range_window", "r17_funnel_conversion", "g7_random_walks")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val master = sys.env.getOrElse("SPARK_GRAFT_PROBE_MASTER", "local-cluster[2,8,3072]")
    val classes = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft-cluster-probe")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.executor.extraClassPath", classes)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = if (args.nonEmpty) args.toSeq else Slice
    var failed = 0
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(s"[probe] $name: NOT IN REGISTRY"); failed += 1
        case Some(fn) =>
          val t0 = System.nanoTime()
          try {
            val n = fn(spark, sfDir).count()
            println(f"[probe] $name%-28s OK    rows=$n%-8d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
          } catch { case e: Throwable =>
            failed += 1
            println(s"[probe] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          }
      }
    }
    println(s"[probe] master=$master ${names.size - failed}/${names.size} ok")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
