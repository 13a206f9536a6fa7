package graft.examples

import graft._
import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans for representative queries so the
  * pushdown / broadcast / codegen story can be audited (see PERF.md).
  * Usage: runMain graft.examples.ExplainAudit [sfDir] [name ...] */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("p7_column_select", "q1_fof_excl_top20", "w2_sweep_in_interval",
        "n3_query_out_multiple", "w1_lineitem_agg", "e1_ann_bruteforce_topk",
        // r3: cell-partition pruning (PartitionFilters: [cid IN …]),
        // manifest-pruned durable point read, codegen simhash projection
        "e3b_ann_ivf_store_topk", "n1_query_out_durable", "d4_dedup_simhash",
        // late r4: broadcast-bench contamination, one-shuffle degrees,
        // sortless argmin n7, winnowing narrow projection
        "d6_contamination", "n6_degrees", "n7_random_vertex", "t7_winnow_fingerprints",
        // r5: one-shuffle sequence packing (lang partitioning satisfies the
        // downstream (lang, seq_id) clustering — no second exchange),
        // vocab-broadcast rarity join, skew-fixture degrees/FoF
        "t8_sequence_pack", "t9_rarity_score", "z1_zipf_degrees", "z2_zipf_fof_top20",
        // late r5: zero-shuffle minhash signatures (one codegen call/row
        // before the band join), z-ordered 2-D range sweep (both ranges
        // in PushedFilters), degree-oriented triangles, repetition
        // filters as a pure projection, argmax latest-per-key
        "d2_dedup_minhash_lsh", "w5_zorder_range", "g1_triangle_count",
        "t10_repetition", "r13_latest_per_key",
        // r7: exchange-free bucketed fact⋈fact join, banded Hamming
        // near-dup join, vocab-broadcast tf-idf
        "w6_bucketed_join", "e9_hamming_neardup", "t16_tfidf_topterms",
        // late r7: runtime partition pruning (dynamicpruning on the day
        // scan), RANGE-frame window (no self-join), constant-width
        // count-min grid, blocked fuzzy ER join
        "w7_dpp_day_prune", "r16_rolling_range_window",
        "t19_countmin_sketch", "d11_fuzzy_blocked_join",
        // r7 continuation: single-shuffle PIT feature frame (one user_id
        // exchange feeds every feature), zero-shuffle chunking/classifier
        // projections, broadcast-dim markov lag, canonical-URL keyed
        // dedup, tiny-histogram curriculum (no global ntile sort)
        "x6_feature_join_pit", "t22_chunking", "t23_quality_classifier",
        "r20_markov_transitions", "d13_url_canonical_dedup",
        "x7_curriculum_buckets", "w8_schema_evolution")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
