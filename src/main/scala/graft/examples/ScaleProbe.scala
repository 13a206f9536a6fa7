package graft.examples

import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale check: replicate the sf0.1 order graph K× as disjoint
  * id-shifted copies and re-time the headline operators. Near-linear
  * growth (vs quadratic blowup or OOM) is the evidence that the plans —
  * broadcast frontier joins, partial aggs, checkpointed supersteps —
  * survive a scale-up; run with K=8 → 4.8M edges locally.
  *
  * Also times a deliberately skewed variant (every copy's edges
  * redirected to ONE hot supplier) to exercise AQE's skew handling.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = args.headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s   (rows=$n)")
    }

    val base = Tables.orderEdges(spark, dir).localCheckpoint(true)
    def replicate(copies: Int): DataFrame =
      (0 until copies).map { i =>
        val off = i * 10000000L
        base.select((col("src") + off).as("src"), (col("dst") + off).as("dst"),
          col("etype"), col("ets"), col("weight"), col("rating"))
      }.reduce(_ unionByName _).localCheckpoint(true)

    for (copies <- Seq(1, k)) {
      val e = replicate(copies)
      println(s"== ${copies}x = ${e.count()} edges ==")
      val sym = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst"),
        col("etype"), col("ets"), col("weight"), col("rating")))
      timed(s"fof_top20 x$copies") { Queries.friendsOfFriendsExclTop20(sym).count() }
      timed(s"pagerank_3iter x$copies") { PageRank.top20(e, 3).count() }
      timed(s"cc_labelprop x$copies") {
        Traversals.connectedComponents(sym.select("src", "dst")).count()
      }
      timed(s"degrees x$copies") {
        new GraphDB(spark, e, spark.emptyDataFrame).degrees.count()
      }
      timed(s"dedup_exact-ish groupBy x$copies") {
        e.groupBy("src", "dst").count().count()
      }
    }

    // MultiBFS at reference scale: 1,200 simultaneous seeds (exactly the
    // reference's run, MultiBFS.scala:51,61) over the Kx symmetric graph —
    // packed state is K ints/vertex (V·1200·4B ≈ 80 MB at 16×), one
    // frontier-only scatter per superstep
    {
      val e = replicate(k)
      val sym = e.select("src", "dst")
        .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint(true)
      val seeds = sym.select("src").distinct().orderBy("src")
        .limit(1200).collect().map(_.getLong(0)).toSeq
      timed(s"multibfs_1200seeds x$k") {
        MultiBFSPacked.run(spark, sym, seeds, maxDepth = 3).count()
      }
    }

    // d4 SimHash: single-pass per-document array aggregate vs the r2
    // explode-per-bit form (60× row amplification) on Kx documents
    {
      val docs = Tables.documents(spark, dir).localCheckpoint(true)
      val docsK = (0 until k).map { i =>
        docs.select((col("doc_id") + i * 10000000L).as("doc_id"), col("text"))
      }.reduce(_ unionByName _).localCheckpoint(true)
      // one untimed pass each so JIT/codegen warmup doesn't mask the
      // steady-state CPU difference (the quantity that scales)
      Dedup.simhash(docsK).count(); Dedup.simhashExploded(docsK).count()
      timed(s"d4_simhash_singlepass x$k") { Dedup.simhash(docsK).count() }
      timed(s"d4_simhash_exploded x$k") { Dedup.simhashExploded(docsK).count() }
      // d6 contamination: corpus grams hit the broadcast bench join raw —
      // growth should track the SCAN (linear in docs), because the only
      // shuffle carries contaminated rows (id-shifting replicas keeps the
      // doc_id%20 benchmark fraction constant while K× the corpus)
      Dedup.contamination(docs).count() // untimed codegen warmup (as d4)
      timed(s"d6_contamination x1") { Dedup.contamination(docs).count() }
      timed(s"d6_contamination x$k") { Dedup.contamination(docsK).count() }
      // x1 corpus-build composite: filter+fingerprint-groupBy+semi-join —
      // all keyed shuffles, linear growth expected
      timed(s"x1_training_prep x$k") {
        TextOps.trainingDataPrep(docsK.withColumn("lang", lit("en"))).count()
      }
    }

    // d5 embedding near-dup: LSH-candidate path vs all-pairs growth.
    // Replicating embeddings Kx (id-shifted) multiplies true pairs by K;
    // all-pairs work grows K^2 while the bucketed path stays near-linear
    // (bits scale with log n via Similarity.bitsFor)
    {
      val emb = Tables.embeddings(spark, dir).localCheckpoint(true)
      def embCopies(copies: Int): DataFrame =
        (0 until copies).map { i =>
          emb.select((col("vec_id") + i * 10000000L).as("vec_id"), col("embedding"))
        }.reduce(_ unionByName _).localCheckpoint(true)
      val ec1 = embCopies(1)
      timed(s"d5_lsh_cosine_pairs x1") {
        Similarity.cosinePairsLsh(ec1, 400000L).count()
      }
      val ecK = embCopies(k) // reused by both K-scale timings
      timed(s"d5_lsh_cosine_pairs x$k") {
        Similarity.cosinePairsLsh(ecK, 400000L).count()
      }
      timed(s"d5_allpairs_cosine x$k") {
        Similarity.cosinePairs(ecK, 400000L).count()
      }
      // e3 IVF ANN: distributed centroid pick (r3) — query cost ∝ probed
      // fraction, no global single-partition window anywhere in the plan
      timed(s"e3_ivf_topk x1") {
        Similarity.ivfTopK(ec1, k = 10, nCells = 16, nprobe = 4).count()
      }
      timed(s"e3_ivf_topk x$k") {
        Similarity.ivfTopK(ecK, k = 10, nCells = 16, nprobe = 4).count()
      }
    }

    // DurableStore at Kx: a src-keyed point mutation must rewrite ONE
    // bucket (copy-on-write routed by manifest stats) — its cost tracks
    // bucket size, not table size; compaction folds appended deltas back
    // into sorted buckets
    {
      val e = replicate(k)
      val root = java.nio.file.Files.createTempDirectory("graft-probe-ds").toString
      var st: graft.DurableStore = null
      timed(s"durable_create x$k") {
        st = graft.DurableStore.create(spark, e, root, numBuckets = 16)
        st.read(1).count()
      }
      val v = e.agg(min("src")).head().getLong(0)
      timed(s"durable_point_update x$k") {
        val nv = st.updateEdges(1, col("src") === v, "rating", lit(9), srcKey = Some(v))
        st.manifest(nv).files.count(f => !st.manifest(1).files.exists(_.path == f.path)).toLong
      }
      timed(s"durable_append+compact x$k") {
        val va = st.append(1, e.filter(col("src") === v))
        st.read(st.compact(va)).count()
      }
      // size-triggered bucket split: a broad delta pushes every bucket
      // past the (lowered) threshold — compaction splits them at their
      // median src in the SAME one-shuffle write; reported rows = buckets
      // added to the topology
      timed(s"durable_compact_split x$k") {
        val va = st.append(st.currentVersion, e.filter(col("src") % 10 === 0))
        val vc = st.compact(va, maxBucketRows = 256L << 10)
        (st.manifest(vc).bounds.size - st.manifest(1).bounds.size).toLong
      }
    }

    // power-law probe (VERDICT r3 §next-7): the TPC-H fixtures are
    // uniform, but the reference's workloads (LiveJournal, Twitter —
    // SocialNetworkExample.scala:77-82) are heavy-tailed. Redirect every
    // dst to a zipf-distributed supplier, p(rank) ∝ 1/rank via the
    // inverse-CDF draw ceil(N^u), and re-time the graph operators next to
    // their uniform rows above.
    {
      val e = replicate(k)
      val nSup = e.select("dst").distinct().count()
      val zipf = e.withColumn("dst",
          (lit(Tables.SupplierBase) + ceil(pow(lit(nSup.toDouble), rand(13)))).cast("long"))
        .localCheckpoint(true)
      val hot = zipf.groupBy("dst").count().orderBy(col("count").desc).limit(3)
        .collect().map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(", ")
      println(s"== zipfian dst over $nSup keys (${zipf.count()} edges; hottest $hot) ==")
      val zsym = zipf.unionByName(zipf.select(col("dst").as("src"), col("src").as("dst"),
        col("etype"), col("ets"), col("weight"), col("rating"))).localCheckpoint(true)
      timed(s"degrees zipf x$k") {
        new GraphDB(spark, zipf, spark.emptyDataFrame).degrees.count()
      }
      timed(s"fof_top20 zipf x$k") { Queries.friendsOfFriendsExclTop20(zsym).count() }
      timed(s"pagerank_3iter zipf x$k") { PageRank.top20(zipf, 3).count() }
      timed(s"cc_labelprop zipf x$k") {
        Traversals.connectedComponents(zsym.select("src", "dst")).count()
      }
    }

    // skew: all replicas hammer one hot dst
    val skewed = replicate(k).withColumn("dst",
      when(rand(7) < 0.5, lit(1000001L)).otherwise(col("dst")))
      .localCheckpoint(true)
    println(s"== skewed (50% of ${skewed.count()} edges on one key) ==")
    timed("degrees skewed") {
      new GraphDB(spark, skewed, spark.emptyDataFrame).degrees.count()
    }
    timed("join-on-skewed-dst") {
      val names = skewed.select(col("dst").as("id")).distinct()
        .withColumn("name", concat(lit("s"), col("id")))
      skewed.join(names, skewed("dst") === names("id")).count()
    }
    spark.stop()
  }
}
