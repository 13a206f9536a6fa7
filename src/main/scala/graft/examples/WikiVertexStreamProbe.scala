package graft.examples

import graft._
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 1B-scale probes (VERDICT r13 next #6/#7) over the adopted
  * billion-edge store a [[WikiEnvelopeProbe]] run left behind:
  *
  *  1. The VERTEX BULK-BUILD spread adjudication: r13 measured the
  *     `setVertexTable`-over-every-distinct-src leg at 21.7 s and
  *     70.5 s across two passes and attributed the spread to page-cache
  *     pressure after compaction. This probe runs the SAME leg twice at
  *     one HEAD — once COLD (page cache dropped via
  *     /proc/sys/vm/drop_caches when writable, reported either way) and
  *     once WARM immediately after — so the spread gets a measured
  *     verdict instead of an attribution.
  *
  *  2. The VERTEX-STREAM auto-compaction leg: r13's 1B soak covered
  *     EDGE-side pressure (CDC tombstones) only. Here a REAL Structured
  *     Streaming vertex-upsert feed ([[graft.streaming.OnlineIngest
  *     .ingestVertexUpserts]], its own vLastBatch watermark) drives
  *     delta-row pressure through [[DurableStore.compactIfPressured]]
  *     mid-stream — compactEvery is set beyond reach so ONLY the
  *     pressure hook can compact — while serving clients hammer the
  *     zero-job served getMany. Requires: the hook committed its own
  *     compactions, zero refusals, final values = the feed's
  *     latest-wins model.
  *
  * Usage: runMain graft.examples.WikiVertexStreamProbe <wiki-store-dir>
  */
object WikiVertexStreamProbe {
  def main(args: Array[String]): Unit = {
    val store = args.headOption.getOrElse(
      sys.error("usage: WikiVertexStreamProbe <wiki-store-dir>"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def dropCaches(): Boolean =
      try {
        new ProcessBuilder("sh", "-c", "sync && echo 3 > /proc/sys/vm/drop_caches")
          .start().waitFor() == 0
      } catch { case scala.util.control.NonFatal(_) => false }

    val edgesDir = s"$store/edges"
    val mirrorDir = s"$store/amedges"
    require(java.nio.file.Files.exists(
      java.nio.file.Paths.get(mirrorDir, "_SUCCESS")),
      s"run WikiAdoptServeProbe first to build $mirrorDir")
    var t0 = System.nanoTime()
    val st = DurableStore.adopt(spark, edgesDir,
      java.nio.file.Files.createTempDirectory("graft-wiki-vsp").toString,
      mirrorDir = Some(mirrorDir), numBuckets = 32)
    println(f"[vsp] adopt               ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
      f"   (${st.manifest(1).files.map(_.rows).sum}%,d edges)")

    // ---- item 6: vertex bulk-build, COLD then WARM at one HEAD ----
    val vprops = st.read(1).select(col("src").as("id")).distinct()
      .withColumn("label", lit("v"))
      .withColumn("score", pmod(col("id"), lit(100L)))
    val dropped = dropCaches()
    t0 = System.nanoTime()
    val vv1 = st.setVertexTable(1, vprops,
      defaults = Map("label" -> "'auto'", "score" -> "0"))
    val coldS = (System.nanoTime() - t0) / 1e9
    val nVerts = st.manifest(vv1).vfiles.map(_.rows).sum
    println(f"[vsp] vertex_bulk_cold    $coldS%8.2f s   " +
      f"($nVerts%,d vertices, cache_dropped=$dropped)")
    t0 = System.nanoTime()
    val vv2 = st.setVertexTable(1, vprops,
      defaults = Map("label" -> "'auto'", "score" -> "0"))
    val warmS = (System.nanoTime() - t0) / 1e9
    println(f"[vsp] vertex_bulk_warm    $warmS%8.2f s   " +
      f"(same leg, page cache warm; cold/warm = ${coldS / warmS}%.2fx)")

    // ---- item 7: streaming vertex upserts trip the PRESSURE hook ----
    // sampled real ids: 4 batches x 50k upserts; trigger at 60k delta
    // rows so batch cadence alone cannot explain a compaction
    val ids = st.readVertices(vv2).select("id")
      .orderBy(col("id")).limit(200000)
      .collect().map(_.getLong(0))
    val batches = ids.grouped(50000).toSeq.take(4)
    val watch = java.nio.file.Files
      .createTempDirectory("graft-vsp-feed").toString
    val s = spark
    import s.implicits._
    batches.zipWithIndex.foreach { case (b, i) =>
      b.toSeq.toDF("id")
        .withColumn("label", lit(s"b$i"))
        .withColumn("score", col("id") % 100 + lit((i + 1) * 1000L))
        .coalesce(1).write.parquet(s"$watch/b$i.parquet")
      val t = java.nio.file.attribute.FileTime
        .fromMillis(System.currentTimeMillis - (batches.size - i) * 60000L)
      val walk = java.nio.file.Files.walk(
        java.nio.file.Paths.get(s"$watch/b$i.parquet"))
      try walk.forEach(f =>
        { java.nio.file.Files.setLastModifiedTime(f, t); () })
      finally walk.close()
    }
    // last-batch ids overlap batch 0's range? batches are disjoint id
    // ranges; latest-wins is pinned by the registry's s22 — here the
    // model is simply "each id carries its own batch's values"
    val ast = new DurableStore(spark, st.root, autoCompact = true,
      autoDeltaRowTrigger = 60000, autoTombRowTrigger = Long.MaxValue / 2,
      autoLiveFileTrigger = Int.MaxValue)
    val probe64 = ids.take(64)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val lat = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val refused = new java.util.concurrent.atomic.AtomicInteger()
    val clients = (0 until 4).map { c =>
      val t = new Thread(() => {
        while (!stop.get()) {
          val s0 = System.nanoTime()
          val r = ast.servedVertexRows(ast.currentVersion, probe64)
          lat.add(System.nanoTime() - s0)
          if (r.isEmpty) refused.incrementAndGet()
        }
      }, s"vsp-client-$c")
      t.start(); t
    }
    val vBefore = ast.currentVersion
    t0 = System.nanoTime()
    val schema = spark.read.parquet(s"$watch/b0.parquet").schema
    graft.streaming.OnlineIngest
      .ingestVertexUpserts(spark, schema, s"$watch/*", ast,
        compactEvery = Int.MaxValue) // only the pressure hook may compact
      .awaitTermination()
    val wallS = (System.nanoTime() - t0) / 1e9
    stop.set(true)
    clients.foreach(_.join())
    val all = {
      val b = Seq.newBuilder[Long]
      val it = lat.iterator(); while (it.hasNext) b += it.next().longValue()
      b.result()
    }
    def med(xs: Seq[Long]) = xs.sorted.apply(xs.size / 2) / 1e6
    def p99(xs: Seq[Long]) = xs.sorted.apply((xs.size * 99) / 100) / 1e6
    val vAfter = ast.currentVersion
    val mEnd = ast.manifest(vAfter)
    val liveDelta = mEnd.vfiles.filterNot(_.sorted).map(_.rows).sum
    require(vAfter > vBefore + batches.size,
      s"pressure hook never compacted (v$vBefore -> v$vAfter over ${batches.size} batches)")
    require(liveDelta <= 60000 + 50000,
      s"hook let vertex deltas accumulate: $liveDelta live delta rows")
    require(refused.get() == 0, s"${refused.get()} getMany refusals mid-stream")
    // final state: every probed id serves ITS batch's values
    val fin = ast.servedVertexRows(vAfter, probe64).get
    require(fin.size == probe64.length, "getMany missed streamed ids")
    fin.foreach { r =>
      val (id, label, score) =
        (r(0).asInstanceOf[Long], r(1).asInstanceOf[String], r(2).asInstanceOf[Long])
      val bi = batches.indexWhere(_.contains(id))
      require(label == s"b$bi" && score == id % 100 + (bi + 1) * 1000L,
        s"streamed value wrong for $id: ($label, $score)")
    }
    println(f"[vsp] vertex_stream_soak  $wallS%8.2f s   " +
      f"(v$vBefore -> v$vAfter, ${batches.size} batches x 50k upserts, " +
      f"hook compactions ${vAfter - vBefore - batches.size}, " +
      f"live delta rows $liveDelta, ${all.size / wallS}%.1f qps during, " +
      f"median ${med(all)}%.1f ms, p99 ${p99(all)}%.1f ms, refused=0)")
    spark.stop()
  }
}
