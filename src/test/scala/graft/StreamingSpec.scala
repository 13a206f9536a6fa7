package graft

import graft.streaming.OnlineIngest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** S1 online ingest (read-your-writes) + C2 continuous computation +
  * watermarked windowed aggregation, driven through real Structured
  * Streaming with file-source micro-batches. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val edgeSchema = StructType(Seq(
    StructField("src", LongType), StructField("dst", LongType),
    StructField("etype", IntegerType)))

  test("online ingest: every micro-batch is visible to the snapshot (read-your-writes)") {
    val dir = Files.createTempDirectory("graft-stream").toString
    // two micro-batches land as separate files
    TestSpark.edgesDF(Seq((0L, 1L, 0), (1L, 2L, 0))).write.parquet(s"$dir/b0.parquet")
    TestSpark.edgesDF(Seq((2L, 3L, 0))).write.parquet(s"$dir/b1.parquet")
    val base = new GraphDB(spark, spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], edgeSchema), spark.emptyDataFrame)

    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    var last: GraphDB = base
    val q = OnlineIngest.ingest(spark, edgeSchema, s"$dir/*", base, (snap, _) => {
      seen += snap.edges.count() // C2: computation over the live snapshot
      last = snap
    })
    q.awaitTermination()
    assert(seen.last == 3L)            // all ingested edges visible
    assert(seen.sorted == seen)        // snapshots only grow
    assert(last.queryOut(lit(2L)).count() == 1L) // queries see buffered edges
  }

  test("continuous PageRank during ingest: per-batch fixpoints, final equals batch answer") {
    // C2 literally (reference GraphChiDatabase.scala:2258-2283 runs
    // continuous PageRank while inserting): the algorithm runs on EVERY
    // micro-batch snapshot; the last snapshot's result must equal the
    // plain batch computation over all edges
    val dir = Files.createTempDirectory("graft-c2").toString
    val chain = Seq((0L, 1L, 0), (1L, 2L, 0), (2L, 3L, 0))
    val extra = Seq((3L, 0L, 0), (1L, 3L, 0))
    TestSpark.edgesDF(chain).coalesce(1).write.parquet(s"$dir/b0.parquet")
    TestSpark.edgesDF(extra).coalesce(1).write.parquet(s"$dir/b1.parquet")
    val base = new GraphDB(spark, spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], edgeSchema), spark.emptyDataFrame)
    val perBatch = scala.collection.mutable.ArrayBuffer[Seq[(Long, Long)]]()
    OnlineIngest.ingest(spark, edgeSchema, s"$dir/*", base, (snap, _) => {
      perBatch += PageRank.top20(snap.edges, iters = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }).awaitTermination()
    assert(perBatch.size == 2, "one computation per micro-batch")
    val batch = PageRank.top20(TestSpark.edgesDF(chain ++ extra), iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(perBatch.last == batch,
      "continuous result on the final snapshot must equal the batch fixpoint")
    assert(perBatch.head != batch, "intermediate snapshot differs (fewer edges)")
  }

  test("durable ingest: micro-batches commit to the store, compaction bounds the file count") {
    val dir = Files.createTempDirectory("graft-dstream").toString
    // four micro-batches (maxFilesPerTrigger=1) with an edge-table schema
    val sch = StructType(Seq(StructField("src", LongType), StructField("dst", LongType),
      StructField("etype", IntegerType), StructField("w", LongType)))
    val s = spark; import s.implicits._
    def batch(rows: (Long, Long)*) =
      rows.toDF("src", "dst").select(col("src"), col("dst"),
        lit(0).as("etype"), (col("src") * 10 + col("dst")).as("w"))
    (0 until 4).foreach(i => batch((30L + i, 7L)).write.parquet(s"$dir/b$i.parquet"))

    val store = DurableStore.create(spark, batch((1L, 7L), (9L, 8L)),
      Files.createTempDirectory("graft-dstore").toString, numBuckets = 2)
    val q = graft.streaming.OnlineIngest.ingestDurable(spark, sch, s"$dir/*", store,
      compactEvery = 4)
    q.awaitTermination()

    // reopen cold: all 6 edges are durably visible
    val re = new DurableStore(spark, store.root)
    val got = re.readLatest().select("src").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 9L, 30L, 31L, 32L, 33L))
    // the 4th batch triggered compaction: no deltas left, file count is
    // back to ~bucket count instead of base+4 micro-batch files
    val m = re.manifest(re.currentVersion)
    assert(m.files.forall(_.sorted), s"deltas survived: $m")
    assert(m.files.size <= 3)
  }

  test("durable ingest restart: checkpoint resumes batch ids, no re-appends") {
    val dir = Files.createTempDirectory("graft-drestart").toString
    val sch = StructType(Seq(StructField("src", LongType), StructField("dst", LongType),
      StructField("etype", IntegerType), StructField("w", LongType)))
    val s = spark; import s.implicits._
    def batch(rows: (Long, Long)*) =
      rows.toDF("src", "dst").select(col("src"), col("dst"),
        lit(0).as("etype"), (col("src") * 10 + col("dst")).as("w"))
    val store = DurableStore.create(spark, batch((1L, 7L)),
      Files.createTempDirectory("graft-drs").toString, numBuckets = 2)

    // run 1: two files drain as batches 0, 1
    batch((20L, 7L)).write.parquet(s"$dir/b0.parquet")
    batch((21L, 7L)).write.parquet(s"$dir/b1.parquet")
    graft.streaming.OnlineIngest.ingestDurable(spark, sch, s"$dir/*", store)
      .awaitTermination()
    val v1 = new DurableStore(spark, store.root)
    assert(v1.manifest(v1.currentVersion).lastBatch == 1L)

    // run 2 (restart, same checkpoint): only the NEW files are processed —
    // the checkpoint advances the source, the manifest watermark guards
    // any foreachBatch retry; old edges must appear exactly once
    batch((22L, 7L)).write.parquet(s"$dir/b2.parquet")
    graft.streaming.OnlineIngest.ingestDurable(spark, sch, s"$dir/*", store)
      .awaitTermination()
    // run 3 (restart with nothing new): a no-op
    graft.streaming.OnlineIngest.ingestDurable(spark, sch, s"$dir/*", store)
      .awaitTermination()

    val re = new DurableStore(spark, store.root)
    assert(re.manifest(re.currentVersion).lastBatch == 2L)
    val got = re.readLatest().groupBy("src").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 20L -> 1L, 21L -> 1L, 22L -> 1L),
      s"every batch exactly once, got $got")
  }

  test("stateful sessionization closes sessions on gap (flatMapGroupsWithState)") {
    val dir = Files.createTempDirectory("graft-sess").toString
    val s = spark; import s.implicits._
    val m = 60L * 1000 * 1000 * 1000 // a minute in nanos
    val base = 6000L * m // away from epoch 0: ts=0 would be <= the initial watermark
    // user 7: two events close together, then one 2h later -> first session closes
    Seq((base, 7L, 1.0), (base + 5L * m, 7L, 2.0), (base + 120L * m, 7L, 4.0))
      .toDF("ts", "user_id", "value").write.parquet(s"$dir/e0.parquet")
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("ts", LongType),
        StructField("user_id", LongType), StructField("value", DoubleType))))
      .parquet(s"$dir/*")
    val q = graft.streaming.OnlineIngest.sessionize(stream, gapUs = 30L * 60 * 1000000)
      .writeStream.outputMode("append").format("memory").queryName("sessout").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("sessout").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val baseUs = 6000L * 60 * 1000000
    // 1.0 + 2.0 dollars = 300 integer cents (float sums are order-dependent;
    // the sessionizer accumulates cents, the repo's parity convention)
    assert(got.toSeq == Seq((7L, baseUs, baseUs + 5L * 60 * 1000000, 2L, 300L)))
  }

  test("sessionizer: far-earlier straggler emits its own session, near-earlier extends start") {
    val dir = Files.createTempDirectory("graft-sess-str").toString
    val s = spark; import s.implicits._
    val m = 60L * 1000 * 1000 * 1000
    val base = 6000L * m
    // batch 0 opens a session at +120 min; batch 1 delivers one straggler
    // 50 min EARLIER (beyond the 30-min gap -> its own session, and
    // safely INSIDE the 1 h watermark horizon so delivery can't race the
    // watermark update) and one 10 min earlier (in gap -> extends start)
    Seq((base + 120L * m, 7L, 1.0)).toDF("ts", "user_id", "value")
      .write.parquet(s"$dir/e0.parquet")
    Thread.sleep(1100) // distinct mtime orders the files
    Seq((base + 70L * m, 7L, 2.0), (base + 110L * m, 7L, 4.0))
      .toDF("ts", "user_id", "value").write.parquet(s"$dir/e1.parquet")
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("ts", LongType),
        StructField("user_id", LongType), StructField("value", DoubleType))))
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
    val q = graft.streaming.OnlineIngest.sessionize(stream, gapUs = 30L * 60 * 1000000)
      .writeStream.outputMode("append").format("memory").queryName("sessstr").start()
    q.processAllAvailable(); q.stop()
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    val got = spark.table("sessstr").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val baseUs = 6000L * 60 * 1000000
    // emitted so far: ONLY the far straggler's single-event session (the
    // open session stays in state — nothing advanced the watermark past it)
    assert(got == Set((baseUs + 70L * 60 * 1000000,
      baseUs + 70L * 60 * 1000000, 1L, 200L)))
  }

  test("stateful recovery: sessionizer killed mid-stream resumes GroupState from the checkpoint") {
    val dir = Files.createTempDirectory("graft-sess-rec").toString
    val out = Files.createTempDirectory("graft-sess-rec-out").toString
    val s = spark; import s.implicits._
    val m = 60L * 1000 * 1000 * 1000
    val base = 6000L * m
    val sch = StructType(Seq(StructField("ts", LongType),
      StructField("user_id", LongType), StructField("value", DoubleType)))
    def run(): Unit = {
      val stream = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
      val q = graft.streaming.OnlineIngest
        .sessionize(stream, gapUs = 30L * 60 * 1000000)
        .writeStream.outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$out/_ckpt")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[
            graft.streaming.OnlineIngest.SessionOut], _: Long) =>
          b.write.mode("append").parquet(s"$out/res"); ()
        }.start()
      q.awaitTermination()
    }
    // run 1 sees ONLY the session's first half — it ends with the open
    // session held in GroupState
    Seq((base, 7L, 1.0), (base + 5L * m, 7L, 2.0))
      .toDF("ts", "user_id", "value").write.parquet(s"$dir/e0.parquet")
    run()
    // the query is now DEAD (simulated crash/redeploy). The second half
    // and a far-future event arrive; a fresh query on the SAME checkpoint
    // must resume the open session, extend it, and close it
    Seq((base + 10L * m, 7L, 4.0)).toDF("ts", "user_id", "value")
      .write.parquet(s"$dir/e1.parquet")
    Seq((base + 600L * m, 7L, 8.0)).toDF("ts", "user_id", "value")
      .write.parquet(s"$dir/e2.parquet")
    run()
    val got = spark.read.parquet(s"$out/res").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val baseUs = 6000L * 60 * 1000000
    // ONE closed session spanning the crash: 3 events, 700 cents — the
    // restart neither lost the open state nor re-emitted a partial session
    assert(got.toSeq == Seq((7L, baseUs, baseUs + 10L * 60 * 1000000, 3L, 700L)))
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
  }

  test("streaming funnel chains stages across micro-batches; out-of-order pre-view click ignored") {
    val dir = Files.createTempDirectory("graft-funnel").toString
    val s = spark; import s.implicits._
    val m = 60L * 1000 * 1000 * 1000
    val base = 6000L * m
    // user 7: click BEFORE any view (must not count), then view in b0;
    // click + purchase arrive in b1 -> reached=3 only via carried state.
    // user 8: purchase then view (wrong order) -> reached=1.
    // each batch as ONE part file: a multi-file batch + maxFilesPerTrigger=1
    // would split it into separate triggers in arbitrary part-file order
    // (the registry fixture's writeBatch coalesces for the same reason)
    Seq((1L, base, 7L, "click", 0.0), (2L, base + m, 7L, "view", 0.0),
        (3L, base + m, 8L, "purchase", 0.0), (4L, base + 2 * m, 8L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.parquet(s"$dir/b0.parquet")
    Seq((5L, base + 10 * m, 7L, "click", 0.0), (6L, base + 11 * m, 7L, "purchase", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.parquet(s"$dir/b1.parquet")
    Seq((-1L, base + 1000 * m, 7L, "__sentinel", 0.0),
        (-1L, base + 1000 * m, 8L, "__sentinel", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.parquet(s"$dir/b2.parquet")
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("event_id", LongType),
        StructField("ts", LongType), StructField("user_id", LongType),
        StructField("event_type", StringType), StructField("value", DoubleType))))
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
    val q = graft.streaming.OnlineIngest.funnelProgress(stream)
      .writeStream.outputMode("append").format("memory").queryName("funout").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("funout").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got == Map(7L -> 3, 8L -> 1))
  }

  test("streaming dedup drops in-watermark duplicates with bounded state") {
    val dir = Files.createTempDirectory("graft-sdedup").toString
    val s = spark; import s.implicits._
    val m = 60L * 1000 * 1000 * 1000 // a minute in nanos
    val base = 6000L * m
    // batch 0: two distinct texts; batch 1: a duplicate of "aaa" within the
    // watermark (dropped) and one new text (kept)
    Seq((base, 1L, "aaa"), (base + m, 2L, "bbb"))
      .toDF("ts", "doc_id", "text").write.parquet(s"$dir/b0.parquet")
    Seq((base + 2 * m, 3L, "aaa"), (base + 3 * m, 4L, "ccc"))
      .toDF("ts", "doc_id", "text").write.parquet(s"$dir/b1.parquet")
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("ts", LongType),
        StructField("doc_id", LongType), StructField("text", StringType))))
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
    val q = graft.streaming.OnlineIngest.streamingDedup(stream)
      .select("doc_id", "text")
      .writeStream.outputMode("append").format("memory").queryName("sdedup").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("sdedup").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.map(_._2) == Set("aaa", "bbb", "ccc"))
    assert(!got.exists(_._1 == 3L)) // the duplicate doc was suppressed
  }

  test("streaming corpus ingest: quality gate before dedup state, duplicates dropped") {
    val dir = Files.createTempDirectory("graft-corpus").toString
    val s = spark; import s.implicits._
    val m = 60L * 1000 * 1000 * 1000
    val base = 6000L * m
    val good = "the quick brown fox jumps over the lazy dog today"
    val good2 = "the cat sat on a mat and the dog sat too"
    // batch 0: one quality doc + one too-short (never reaches dedup state);
    // batch 1: an exact duplicate of the quality doc (normalized-fp match,
    // dropped) + a new quality doc (kept)
    Seq((base, 1L, good), (base + m, 2L, "x"))
      .toDF("ts", "doc_id", "text").write.parquet(s"$dir/b0.parquet")
    Seq((base + 2 * m, 3L, "  " + good.toUpperCase + "  "), (base + 3 * m, 4L, good2))
      .toDF("ts", "doc_id", "text").write.parquet(s"$dir/b1.parquet")
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("ts", LongType),
        StructField("doc_id", LongType), StructField("text", StringType))))
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
    val q = graft.streaming.OnlineIngest.corpusIngest(stream)
      .select("doc_id")
      .writeStream.outputMode("append").format("memory").queryName("corpus").start()
    q.processAllAvailable(); q.stop()
    val kept = spark.table("corpus").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L)) // 2 failed quality; 3 was a normalized dup of 1
  }

  test("streaming IVF ingest under a fixed codebook equals the batch store build") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding").localCheckpoint(true)
    val half = emb.agg(max("vec_id")).head().getLong(0) / 2
    val cent = Similarity.ivfCentroids(emb.filter(col("vec_id") <= half), 16)
      .localCheckpoint(true)
    // batch reference: one-shot assignment under the same codebook
    val want = emb.join(Similarity.ivfAssign(emb, cent), "vec_id")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cid")).toMap
    // streamed build: two appends route independently
    val store = Files.createTempDirectory("graft-ivf-stream").toString
    cent.write.parquet(s"$store/centroids")
    Similarity.ivfStoreAppend(emb.filter(col("vec_id") <= half), store, cent)
    Similarity.ivfStoreAppend(emb.filter(col("vec_id") > half), store, cent)
    val got = spark.read.parquet(s"$store/vectors")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cid")).toMap
    assert(got == want)
    // and the probe over the streamed store is well-formed top-10
    val top = Similarity.ivfStoreTopK(spark, store, k = 10, nprobe = 4)
    assert(top.count() == 10)
  }

  test("CROSS-BATCH state with merged feeds: b0 | b1∪sentinel still spans the boundary") {
    // Pins the MERGED replay feed shape (one boundary-spanning pair of
    // triggers, sentinel riding in the final data batch instead of its
    // own trigger): a session opened in trigger 1 must (a) extend across
    // the trigger boundary with trigger 2's in-gap event, and (b) close
    // via the sentinel IN THE SAME trigger as that event — the exact
    // protocol the s8/s13/s14 replays use after the trigger-floor cut.
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft-merged-feed").toString
    val out = Files.createTempDirectory("graft-merged-out").toString
    val base = 1700000000L * 1000000000L // ns
    val min10 = 600L * 1000000000L
    def ev(uid: Long, ts: Long, v: Double) = (uid, ts, v)
    // b0: u1 two events 10 min apart; u2 one event (stays open)
    Seq(ev(1L, base, 1.0), ev(1L, base + min10, 2.0), ev(2L, base, 5.0))
      .toDF("user_id", "ts", "value").coalesce(1).write.parquet(s"$dir/b0.parquet")
    // b1 ∪ sentinel in ONE file: u1's in-gap event (20 min — extends the
    // carried session) plus far-future sentinels for both users
    val far = base + 40L * 24 * 3600 * 1000000000L
    Seq(ev(1L, base + 2 * min10, 4.0), ev(1L, far, 0.0), ev(2L, far, 0.0))
      .toDF("user_id", "ts", "value").coalesce(1).write.parquet(s"$dir/b1.parquet")
    // set mtimes so b0 strictly precedes b1 (FileStreamSource order)
    for ((f, t) <- Seq("b0.parquet" -> 1L, "b1.parquet" -> 2L)) {
      val w = Files.walk(java.nio.file.Paths.get(s"$dir/$f"))
      try w.forEach(p => Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + t * 1000)))
      finally w.close()
    }
    val sch = StructType(Seq(StructField("user_id", LongType),
      StructField("ts", LongType), StructField("value", DoubleType)))
    val stream = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
    OnlineIngest.sessionize(stream, gapUs = 1800000000L)
      .writeStream.outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$out/_ckpt")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[OnlineIngest.SessionOut],
                       _: Long) =>
        b.write.mode("append").parquet(s"$out/sessions"); ()
      }
      .start().awaitTermination()
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    val got = spark.read.parquet(s"$out/sessions")
      .select("user_id", "start_us", "end_us", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val b = base / 1000
    val m = min10 / 1000
    assert(got == Set(
      (1L, b, b + 2 * m, 3L), // spans the trigger boundary: 2 b0 + 1 b1 event
      (2L, b, b, 1L)          // closed by the sentinel in the merged batch
    ), s"got $got")
  }

  test("windowed event counts with watermark match the batch equivalent") {
    val dir = Files.createTempDirectory("graft-events").toString
    val s = spark; import s.implicits._
    // ts as raw nanos (what nanosAsLong delivers from the driver fixtures)
    val h = 3600L * 1000 * 1000 * 1000
    val rows = Seq(
      (0L * h + 5, "a", 1.0), (0L * h + 6, "a", 3.0), (0L * h + 7, "b", 2.0),
      (1L * h + 1, "a", 5.0))
    rows.toDF("ts", "event_type", "value").write.parquet(s"$dir/e0.parquet")

    val stream = spark.readStream
      .schema(StructType(Seq(StructField("ts", LongType),
        StructField("event_type", StringType), StructField("value", DoubleType))))
      .parquet(s"$dir/*")
    val agg = OnlineIngest.windowedEventCounts(stream)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("winout").start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("winout").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map((0L, "a") -> 2L, (0L, "b") -> 1L, (3600000L, "a") -> 1L))
  }

  test("APPEND-mode windows finalize in the trailing NO-DATA batch (sentinel rides the last data file)") {
    // The s10/s17 replay protocol (VERDICT r9 next #3): append-mode
    // windows finalize against the watermark of the PREVIOUS trigger, so
    // a sentinel in its own file used to cost a third data trigger. With
    // noDataMicroBatches (default ON) the engine runs one empty batch
    // after the last data trigger, re-evaluating state against the
    // watermark that data trigger advanced — so a sentinel UNIONED INTO
    // the final data file still flushes every real window, one data
    // trigger cheaper. This pins the engine behavior the fixture
    // protocol relies on; if a Spark upgrade stopped running the
    // trailing no-data batch under AvailableNow, this fails before the
    // registry entries do.
    val dir = Files.createTempDirectory("graft-nodata").toString
    val s = spark; import s.implicits._
    val h = 3600L * 1000 * 1000 * 1000
    Seq((0L * h + 5, "a", 1.0), (0L * h + 6, "b", 2.0))
      .toDF("ts", "event_type", "value").write.parquet(s"$dir/in/b0.parquet")
    // final data file: second real window PLUS the far-future sentinel
    Seq((1L * h + 1, "a", 5.0), (1000L * h, "__sentinel", 0.0))
      .toDF("ts", "event_type", "value").write.parquet(s"$dir/in/b1.parquet")
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("ts", LongType),
        StructField("event_type", StringType), StructField("value", DoubleType))))
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*")
    OnlineIngest.windowedEventCounts(stream)
      .writeStream.outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/_ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(s"$dir/out"); ()
      }
      .start().awaitTermination()
    val got = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    // every REAL window emitted; the sentinel's own window never
    // finalizes (nothing later advances the watermark past it)
    assert(got == Map((0L, "a") -> 1L, (0L, "b") -> 1L, (3600000L, "a") -> 1L),
      s"append windows after trailing no-data batch: $got")
  }

  test("OUTER-JOIN unmatched rows flush in the trailing NO-DATA batch (s15 protocol)") {
    // The s15 fixture has NO sentinel-only trigger left: each side's
    // sentinel rides in its final data file, and the null-padded
    // unmatched clicks must be emitted by the symmetric hash join's
    // state cleanup in the engine's trailing no-data batch — a
    // DIFFERENT state-finalization path from windowed aggregation
    // (SymmetricHashJoinStateManager eviction), so it gets its own pin
    // next to the windowed one (review r10). If a Spark upgrade stopped
    // running join-state cleanup in no-data batches, this fails before
    // the s15 oracle does.
    val dir = Files.createTempDirectory("graft-nodata-oj").toString
    val s = spark; import s.implicits._
    val h = 3600L * 1000 * 1000 * 1000 // ns
    val far = 1000L * h
    // real events sit at a NON-ZERO base: an event time equal to the
    // initial watermark (epoch 0) is dropped as late by the join's
    // state machinery — an epoch-0 artifact, debugged empirically
    // (review r10), not a protocol property
    // clicks: c1 (matched), then c2 (never matched) + sentinel in b1
    Seq((10L, 2L * h, 7L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$dir/click/b0.parquet")
    Seq((11L, 2L * h + 60L * 1000 * 1000 * 1000, 8L, "click"),
        (-1L, far, -1L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$dir/click/b1.parquet")
    // purchases: p1 matches c1 within the lookback; sentinel in b1
    Seq((20L, 2L * h + 5L * 60 * 1000 * 1000 * 1000, 7L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$dir/purchase/b0.parquet")
    Seq((-2L, far, -1L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$dir/purchase/b1.parquet")
    val sch = StructType(Seq(StructField("event_id", LongType),
      StructField("ts", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType)))
    def side(t: String) = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/$t/*")
    OnlineIngest.clickAttributionOuter(side("click"), side("purchase"))
      .writeStream.outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/_ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.filter(col("c_id") >= 0).write.mode("append").parquet(s"$dir/out"); ()
      }
      .start().awaitTermination()
    val got = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) -99L else r.getLong(3))).toSet
    assert(got == Set((10L, 20L), (11L, -99L)),
      s"outer-join rows after trailing no-data batch: $got")
  }
}
