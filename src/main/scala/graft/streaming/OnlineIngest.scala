package graft.streaming

import graft.GraphDB
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Online ingest + continuous computation (SURVEY.md §2.1 S1, §2.7 C2).
  *
  * The reference's online mode buffers inserts in memory and merges them
  * into LSM shards in the background while queries read buffer ∪ shards
  * (reference GraphChiDatabase.scala:913-938 flusher,
  * EdgeBuffer.scala:39-274, query-time union :1436-1474). Here Structured
  * Streaming IS that machinery: each micro-batch is the in-memory buffer,
  * `foreachBatch` is the flush point, and read-your-writes holds because
  * the maintained view is base ∪ all-batches-so-far by construction.
  *
  * C2 (continuous computation during ingest, reference
  * GraphChiDatabase.scala:2258-2283) = re-running an algorithm on the
  * current snapshot inside `foreachBatch`.
  */
object OnlineIngest {

  /** File-based micro-batch stream: new parquet files in `dir` are
    * micro-batches (one file per trigger — each file plays the role of
    * one flushed EdgeBuffer). Rows of any schema — the vertex-property
    * stream reuses it unchanged. */
  def edgeStream(spark: SparkSession, schema: StructType, dir: String): DataFrame =
    spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(dir)

  /** One micro-batch of any durable ingest: run `commitBatch` from the
    * store's current version, then the compaction cadence — a full
    * compact every `compactEvery` batches, the pressure hook between
    * cadence points (the reference's 75%-full buffer trigger,
    * GraphChiDatabase.scala:852-882 — a burst of large batches must not
    * push the store past the serving budgets while waiting for the next
    * cadence slot). Retries on [[graft.DurableStore.CommitConflictException]]:
    * on a `linearHistory` store a concurrent writer (another stream
    * sharing the root) surfaces as a conflict, and the retry rebuilds
    * from the new head — the batch watermarks make a replayed commit a
    * no-op, so retrying after a post-commit conflict cannot double-apply.
    * On a DEFAULT (non-linear) store no conflict is ever thrown and a
    * concurrent writer between the version read and the commit is
    * last-writer-wins (the store's documented branch semantics) — two
    * streams sharing one store MUST open it `linearHistory = true`. */
  private def commitAndCompact(store: graft.DurableStore, batchId: Long,
                               compactEvery: Int)(commitBatch: Int => Int): Unit = {
    var done = false
    while (!done) {
      try {
        val v = commitBatch(store.currentVersion)
        if ((batchId + 1) % compactEvery == 0) store.compact(v)
        else store.compactIfPressured(v)
        done = true
      } catch {
        case _: graft.DurableStore.CommitConflictException => ()
      }
    }
  }

  /** S1 online ingest: fold each micro-batch into an evolving GraphDB and
    * hand the post-batch snapshot to `onSnapshot` (the C2 hook). The
    * snapshot always contains every edge ingested so far —
    * read-your-writes. */
  def ingest(spark: SparkSession, schema: StructType, dir: String,
             base: GraphDB, onSnapshot: (GraphDB, Long) => Unit): StreamingQuery = {
    // mutable current-view holder, updated at flush points only
    val current = new java.util.concurrent.atomic.AtomicReference[GraphDB](base)
    edgeStream(spark, schema, dir).writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // materialize the buffer so the union view doesn't re-read the stream
        val buffered = batch.localCheckpoint(true)
        val next = current.get.addEdges(buffered)
        current.set(next)
        onSnapshot(next, batchId)
      }
      .start()
  }

  /** S1+S5 durable online ingest: every micro-batch is committed to the
    * [[graft.DurableStore]] as one delta file (the reference's
    * flushAllBuffers, GraphChiDatabase.scala:913-938), and every
    * `compactEvery` batches the deltas are merged back into the sorted
    * buckets (the LSM merge, DiskShard.mergeToAndClear:309-420) — so an
    * always-on ingest never accumulates unbounded small files, and a
    * reader opening the store's latest version sees every committed batch
    * (durable read-your-writes, vs [[ingest]]'s session-plan union).
    *
    * Restart-safe end-to-end (ADVICE r3): the query checkpoints under the
    * store root, and the append carries the batchId — the manifest's
    * lastBatch watermark makes a replayed batch (query restart, batch
    * retry) a no-op, so the durable contract holds exactly-once. */
  def ingestDurable(spark: SparkSession, schema: StructType, dir: String,
                    store: graft.DurableStore, compactEvery: Int = 4): StreamingQuery =
    edgeStream(spark, schema, dir).writeStream
      .option("checkpointLocation", s"${store.root}/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitAndCompact(store, batchId, compactEvery)(
          v => store.append(v, batch, batchId))
      }
      .start()

  /** CDC ingest: the stream's rows carry an `_op` column — "i" rows are
    * edge inserts, "d" rows name (src, dst) pairs to delete. Each
    * micro-batch lands as ONE idempotent [[graft.DurableStore.applyCdc]]
    * commit: inserts become a delta, deletes become a tombstone at the
    * same sequence number (deletes apply to pre-batch state; a replayed
    * batch is a no-op via the manifest watermark, so a restart cannot
    * re-kill a later re-insert). Every `compactEvery` batches the
    * tombstones and deltas are physically folded into the sorted buckets
    * — the LSM cycle under a change feed, end to end. */
  def ingestCdc(spark: SparkSession, schema: StructType, dir: String,
                store: graft.DurableStore, compactEvery: Int = 4): StreamingQuery =
    edgeStream(spark, schema, dir).writeStream
      .option("checkpointLocation", s"${store.root}/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.localCheckpoint(true)
        val dels = b.filter(col("_op") === "d").select("src", "dst")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        val ins = b.filter(col("_op") === "i").drop("_op")
        // a delete-heavy CDC feed accumulates TOMBSTONE rows between
        // cadence points, and the serving paths refuse past
        // ServeTombRowBudget — the pressure trigger inside
        // commitAndCompact compacts at half that, so attached serving
        // clients never see a budget refusal (VERDICT r12 next #1)
        commitAndCompact(store, batchId, compactEvery)(
          v => store.applyCdc(v, ins, dels, batchId))
      }
      .start()

  /** VERTEX-PROPERTY stream: each micro-batch of full vertex rows lands
    * as ONE idempotent latest-wins upsert into the store's vertex
    * side-table ([[graft.DurableStore.upsertVertices]] — the streaming
    * shape of the reference's online `Column.set` feed,
    * Column.scala:48-57), with the pressure hook folding deltas back
    * into the id-sorted base between cadence compactions. The vertex
    * batch watermark ([[graft.DurableStore.Manifest.vLastBatch]]) is
    * tracked separately from the edge one, so replays of a vertex batch
    * and an edge batch sharing a store never suppress each other;
    * checkpoints live under `<root>/_vcheckpoint` for the same reason.
    * CONCURRENT streams on one store are a different matter: open the
    * store `linearHistory = true` so a racing commit surfaces as a
    * conflict that [[commitAndCompact]] retries from the new head — on a
    * default handle a concurrent writer between the version read and the
    * commit is last-writer-wins (the store's branch semantics) and the
    * other stream's batch would silently leave the live view. */
  def ingestVertexUpserts(spark: SparkSession, schema: StructType, dir: String,
                          store: graft.DurableStore,
                          compactEvery: Int = 4): StreamingQuery =
    edgeStream(spark, schema, dir).writeStream
      .option("checkpointLocation", s"${store.root}/_vcheckpoint")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitAndCompact(store, batchId, compactEvery)(
          v => store.upsertVertices(v, batch, batchId))
      }
      .start()

  case class Ev(user_id: Long, ts_us: Long, cents: Long)
  case class SessionState(start: Long, last: Long, n: Long, cents: Long)
  case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
                        n_events: Long, val_cents: Long)

  /** Custom streaming state via `flatMapGroupsWithState`: per-user
    * sessionization with an inactivity gap. A session closes either when
    * a later event arrives past the gap (emitted in-batch) or when event
    * time moves past last+gap (timeout emission). This is the
    * KeyValueGroupedDataset stateful surface of the builder brief; the
    * reference has no equivalent (its "online" is only
    * insert-visibility, SURVEY §2.8).
    *
    * Works in MICROSECONDS and integer CENTS — the repo's cross-engine
    * parity conventions (DuckDB truncates parquet ns timestamps to its
    * native µs on read; float sums are accumulation-order-dependent) —
    * so the emitted sessions are bit-comparable with the r11 batch
    * window form and its DuckDB oracle (the s8 registry entry pins
    * streaming == batch == oracle on the same events). */
  def sessionize(events: DataFrame, gapUs: Long): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    def fn(uid: Long, evs: Iterator[Ev], state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(SessionOut(uid, s.start, s.last, s.n, s.cents))
      } else {
        var out = List.empty[SessionOut]
        var cur = state.getOption
        evs.toSeq.sortBy(_.ts_us).foreach { e =>
          cur match {
            case Some(s) if e.ts_us - s.last > gapUs =>
              out ::= SessionOut(uid, s.start, s.last, s.n, s.cents)
              cur = Some(SessionState(e.ts_us, e.ts_us, 1, e.cents))
            case Some(s) if s.start - e.ts_us > gapUs =>
              // an in-watermark straggler MORE than a gap BEFORE the open
              // session's start belongs to a separate, earlier session —
              // merging it would emit one span containing an internal
              // silence longer than the gap, which the batch form never
              // produces. Emit it as its own session (batch-equal for
              // isolated stragglers; a run of several such stragglers
              // that would have coalesced in batch order emits split —
              // the bounded, documented divergence of arrival-order
              // processing)
              out ::= SessionOut(uid, e.ts_us, e.ts_us, 1, e.cents)
            case Some(s) =>
              // a late in-gap event must not move the session end
              // backwards — and one within a gap BEFORE the current
              // start (an in-watermark straggler) must extend the start
              // backwards, or the emitted span silently begins at the
              // second event
              cur = Some(SessionState(math.min(s.start, e.ts_us),
                math.max(s.last, e.ts_us), s.n + 1, s.cents + e.cents))
            case None =>
              cur = Some(SessionState(e.ts_us, e.ts_us, 1, e.cents))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // a late-but-within-watermark event can put last+gap below the
          // current watermark; an earlier-than-watermark timeout throws
          // and kills the query — clamp it forward. Timeouts are wall-time
          // milliseconds in the GroupState API; the gap stays µs here.
          state.setTimeoutTimestamp(
            math.max((s.last + gapUs) / 1000, state.getCurrentWatermarkMs() + 1))
        }
        out.reverse.iterator
      }
    }
    events
      .withColumn("ets", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ets", "1 hour")
      // keep the watermark column in the row — dropping it would detach
      // the watermark from the stateful operator's input
      .select(col("user_id"), expr("ts div 1000").as("ts_us"),
        graft.cents(col("value")).as("cents"), col("ets"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Streaming exact dedup for the ingest pipeline (the streaming shape of
    * d1): drop rows whose content hash was already seen, with state bounded
    * by the watermark via `dropDuplicatesWithinWatermark` — duplicates
    * arriving within the watermark horizon are suppressed, state for
    * hashes older than the horizon is evicted (unbounded-state-free, the
    * property that matters on an always-on 100 TB ingest). */
  def streamingDedup(docs: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    docs
      .withColumn("ets", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ets", watermarkDelay)
      .withColumn("h", md5(col("text")))
      .dropDuplicatesWithinWatermark("h")

  /** Streaming corpus-build ingest: the streaming shape of the x1
    * composite — the STATELESS quality gate (t3's integer rule) runs
    * before the watermark-bounded exact dedup on the normalized-text
    * fingerprint (t4's key). Ordering matters on an always-on 100 TB
    * ingest: rejected documents never touch the dedup state store, so
    * state size tracks the accepted-rate × watermark horizon, not the
    * raw feed. */
  def corpusIngest(docs: DataFrame, watermarkDelay: String = "1 hour"): DataFrame = {
    val toks = graft.TextOps.tokens(col("text"))
    val enStop = graft.TextOps.Stopwords.head._2
    docs
      .withColumn("n_tokens", size(toks))
      .withColumn("n_punct", expr("regexp_count(text, '[.,!?;:]')"))
      .withColumn("n_stop", size(filter(toks, t => t.isInCollection(enStop))))
      .filter(graft.TextOps.qualityCond(col("n_tokens"), col("n_punct"), col("n_stop")))
      .withColumn("ets", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ets", watermarkDelay)
      .withColumn("fp", md5(trim(regexp_replace(lower(col("text")), graft.TextOps.WsRun, " "))))
      .dropDuplicatesWithinWatermark("fp")
  }

  case class UpEv(user_id: Long, ts_us: Long, event_id: Long,
                  event_type: String, cents: Long)
  case class UpOut(user_id: Long, last_us: Long, event_id: Long,
                   event_type: String, val_cents: Long)

  /** Streaming latest-per-key: the r13 upsert/SCD-type-1 "current state"
    * view maintained as cross-batch GroupState instead of a batch
    * argmax — each user's state is the (ts_us, event_id)-max event seen
    * so far, exactly the struct-max ordering of the batch form (the
    * (ts_us, event_id) pair is unique, so trailing fields never decide).
    * Emission protocol mirrors [[sessionize]]'s fixtures: per-user
    * sentinel rows (event_id < 0) advance the watermark and trigger the
    * final in-batch emission WITHOUT entering the max-fold, so the
    * emitted multiset is exactly the batch latest-per-key of the real
    * rows. State is one small record per live key — the minimum any
    * upsert view can hold, watermark-evicted on timeout at scale. */
  def latestPerKey(events: DataFrame): Dataset[UpOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    def fn(uid: Long, evs: Iterator[UpEv],
           state: GroupState[UpOut]): Iterator[UpOut] = {
      if (state.hasTimedOut) {
        val s = state.get; state.remove(); Iterator(s)
      } else {
        val es = evs.toSeq
        var cur = state.getOption
          .getOrElse(UpOut(uid, Long.MinValue, Long.MinValue, "", 0L))
        es.filter(_.event_id >= 0).foreach { e =>
          if (e.ts_us > cur.last_us ||
              (e.ts_us == cur.last_us && e.event_id > cur.event_id))
            cur = UpOut(uid, e.ts_us, e.event_id, e.event_type, e.cents)
        }
        if (es.exists(_.event_id < 0)) { // sentinel: final in-batch emission
          state.remove()
          if (cur.last_us != Long.MinValue) Iterator(cur) else Iterator.empty
        } else {
          state.update(cur)
          // effectively-never timeout: the replay ends via sentinels; an
          // always-on deployment would size this to its key-liveness SLA
          state.setTimeoutTimestamp(
            state.getCurrentWatermarkMs() + 365L * 24 * 3600 * 1000)
          Iterator.empty
        }
      }
    }
    events
      .withColumn("ets", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ets", "1 hour")
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("event_id"),
        col("event_type"), graft.cents(col("value")).as("cents"), col("ets"))
      .as[UpEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  case class FunnelEv(user_id: Long, ts_us: Long, event_id: Long, event_type: String)
  case class FunnelSt(fv: Long, fc: Long, fp: Long)
  case class FunnelOut(user_id: Long, reached: Int)

  /** Streaming ORDERED-funnel progress (the r17 batch query as
    * cross-batch GroupState): per user, track the first view, the first
    * click strictly after it, and the first purchase strictly after
    * that. Events inside one micro-batch group are applied in (ts_us,
    * event_id) order; because the replay fixtures split batches at a
    * timestamp midpoint (all of batch k's events precede batch k+1's),
    * in-order application per batch + carried state is EXACTLY the
    * global-order state machine, so the emitted stage counts equal the
    * batch cascaded-min-aggregate form bit-for-bit. State per live user
    * is three longs — the minimum any funnel tracker can hold,
    * watermark-evicted on timeout at scale. Sentinels (event_id < 0)
    * trigger the final emission without entering the state machine
    * ([[latestPerKey]]'s protocol). */
  def funnelProgress(events: DataFrame): Dataset[FunnelOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val Unset = -1L
    def fn(uid: Long, evs: Iterator[FunnelEv],
           state: GroupState[FunnelSt]): Iterator[FunnelOut] = {
      if (state.hasTimedOut) {
        val s = state.get; state.remove()
        val reached = if (s.fp != Unset) 3 else if (s.fc != Unset) 2
                      else if (s.fv != Unset) 1 else 0
        if (reached > 0) Iterator(FunnelOut(uid, reached)) else Iterator.empty
      } else {
        val es = evs.toSeq
        var st = state.getOption.getOrElse(FunnelSt(Unset, Unset, Unset))
        es.filter(_.event_id >= 0).sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
          e.event_type match {
            case "view" if st.fv == Unset => st = st.copy(fv = e.ts_us)
            case "click" if st.fc == Unset && st.fv != Unset && e.ts_us > st.fv =>
              st = st.copy(fc = e.ts_us)
            case "purchase" if st.fp == Unset && st.fc != Unset && e.ts_us > st.fc =>
              st = st.copy(fp = e.ts_us)
            case _ => ()
          }
        }
        if (es.exists(_.event_id < 0)) { // sentinel: final in-batch emission
          state.remove()
          val reached = if (st.fp != Unset) 3 else if (st.fc != Unset) 2
                        else if (st.fv != Unset) 1 else 0
          if (reached > 0) Iterator(FunnelOut(uid, reached)) else Iterator.empty
        } else {
          state.update(st)
          state.setTimeoutTimestamp(
            state.getCurrentWatermarkMs() + 365L * 24 * 3600 * 1000)
          Iterator.empty
        }
      }
    }
    events
      .withColumn("ets", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ets", "1 hour")
      .select(col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_id"), col("event_type"), col("ets"))
      .as[FunnelEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** STREAM-STREAM interval join: purchases matched to the same user's
    * clicks within the preceding `lookback` — the attribution join every
    * event pipeline runs, and the Structured Streaming surface piece the
    * other operators don't cover (two watermarked streams, event-time
    * range condition, cross-batch join state). The time-range bound on
    * BOTH event-time columns is what lets Spark expire join state at the
    * watermark instead of buffering either stream forever. Timestamps
    * compare at µs on both sides (the parquet-ns vs DuckDB-µs trap —
    * see r13). Inner join: matches emit as soon as both sides arrive,
    * no finalization sentinel needed. */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame,
                       lookback: String = "30 minutes"): DataFrame = {
    val c = clicks.select(col("event_id").as("c_id"), col("user_id"),
        expr("ts div 1000").as("c_us"))
      .withColumn("c_ets", expr("timestamp_micros(c_us)"))
      .withWatermark("c_ets", "1 hour")
    val p = purchases.select(col("event_id").as("p_id"),
        col("user_id").as("p_user"), expr("ts div 1000").as("p_us"))
      .withColumn("p_ets", expr("timestamp_micros(p_us)"))
      .withWatermark("p_ets", "1 hour")
    c.join(p, col("user_id") === col("p_user") &&
        col("c_ets") <= col("p_ets") &&
        col("c_ets") > col("p_ets") - expr(s"INTERVAL $lookback"))
      .select(col("p_id"), col("c_id"), col("user_id"), col("p_us"), col("c_us"))
  }

  /** [[clickAttribution]]'s LEFT OUTER form: every click emits — matched
    * rows as soon as both sides arrive, UNMATCHED clicks with null
    * purchase columns once the watermark passes their join window (the
    * state-finalization semantics the inner join never exercises).
    *
    * Sentinel protocol, with a constraint found empirically: the
    * symmetric hash join only runs its watermark state cleanup (which
    * EMITS the null-joined rows) in batches where the operator itself
    * receives input — a far-future row that advances the watermark but
    * is filtered out BEFORE the join leaves the unmatched state stuck
    * forever. So sentinel rows (event_id < 0, matching user_id, same
    * far-future ts on both sides) flow THROUGH the join — they pair with
    * each other in-batch — and must be dropped IN THE SINK (e.g. inside
    * foreachBatch): a post-join `filter(c_id >= 0)` here references only
    * left-side columns, so Catalyst pushes it below the left outer join
    * and the sentinels never reach the operator. Replays need TWO
    * sentinel batches: the watermark from sentinel batch k is applied to
    * cleanup during batch k+1. */
  def clickAttributionOuter(clicks: DataFrame, purchases: DataFrame,
                            lookback: String = "30 minutes"): DataFrame = {
    val c = clicks.select(col("event_id").as("c_id"), col("user_id"),
        expr("ts div 1000").as("c_us"))
      .withColumn("c_ets", expr("timestamp_micros(c_us)"))
      .withWatermark("c_ets", "1 hour")
    val p = purchases.select(col("event_id").as("p_id"),
        col("user_id").as("p_user"), expr("ts div 1000").as("p_us"))
      .withColumn("p_ets", expr("timestamp_micros(p_us)"))
      .withWatermark("p_ets", "1 hour")
    c.join(p, col("user_id") === col("p_user") &&
        col("c_ets") <= col("p_ets") &&
        col("c_ets") > col("p_ets") - expr(s"INTERVAL $lookback"), "leftOuter")
      .select(col("c_id"), col("user_id"), col("c_us"), col("p_id"), col("p_us"))
  }

  /** Event-time tumbling window aggregation with watermark (the streaming
    * shape of the s1_event_window batch query). `ts` arrives as raw
    * nanos (nanosAsLong) and is restored to a timestamp for event time. */
  def windowedEventCounts(events: DataFrame): DataFrame =
    events
      .withColumn("ets", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ets", "1 hour")
      .groupBy(window(col("ets"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), min("value").as("vmin"), max("value").as("vmax"))
      .select(unix_millis(col("window.start")).as("hour_ms"),
        col("event_type"), col("n"), col("vmin"), col("vmax"))

  /** S18: running totals in COMPLETE output mode — the live dashboard
    * aggregate (all-time counts per event type, re-emitted in full each
    * micro-batch). Complete mode is the third output-mode contract the
    * suite pins (append: s10/s17; the update-shaped latest-view: s13):
    * no watermark, state = one row per group key (bounded by the type
    * domain, not the stream), and the LAST emission equals the batch
    * aggregate over everything ingested — which is what the replay
    * verifies. */
  def runningTypeCounts(events: DataFrame): DataFrame =
    events.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(graft.cents(col("value"))).as("val_cents"))

  /** S17: stream-static enrichment — the dimension-join every event
    * pipeline performs before aggregating: the streaming fact joins a
    * STATIC dimension table (customers) inside the streaming query, then
    * windowed-aggregates per segment. The stream-static inner join is
    * STATELESS in Structured Streaming (each micro-batch joins the
    * batch-side relation directly — no join state, no dim watermark), and
    * the broadcast hint keeps the dim on every executor, so the
    * enrichment adds zero shuffles to the streaming plan; only the
    * windowed aggregation keeps (watermark-bounded) state. Append mode:
    * a window emits once, when the watermark passes it. */
  def enrichedSegmentCounts(events: DataFrame, dim: DataFrame): DataFrame =
    events
      .withColumn("ets", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ets", "1 hour")
      .join(broadcast(dim.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy(window(col("ets"), "1 hour"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(graft.cents(col("value"))).as("val_cents"))
      .select(unix_millis(col("window.start")).as("hour_ms"),
        col("c_mktsegment").as("segment"), col("n"), col("val_cents"))
}
