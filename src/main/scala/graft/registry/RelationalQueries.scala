package graft.registry

import graft._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY.md §2.8: the generic relational surface the reference lacks and
  * Spark provides natively — window functions, rollup, set ops, range
  * join. Exposed so a reference user gets the full relational algebra
  * alongside the graph API. */
object RelationalQueries {

  val entries: Seq[QueryEntry] = Seq(

    // ---- the whole graph surface through spark.sql over registered views ----
    ("r1_sql_revenue_per_nation",
      (s: SparkSession, d: String) => {
        GraphDB.registerViews(s, d)
        Tables.customer(s, d).createOrReplaceTempView("g_cust")
        Tables.nation(s, d).createOrReplaceTempView("g_nat")
        s.sql(
          """SELECT n_name, count(*) AS n_edges,
            |       CAST(sum(CAST(CAST(weight AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS revenue_cents
            |FROM edges JOIN g_cust ON src = c_custkey
            |JOIN g_nat ON c_nationkey = n_nationkey
            |GROUP BY n_name""".stripMargin)
      },
      Some(graft.Oracle.withSql(graft.Oracle.EDGES,
        """SELECT n_name, count(*) AS n_edges,
          |       CAST(sum(CAST(CAST(weight AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS revenue_cents
          |FROM edges JOIN customer ON src = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY n_name""".stripMargin))),

    // ---- distinct aggregation (absent in the reference, SURVEY §2.8) ----
    ("r6_distinct_agg",
      (s: SparkSession, d: String) =>
        Tables.orderEdges(s, d).groupBy("etype").agg(
          countDistinct(col("src")).as("n_src"),
          countDistinct(col("dst")).as("n_dst"),
          count(lit(1)).as("n")),
      Some(graft.Oracle.withSql(graft.Oracle.EDGES,
        """SELECT etype, count(DISTINCT src) AS n_src, count(DISTINCT dst) AS n_dst,
          |       count(*) AS n
          |FROM edges GROUP BY etype""".stripMargin))),

    // ---- window functions: top-3 orders per customer ----
    ("r2_window_topn",
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "rn")
      },
      Some(
        """SELECT o_custkey, o_orderkey, rn FROM (
          |  SELECT o_custkey, o_orderkey,
          |         row_number() OVER (PARTITION BY o_custkey
          |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
          |  FROM orders) WHERE rn <= 3""".stripMargin)),

    // ---- grouping sets / rollup over the region-nation hierarchy ----
    ("r3_rollup",
      (s: SparkSession, d: String) => {
        Tables.customer(s, d).createOrReplaceTempView("g_customer")
        Tables.nation(s, d).createOrReplaceTempView("g_nation")
        Tables.region(s, d).createOrReplaceTempView("g_region")
        s.sql(
          """SELECT r_name, n_name, count(*) AS n_cust,
            |       CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS bal_cents
            |FROM g_customer
            |JOIN g_nation ON c_nationkey = n_nationkey
            |JOIN g_region ON n_regionkey = r_regionkey
            |GROUP BY ROLLUP (r_name, n_name)""".stripMargin)
      },
      Some(
        """SELECT r_name, n_name, count(*) AS n_cust,
          |       CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS bal_cents
          |FROM customer
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY ROLLUP (r_name, n_name)""".stripMargin)),

    // ---- set operations over arbitrary relations ----
    ("r4_setops",
      (s: SparkSession, d: String) => {
        val cn = Tables.customer(s, d).select(col("c_nationkey").as("nk")).distinct()
        val sn = Tables.supplier(s, d).select(col("s_nationkey").as("nk")).distinct()
        cn.intersect(sn).agg(count(lit(1)).as("n_both"))
          .crossJoin(cn.except(sn).agg(count(lit(1)).as("n_cust_only")))
          .crossJoin(cn.union(sn).distinct().agg(count(lit(1)).as("n_any")))
      },
      Some(
        """WITH cn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
          |sn AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
          |SELECT
          |  (SELECT count(*) FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn)) AS n_both,
          |  (SELECT count(*) FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn)) AS n_cust_only,
          |  (SELECT count(*) FROM (SELECT nk FROM cn UNION SELECT nk FROM sn)) AS n_any""".stripMargin)),

    // ---- as-of join: each event matched to the user's latest order on or
    //      before the event time (window-sweep impl vs naive-join oracle) ----
    ("r7_asof_join",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), expr("ts div 1000000").as("ets_ms"))
        val ord = Tables.orders(s, d)
          .select(col("o_custkey"), unix_millis(col("o_orderdate").cast("timestamp")).as("od_ms"),
            col("o_orderkey"))
        AsOf.join(
          ev.withColumnRenamed("user_id", "k"), ord.withColumnRenamed("o_custkey", "k"),
          key = "k", leftTs = col("ets_ms"), rightTs = col("od_ms"),
          payload = col("o_orderkey"), leftOut = Seq("event_id"))
          .select(col("event_id"), col("asof_ts").as("asof_ms"),
            col("asof_val").as("asof_orderkey"))
      },
      Some(
        """WITH j AS (
          |  SELECT e.event_id, epoch_ms(o.o_orderdate) AS od, o.o_orderkey AS ok
          |  FROM events e JOIN orders o ON o.o_custkey = e.user_id
          |   AND epoch_ms(o.o_orderdate) <= epoch_ns(e.ts) // 1000000),
          |best AS (SELECT event_id, max(od) AS od FROM j GROUP BY event_id)
          |SELECT j.event_id, j.od AS asof_ms, max(j.ok) AS asof_orderkey
          |FROM j JOIN best ON j.event_id = best.event_id AND j.od = best.od
          |GROUP BY j.event_id, j.od""".stripMargin)),

    // ---- r7b: the SAME as-of semantics through the skew-safe salted
    //      window (time-bucketed, carry-merged) — identical oracle to r7,
    //      so plain == salted is also pinned cross-engine ----
    ("r7b_asof_join_salted",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), expr("ts div 1000000").as("ets_ms"))
        val ord = Tables.orders(s, d)
          .select(col("o_custkey"), unix_millis(col("o_orderdate").cast("timestamp")).as("od_ms"),
            col("o_orderkey"))
        AsOf.joinSalted(
          ev.withColumnRenamed("user_id", "k"), ord.withColumnRenamed("o_custkey", "k"),
          key = "k", leftTs = col("ets_ms"), rightTs = col("od_ms"),
          payload = col("o_orderkey"), leftOut = Seq("event_id"),
          bucketWidth = 7L * 24 * 3600 * 1000) // one-week buckets
          .select(col("event_id"), col("asof_ts").as("asof_ms"),
            col("asof_val").as("asof_orderkey"))
      },
      Some(
        """WITH j AS (
          |  SELECT e.event_id, epoch_ms(o.o_orderdate) AS od, o.o_orderkey AS ok
          |  FROM events e JOIN orders o ON o.o_custkey = e.user_id
          |   AND epoch_ms(o.o_orderdate) <= epoch_ns(e.ts) // 1000000),
          |best AS (SELECT event_id, max(od) AS od FROM j GROUP BY event_id)
          |SELECT j.event_id, j.od AS asof_ms, max(j.ok) AS asof_orderkey
          |FROM j JOIN best ON j.event_id = best.event_id AND j.od = best.od
          |GROUP BY j.event_id, j.od""".stripMargin)),

    // ---- exact percentiles over money-cents per vertex type: Spark
    //      `percentile` and DuckDB `quantile_cont` both interpolate as
    //      lower + (upper-lower)·frac at index p·(n-1) over the sorted
    //      values — on exact integer cents the doubles agree bit-for-bit ----
    ("r8_percentiles",
      (s: SparkSession, d: String) =>
        Tables.vertices(s, d)
          .select(col("vtype"), cents(col("acctbal")).as("bc"))
          .groupBy("vtype").agg(
            count(lit(1)).as("n"),
            expr("percentile(bc, 0.25D)").as("p25"),
            expr("percentile(bc, 0.5D)").as("p50"),
            expr("percentile(bc, 0.9D)").as("p90")),
      Some(graft.Oracle.withSql(graft.Oracle.VERTICES,
        """SELECT vtype, count(*) AS n,
          |  quantile_cont(CAST(CAST(acctbal AS DECIMAL(18,2)) * 100 AS BIGINT), 0.25) AS p25,
          |  quantile_cont(CAST(CAST(acctbal AS DECIMAL(18,2)) * 100 AS BIGINT), 0.5) AS p50,
          |  quantile_cont(CAST(CAST(acctbal AS DECIMAL(18,2)) * 100 AS BIGINT), 0.9) AS p90
          |FROM vertices GROUP BY vtype""".stripMargin))),

    // ---- HLL distinct sketch with an oracle-pinned error bound: the
    //      sketch itself is engine-specific, but the CLAIM |approx-exact|
    //      ≤ 5%·exact is checkable — a broken sketch flips the boolean.
    //      rsd 0.01 makes the 5% bound a 5σ envelope, so the boolean is
    //      stable while still catching any real sketch regression ----
    ("r9_sketch_distinct",
      (s: SparkSession, d: String) => {
        // TAGGED-UNION single-shuffle distinct (the n6 degrees trick):
        // both endpoint columns become (side, v) rows deduplicated by ONE
        // partial-combining groupBy, and the per-side exact counts + the
        // HLL estimate (over the already-distinct src values — an equally
        // valid 1%-rsd HLL test) fall out of a tiny second-level
        // aggregate. History at sf1: one agg with three distinct-class
        // aggregates planned as Expand ×3 of every edge row (42 s);
        // two single-distinct aggregates cross-joined, sharing one
        // localCheckpointed edge derivation (18 s — countDistinct+approx
        // riding one agg still rewrites through Expand); this form: ONE
        // exchange keyed (side, v), 3.6 s. The edge derivation is still
        // materialized once (it feeds both union branches).
        val e = Tables.orderEdges(s, d)
          .select(col("src"), col("dst")).localCheckpoint(true)
        val sides = e.select(lit("s").as("side"), col("src").as("v"))
          .unionByName(e.select(lit("d").as("side"), col("dst").as("v")))
        sides.groupBy("side", "v").agg(count(lit(1)).as("c"))
          .agg(
            count(when(col("side") === "s", 1)).as("exact_src"),
            count(when(col("side") === "d", 1)).as("exact_dst"),
            approx_count_distinct(when(col("side") === "s", col("v")), 0.01).as("approx_src"))
          .select(col("exact_src"), col("exact_dst"),
            (abs(col("approx_src") - col("exact_src"))
              <= col("exact_src") * 0.05).as("approx_ok"))
      },
      Some(graft.Oracle.withSql(graft.Oracle.EDGES,
        """SELECT count(DISTINCT src) AS exact_src,
          |       count(DISTINCT dst) AS exact_dst,
          |       true AS approx_ok
          |FROM edges""".stripMargin))),

    // ---- R12: PIVOT — long-to-wide reshaping (§2.8 relational surface;
    //      the reporting form of the r10 cube). Pivot values are given
    //      EXPLICITLY: discovering them would cost a scan job and make
    //      the output schema data-dependent — the 100 TB contract is a
    //      fixed schema and one partial-aggregated pass ----
    ("r12_pivot",
      (s: SparkSession, d: String) => {
        val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
        Tables.customer(s, d)
          .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name").pivot("c_mktsegment", segs)
          .agg(sum(cents(col("c_acctbal"))))
      },
      Some {
        val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
        val cols = segs.map(g =>
          s"""CAST(sum(CASE WHEN c_mktsegment = '$g' THEN CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) END) AS BIGINT) AS "$g"""")
          .mkString(",\n  ")
        s"""SELECT n_name,
           |  $cols
           |FROM customer JOIN nation ON c_nationkey = n_nationkey
           |GROUP BY n_name""".stripMargin
      }),

    // ---- R13: latest-per-key (the SCD-type-1 / upsert-compaction view —
    //      "current state" of an append-only event stream). The winner is
    //      ONE partial-combining struct-max aggregation (the n7 sortless
    //      argmin trick: max(struct) compares fields left-to-right, and
    //      (ts, event_id) is already unique) — not a window sort, which
    //      would shuffle AND sort every row at 100 TB ----
    ("r13_latest_per_key",
      (s: SparkSession, d: String) =>
        Tables.events(s, d)
          // µs on BOTH sides of the compare AND the output: Spark reads
          // the parquet ts as raw ns (nanosAsLong) but DuckDB truncates
          // to TIMESTAMP µs — an ns-precision argmax could pick a
          // different winner than the oracle within a tied µs
          .groupBy("user_id")
          .agg(max(struct(expr("ts div 1000").as("tsu"), col("event_id"),
            col("event_type"), cents(col("value")).as("vc"))).as("m"))
          .select(col("user_id"), col("m.tsu").as("last_us"),
            col("m.event_id").as("event_id"),
            col("m.event_type").as("event_type"), col("m.vc").as("val_cents")),
      Some(
        """SELECT user_id, epoch_us(ts) AS last_us, event_id, event_type,
          |       CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS val_cents
          |FROM (SELECT *, row_number() OVER
          |        (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          |      FROM events)
          |WHERE rn = 1""".stripMargin)),

    // ---- R15: SCD-type-2 history view — the companion of r13's type-1
    //      "current state": every event becomes a validity interval
    //      [valid_from, valid_to) closed by the user's NEXT event (lead
    //      window), open-ended on the latest. One shuffle on user_id;
    //      µs integers and a 0/1 current flag keep it engine-exact ----
    ("r15_scd2_history",
      (s: SparkSession, d: String) => {
        Tables.events(s, d).createOrReplaceTempView("g_events")
        s.sql(
          """WITH ev AS (SELECT user_id, event_id, event_type,
            |              ts div 1000 AS vf FROM g_events),
            |w AS (SELECT user_id, event_id, event_type, vf,
            |        lead(vf) OVER (PARTITION BY user_id ORDER BY vf, event_id) AS vt
            |      FROM ev)
            |SELECT user_id, event_id, event_type, vf AS valid_from_us,
            |       vt AS valid_to_us,
            |       CAST(CASE WHEN vt IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
            |FROM w""".stripMargin)
      },
      Some(
        """WITH ev AS (SELECT user_id, event_id, event_type,
          |              epoch_us(ts) AS vf FROM events),
          |w AS (SELECT user_id, event_id, event_type, vf,
          |        lead(vf) OVER (PARTITION BY user_id ORDER BY vf, event_id) AS vt
          |      FROM ev)
          |SELECT user_id, event_id, event_type, vf AS valid_from_us,
          |       vt AS valid_to_us,
          |       CAST(CASE WHEN vt IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
          |FROM w""".stripMargin)),

    // ---- R19: MERGEABLE sketch rollup (Datasketches HLL) — per-day
    //      user sketches built once, the month estimate from
    //      hll_union_agg over the 30 day-sketches WITHOUT re-touching
    //      raw events: the sketch-mergeability property that makes
    //      distinct-rollups O(days) instead of O(events) at 100 TB
    //      (r9 pins one sketch's error; this pins the MERGE path).
    //      Oracle = exact counts + the 5% claim booleans, r9-style ----
    ("r19_sketch_merge",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
          .select(expr("ts div 86400000000000").as("day"),
            col("user_id")).localCheckpoint(true)
        val day = ev.groupBy("day").agg(
            hll_sketch_agg(col("user_id")).as("sk"),
            countDistinct(col("user_id")).as("ex"))
          .withColumn("est", expr("hll_sketch_estimate(sk)"))
          .withColumn("ok", abs(col("est") - col("ex")) <= col("ex") * 0.05)
        val tot = broadcast(
          ev.agg(countDistinct(col("user_id")).as("exact_total")))
        day.agg(count(lit(1)).as("n_days"),
            sum("ex").cast("long").as("day_exact_sum"),
            expr("hll_sketch_estimate(hll_union_agg(sk))").as("mest"),
            expr("bool_and(ok)").as("day_ok_all"))
          .crossJoin(tot)
          .select(col("n_days"), col("day_exact_sum"), col("exact_total"),
            (abs(col("mest") - col("exact_total"))
              <= col("exact_total") * 0.05).as("merged_ok"),
            col("day_ok_all"))
      },
      Some(
        """WITH ev AS (SELECT epoch_ns(ts) // 86400000000000 AS day, user_id
          |            FROM events),
          |day AS (SELECT day, count(DISTINCT user_id) AS ex FROM ev GROUP BY day)
          |SELECT (SELECT count(*) FROM day) AS n_days,
          |  (SELECT CAST(sum(ex) AS BIGINT) FROM day) AS day_exact_sum,
          |  (SELECT count(DISTINCT user_id) FROM ev) AS exact_total,
          |  true AS merged_ok, true AS day_ok_all""".stripMargin)),

    // ---- R18: incremental aggregate-view maintenance — a persisted
    //      per-customer aggregate STATE (count / cents-sum / first / last)
    //      is refreshed by MERGING the new batch's partial aggregate
    //      (counts and sums add, min/max combine), never recomputing
    //      history; the oracle recomputes from scratch, so the entry pins
    //      merged-state == full recompute. The 100 TB point: the refresh
    //      shuffles only the BATCH plus one state-sized table, not the
    //      corpus — every aggregate here is chosen mergeable (the same
    //      discipline d12 applies to dedup state and s13 to latest-per-
    //      key), which is what makes per-day rollup maintenance O(day)
    //      instead of O(history) ----
    ("r18_incremental_agg_merge",
      (s: SparkSession, d: String) => {
        val o = Tables.orders(s, d).select(col("o_custkey"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("od_ms"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
          .localCheckpoint(true)
        val r = o.agg(min("od_ms"), max("od_ms")).head()
        val mid = r.getLong(0) + (r.getLong(1) - r.getLong(0)) / 2
        def state(df: org.apache.spark.sql.DataFrame) = df.groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"),
            sum("cents").cast("long").as("cents_sum"),
            min("od_ms").as("first_ms"), max("od_ms").as("last_ms"))
        state(o.filter(col("od_ms") < mid))        // persisted history state
          .unionByName(state(o.filter(col("od_ms") >= mid))) // new batch state
          .groupBy("o_custkey")
          .agg(sum("n_orders").cast("long").as("n_orders"),
            sum("cents_sum").cast("long").as("cents_sum"),
            min("first_ms").as("first_ms"), max("last_ms").as("last_ms"))
      },
      Some(
        """SELECT o_custkey, count(*) AS n_orders,
          |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents_sum,
          |  min(epoch_ms(o_orderdate)) AS first_ms,
          |  max(epoch_ms(o_orderdate)) AS last_ms
          |FROM orders GROUP BY o_custkey""".stripMargin)),

    // ---- CUBE over region × market segment (SURVEY §2.8 names cube
    //      alongside rollup; r3 covers rollup, this covers the full
    //      lattice — 4 grouping sets in ONE pass via Expand) ----
    ("r10_cube",
      (s: SparkSession, d: String) => {
        Tables.customer(s, d).createOrReplaceTempView("g_customer")
        Tables.nation(s, d).createOrReplaceTempView("g_nation")
        Tables.region(s, d).createOrReplaceTempView("g_region")
        s.sql(
          """SELECT r_name, c_mktsegment, count(*) AS n_cust,
            |       CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS bal_cents
            |FROM g_customer
            |JOIN g_nation ON c_nationkey = n_nationkey
            |JOIN g_region ON n_regionkey = r_regionkey
            |GROUP BY CUBE (r_name, c_mktsegment)""".stripMargin)
      },
      Some(
        """SELECT r_name, c_mktsegment, count(*) AS n_cust,
          |       CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS bal_cents
          |FROM customer
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY CUBE (r_name, c_mktsegment)""".stripMargin)),

    // ---- R14: explicit GROUPING SETS — the aggregation shapes rollup
    //      and cube CANNOT express: two independent one-dimension
    //      groupings plus the grand total, computed in ONE pass (one
    //      Expand ×3 over the join, one shuffle) instead of three
    //      scans+union. GROUPING() disambiguates a real NULL key from a
    //      set-absent key, identically in both engines ----
    ("r14_grouping_sets",
      (s: SparkSession, d: String) => {
        Tables.customer(s, d).createOrReplaceTempView("g_customer")
        Tables.nation(s, d).createOrReplaceTempView("g_nation")
        Tables.region(s, d).createOrReplaceTempView("g_region")
        s.sql(
          """SELECT r_name, c_mktsegment,
            |       CAST(GROUPING(r_name) AS BIGINT) AS g_r,
            |       CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_m,
            |       count(*) AS n_cust,
            |       CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS bal_cents
            |FROM g_customer
            |JOIN g_nation ON c_nationkey = n_nationkey
            |JOIN g_region ON n_regionkey = r_regionkey
            |GROUP BY GROUPING SETS ((r_name), (c_mktsegment), ())""".stripMargin)
      },
      Some(
        """SELECT r_name, c_mktsegment,
          |       CAST(GROUPING(r_name) AS BIGINT) AS g_r,
          |       CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_m,
          |       count(*) AS n_cust,
          |       CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS bal_cents
          |FROM customer
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY GROUPING SETS ((r_name), (c_mktsegment), ())""".stripMargin)),

    // ---- R11: BATCH gap sessionization — the one-pass window form of
    //      the streaming flatMapGroupsWithState sessionizer (OnlineIngest
    //      .sessionize): lag marks session starts, a running sum numbers
    //      them, one aggregate closes them. ONE shuffle on user_id. Times
    //      are MICROSECONDS: DuckDB truncates the parquet ns timestamp to
    //      its native us on read, so ns-resolution outputs can never
    //      hash-match — both engines compare and emit us ----
    ("r11_sessionize_batch",
      (s: SparkSession, d: String) => {
        Tables.events(s, d).createOrReplaceTempView("g_events")
        s.sql(
          """WITH ev AS (SELECT user_id, event_id, ts div 1000 AS ts_us, value FROM g_events),
            |s1 AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
            |                        OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS ns
            |       FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
            |s2 AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
            |                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
            |       FROM s1)
            |SELECT user_id, sid, count(*) AS n_events,
            |       min(ts_us) AS start_us, max(ts_us) AS end_us,
            |       CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS val_cents
            |FROM s2 GROUP BY user_id, sid""".stripMargin)
      },
      Some(
        """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events),
          |s1 AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
          |                        OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS ns
          |       FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
          |s2 AS (SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
          |                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
          |       FROM s1)
          |SELECT user_id, sid, count(*) AS n_events,
          |       min(ts_us) AS start_us, max(ts_us) AS end_us,
          |       CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS val_cents
          |FROM s2 GROUP BY user_id, sid""".stripMargin)),

    // ---- range join: lineitems shipped within 30 days of order date ----
    ("r5_range_join",
      (s: SparkSession, d: String) => {
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        li.join(o, li("l_orderkey") === o("o_orderkey") &&
            datediff(li("l_shipdate"), o("o_orderdate")).between(0, 30))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum(cents(col("l_quantity"))).as("qty_cents"))
      },
      Some(
        """SELECT o_orderstatus, count(*) AS n,
          |       CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS qty_cents
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          | AND date_diff('day', o_orderdate, l_shipdate) BETWEEN 0 AND 30
          |GROUP BY o_orderstatus""".stripMargin)),

    // ---- r16: RANGE-frame rolling window — per-user trailing-1-hour
    //      event count and value sum at every event. The frame is bounded
    //      by the ORDER BY *value* (microseconds), not row offsets — the
    //      sliding-aggregate shape r2's ROWS frame cannot express; at
    //      scale it is ONE shuffle on user_id and a per-partition
    //      two-pointer sweep (no self-join, no explode of the window).
    //      Ties at the same ts are frame-peers on both engines, so the
    //      result is deterministic without an event_id tiebreak ----
    ("r16_rolling_range_window",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d).select(
          col("event_id"), col("user_id"),
          expr("ts div 1000").as("ts_us"), cents(col("value")).as("vc"))
        val w = Window.partitionBy("user_id").orderBy("ts_us")
          .rangeBetween(-3600000000L, 0L)
        ev.select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("roll_n"),
          sum("vc").over(w).as("roll_cents"))
      },
      Some(
        """SELECT event_id, user_id,
          |  count(*) OVER w AS roll_n,
          |  CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) OVER w AS BIGINT) AS roll_cents
          |FROM events
          |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
          |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin)),

    // ---- R21: last-touch attribution — each purchase attributes to the
    //      user's most recent click strictly before it and within a
    //      7-day horizon (the marketing-attribution / conversion-credit
    //      join). The x6 merged-timeline shape: ONE user_id shuffle, the
    //      last qualifying click rides a struct-argmax over the
    //      [unbounded, -1 row] frame (no per-purchase re-scan, no as-of
    //      join per touch type), horizon applied after. -1 = organic ----
    ("r21_attribution_last_touch",
      (s: SparkSession, d: String) => {
        val horizonUs = 7L * 24 * 3600 * 1000000L
        val ev = Tables.events(s, d).select(
          col("event_id"), col("user_id"), col("event_type"),
          expr("ts div 1000").as("ts_us"))
        val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        ev.withColumn("lc",
            max(when(col("event_type") === "click",
              struct(col("ts_us"), col("event_id")))).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_us").as("purch_us"),
            when(col("lc").isNotNull &&
                col("ts_us") - col("lc.ts_us") <= horizonUs,
              col("lc.event_id")).otherwise(-1L).as("click_id"),
            when(col("lc").isNotNull &&
                col("ts_us") - col("lc.ts_us") <= horizonUs,
              col("ts_us") - col("lc.ts_us")).otherwise(-1L).as("gap_us"))
      },
      Some(
        """SELECT event_id, user_id, purch_us,
          |  CASE WHEN lc IS NOT NULL AND purch_us - lc.ts_us <= 604800000000
          |       THEN lc.event_id ELSE -1 END AS click_id,
          |  CASE WHEN lc IS NOT NULL AND purch_us - lc.ts_us <= 604800000000
          |       THEN purch_us - lc.ts_us ELSE -1 END AS gap_us
          |FROM (SELECT event_id, user_id, event_type, epoch_us(ts) AS purch_us,
          |        max(CASE WHEN event_type = 'click'
          |            THEN {'ts_us': epoch_us(ts), 'event_id': event_id} END)
          |          OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
          |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lc
          |      FROM events)
          |WHERE event_type = 'purchase'""".stripMargin)),

    // ---- R22: semi-structured extraction — the JSON property column
    //      every event log carries, parsed with from_json (a typed,
    //      codegen'd projection — no UDF) and aggregated per event type.
    //      At 100 TB the parse rides the scan; only the per-type
    //      aggregate exchanges (partial-combining, ≤|types| keys) ----
    ("r22_json_extract",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
        ev.select(col("event_type"),
            from_json(col("props"),
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("k",
                  org.apache.spark.sql.types.LongType))))
              .getField("k").as("k"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("k").cast("long").as("k_sum"),
            min("k").cast("long").as("k_min"), max("k").cast("long").as("k_max"))
      },
      Some(
        """SELECT event_type, count(*) AS n,
          |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
          |  CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
          |  CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
          |FROM events GROUP BY event_type""".stripMargin)),

    // ---- R20: Markov transition table — the next-event model a
    //      behavioral pipeline fits from an event log: per (prev_type,
    //      event_type) transition counts and exact ppm row-normalized
    //      probabilities. Shape: ONE user_id shuffle for the lag, one
    //      partial-combining pair count (≤|types|² keys — tiny however
    //      big the log), probabilities from a window over that tiny
    //      table. All integers: engine-exact ----
    ("r20_markov_transitions",
      (s: SparkSession, d: String) => {
        val wl = Window.partitionBy("user_id")
          .orderBy(expr("ts div 1000"), col("event_id"))
        val pairs = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
          .withColumn("prev_type", lag("event_type", 1).over(wl))
          .filter(col("prev_type").isNotNull)
          .groupBy("prev_type", "event_type").agg(count(lit(1)).as("n"))
        pairs.withColumn("p_ppm",
          expr("1000000 * n div sum(n) over (partition by prev_type)"))
      },
      Some(
        """WITH pairs AS (
          |  SELECT prev_type, event_type, count(*) AS n FROM (
          |    SELECT event_type,
          |      lag(event_type, 1) OVER (PARTITION BY user_id
          |        ORDER BY epoch_us(ts), event_id) AS prev_type
          |    FROM events)
          |  WHERE prev_type IS NOT NULL
          |  GROUP BY prev_type, event_type)
          |SELECT prev_type, event_type, n,
          |  CAST(1000000 * n // sum(n) OVER (PARTITION BY prev_type)
          |       AS BIGINT) AS p_ppm
          |FROM pairs""".stripMargin)),

    // ---- X6: point-in-time-correct feature join — training-set
    //      generation for a feature store (the Feast/Tecton "as-of
    //      correct" contract): each label row (a purchase event) gets the
    //      features computable from STRICTLY EARLIER events of the same
    //      user — prior event count, prior value sum, the immediately
    //      preceding event's type — with zero leakage. Shape: NOT one
    //      as-of join per feature (k passes over the fact table); the
    //      label and feature streams share one user_id shuffle, features
    //      accumulate in a [unbounded, -1 row] frame over the merged
    //      timeline, and label rows are filtered out at the end — one
    //      pass however many features ride along. Frame order
    //      (ts_us, event_id) is unique, so every engine sees the same
    //      prefix ----
    ("x6_feature_join_pit",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d).select(
          col("event_id"), col("user_id"), col("event_type"),
          expr("ts div 1000").as("ts_us"), cents(col("value")).as("vc"))
        val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        val wl = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        ev.select(col("event_id"), col("user_id"), col("event_type"),
            col("ts_us"),
            count(lit(1)).over(w).as("n_prior"),
            coalesce(sum("vc").over(w), lit(0L)).as("prior_cents"),
            coalesce(lag("event_type", 1).over(wl), lit("none")).as("prev_type"))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_us").as("label_us"),
            col("n_prior"), col("prior_cents"), col("prev_type"))
      },
      Some(
        """SELECT event_id, user_id, label_us, n_prior, prior_cents, prev_type
          |FROM (SELECT event_id, user_id, event_type, epoch_us(ts) AS label_us,
          |        count(*) OVER wp AS n_prior,
          |        coalesce(CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) OVER wp AS BIGINT), 0) AS prior_cents,
          |        coalesce(lag(event_type, 1) OVER wl, 'none') AS prev_type
          |      FROM events
          |      WINDOW wp AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
          |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
          |             wl AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
          |WHERE event_type = 'purchase'""".stripMargin)),
  )
}
