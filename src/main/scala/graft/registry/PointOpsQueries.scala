package graft.registry

import graft._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Oracle.withSql

/** SURVEY.md §2.2 point lookups / mutations (P1-P9), §2.4 frontier algebra
  * (F2/F8/F9), §2.5 ego-net + census + name index (Q8/Q9/Q10/Q12), §2.6
  * sweeps (W2/W3). Mutation semantics are verified through aggregate
  * summaries of the post-mutation table — the mutated table itself is the
  * operator's output, but a compact summary keeps the parity dump small
  * while still pinning every row via count+checksum. */
object PointOpsQueries {

  val entries: Seq[QueryEntry] = Seq(

    // ---- P1: edge existence (reference QueryShard.java:207-253) ----
    ("p1_find_edge",
      (s: SparkSession, d: String) => {
        val db = GraphDB.orderGraph(s, d)
        val v = Queries.minSrc(db.edges)
        val w = db.edges.join(broadcast(v), col("src") === col("qv"))
          .agg(min("dst").as("qw"))
        db.edges.join(broadcast(v), col("src") === col("qv"))
          .join(broadcast(w), col("dst") === col("qw"))
          .filter(col("etype") === 0)
          .agg(count(lit(1)).as("n"))
      },
      Some(withSql(Oracle.EDGES,
        """SELECT count(*) AS n FROM edges
          |WHERE src = (SELECT min(src) FROM edges)
          |  AND dst = (SELECT min(dst) FROM edges WHERE src = (SELECT min(src) FROM edges))
          |  AND etype = 0""".stripMargin))),

    // ---- P2: edge value read (reference GraphChiDatabase.scala:1385-1399) ----
    ("p2_edge_value",
      (s: SparkSession, d: String) => {
        val db = GraphDB.orderGraph(s, d)
        val v = Queries.minSrc(db.edges)
        val w = db.edges.join(broadcast(v), col("src") === col("qv"))
          .agg(min("dst").as("qw"))
        db.edges.join(broadcast(v), col("src") === col("qv"))
          .join(broadcast(w), col("dst") === col("qw"))
          .agg(sum(cents(col("weight"))).as("wsum_cents"),
               count(lit(1)).as("n"))
      },
      Some(withSql(Oracle.EDGES,
        """SELECT CAST(sum(CAST(CAST(weight AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS wsum_cents,
          |       count(*) AS n
          |FROM edges
          |WHERE src = (SELECT min(src) FROM edges)
          |  AND dst = (SELECT min(dst) FROM edges WHERE src = (SELECT min(src) FROM edges))""".stripMargin))),

    // ---- P3: updateEdge (reference GraphChiDatabase.scala:1234-1270) ----
    ("p3_update_edge",
      (s: SparkSession, d: String) => {
        val db = GraphDB.orderGraph(s, d)
        val v = Queries.minSrc(db.edges)
        val updated = db.withEdges(db.edges.crossJoin(broadcast(v)))
          .updateEdge(col("src") === col("qv"), "rating", lit(9))
        updated.edges.agg(sum(col("rating")).cast("long").as("rating_sum"),
                          count(lit(1)).as("n"))
      },
      Some(withSql(Oracle.EDGES,
        """SELECT CAST(sum(CASE WHEN src = (SELECT min(src) FROM edges) THEN 9 ELSE rating END) AS BIGINT) AS rating_sum,
          |       count(*) AS n
          |FROM edges""".stripMargin))),

    // ---- P4: deleteEdge (reference GraphChiDatabase.scala:1273-1305) ----
    ("p4_delete_edge",
      (s: SparkSession, d: String) => {
        val db = GraphDB.orderGraph(s, d)
        val v = Queries.minSrc(db.edges)
        val w = db.edges.join(broadcast(v), col("src") === col("qv"))
          .agg(min("dst").as("qw"))
        val del = db.withEdges(db.edges.crossJoin(broadcast(v)).crossJoin(broadcast(w)))
          .deleteEdges(col("src") === col("qv") && col("dst") === col("qw"))
        del.edges.agg(count(lit(1)).as("n"),
                      sum(cents(col("weight"))).as("wsum_cents"))
      },
      Some(withSql(Oracle.EDGES,
        """SELECT count(*) AS n,
          |       CAST(sum(CAST(CAST(weight AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS wsum_cents
          |FROM edges
          |WHERE NOT (src = (SELECT min(src) FROM edges)
          |       AND dst = (SELECT min(dst) FROM edges WHERE src = (SELECT min(src) FROM edges)))""".stripMargin))),

    // ---- P5: deleteVertex (reference GraphChiDatabase.scala:1307-1339) ----
    ("p5_delete_vertex",
      (s: SparkSession, d: String) => {
        val db = GraphDB.orderGraph(s, d)
        val v = Queries.minSrc(db.edges)
        db.edges.crossJoin(broadcast(v))
          .filter(col("src") =!= col("qv") && col("dst") =!= col("qv"))
          .agg(count(lit(1)).as("n"),
               sum(cents(col("weight"))).as("wsum_cents"))
      },
      Some(withSql(Oracle.EDGES,
        """SELECT count(*) AS n,
          |       CAST(sum(CAST(CAST(weight AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS wsum_cents
          |FROM edges
          |WHERE src <> (SELECT min(src) FROM edges) AND dst <> (SELECT min(src) FROM edges)""".stripMargin))),

    // ---- P7: column predicate scan (reference Column.scala:198-225) ----
    ("p7_column_select",
      (s: SparkSession, d: String) =>
        Tables.vertices(s, d).filter(col("acctbal") < 0).select("id", "acctbal"),
      Some(withSql(Oracle.VERTICES,
        "SELECT id, acctbal FROM vertices WHERE acctbal < 0"))),

    // ---- P8: column fold/aggregate (reference Column.scala:175-190) ----
    ("p8_column_fold",
      (s: SparkSession, d: String) =>
        Tables.vertices(s, d).groupBy("vtype").agg(
          count(lit(1)).as("n"),
          sum(cents(col("acctbal"))).as("bal_cents"),
          min("name").as("min_name")),
      Some(withSql(Oracle.VERTICES,
        """SELECT vtype, count(*) AS n,
          |       CAST(sum(CAST(CAST(acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS bal_cents,
          |       min(name) AS min_name
          |FROM vertices GROUP BY vtype""".stripMargin))),

    // ---- P9: bulk column rewrite (reference Column.scala:187-190) ----
    ("p9_update_all",
      (s: SparkSession, d: String) => {
        val db = GraphDB.orderGraph(s, d)
        db.updateAllVertices("acctbal", c => cents(c) * 2)
          .vertices.select(col("id"), col("acctbal").as("newbal_cents"))
      },
      Some(withSql(Oracle.VERTICES,
        "SELECT id, CAST(CAST(acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) * 2 AS newbal_cents FROM vertices"))),

    // ---- F2: one traverseOut hop (reference FrontierQueries.scala:82-99) ----
    ("f2_traverse_out",
      (s: SparkSession, d: String) => {
        val db = GraphDB.orderGraph(s, d)
        val ids = db.edges.select(col("src").as("id")).distinct().orderBy("id").limit(5)
        db.frontier(ids).traverseOut().ids
      },
      Some(withSql(Oracle.EDGES,
        """SELECT DISTINCT dst AS id FROM edges
          |WHERE src IN (SELECT DISTINCT src FROM edges ORDER BY src LIMIT 5)""".stripMargin))),

    // ---- F3: filtered expansion — per-edge predicate during the hop ----
    ("f3_traverse_filtered",
      (s: SparkSession, d: String) => {
        val db = GraphDB.orderGraph(s, d)
        val ids = db.edges.select(col("src").as("id")).distinct().orderBy("id").limit(20)
        db.frontier(ids).traverseOutWhere(col("weight") >= 50000.0).ids
      },
      Some(withSql(Oracle.EDGES,
        """SELECT DISTINCT dst AS id FROM edges
          |WHERE src IN (SELECT DISTINCT src FROM edges ORDER BY src LIMIT 20)
          |  AND weight >= 50000.0""".stripMargin))),

    // ---- F8: deterministic frontier limit (reference VertexFrontier.scala:53-68) ----
    ("f8_frontier_limit",
      (s: SparkSession, d: String) => {
        val db = GraphDB.orderGraph(s, d)
        db.frontier(db.edges.select(col("dst").as("id")).distinct()).limit(7).ids
      },
      Some(withSql(Oracle.EDGES,
        "SELECT id FROM (SELECT DISTINCT dst AS id FROM edges) ORDER BY id LIMIT 7"))),

    // ---- F9: frontier set algebra (reference VertexFrontier.scala:34-201) ----
    ("f9_frontier_setops",
      (s: SparkSession, d: String) => {
        val e = Tables.orderEdges(s, d)
        val v1 = e.agg(min("src").as("q1"))
        val v2 = e.crossJoin(broadcast(v1)).filter(col("src") > col("q1"))
          .agg(min("src").as("q2"))
        val n1 = e.join(broadcast(v1), col("src") === col("q1"))
          .select(col("dst").as("id")).distinct()
        val n2 = e.join(broadcast(v2), col("src") === col("q2"))
          .select(col("dst").as("id")).distinct()
        n1.union(n2).distinct().agg(count(lit(1)).as("n_union"))
          .crossJoin(n1.intersect(n2).agg(count(lit(1)).as("n_intersect")))
          .crossJoin(n1.except(n2).agg(count(lit(1)).as("n_diff")))
      },
      Some(withSql(Oracle.EDGES,
        """, v1 AS (SELECT min(src) AS q1 FROM edges),
          |v2 AS (SELECT min(src) AS q2 FROM edges WHERE src > (SELECT q1 FROM v1)),
          |s1 AS (SELECT DISTINCT dst AS id FROM edges, v1 WHERE src = q1),
          |s2 AS (SELECT DISTINCT dst AS id FROM edges, v2 WHERE src = q2)
          |SELECT (SELECT count(*) FROM (SELECT id FROM s1 UNION SELECT id FROM s2)) AS n_union,
          |       (SELECT count(*) FROM (SELECT id FROM s1 INTERSECT SELECT id FROM s2)) AS n_intersect,
          |       (SELECT count(*) FROM (SELECT id FROM s1 EXCEPT SELECT id FROM s2)) AS n_diff""".stripMargin))),

    // ---- Q8: ego network (reference SubgraphFrequencies.scala:92-99) ----
    ("q8_ego_net",
      (s: SparkSession, d: String) => {
        val cp = Tables.coPurchaseEdges(s, d)
        Queries.egoNet(cp, cp.agg(min("src").as("qv")))
      },
      Some(withSql(Oracle.CP_EDGES,
        """, ego AS (SELECT min(src) AS v FROM cp),
          |nb AS (SELECT DISTINCT id FROM (
          |  SELECT dst AS id FROM cp, ego WHERE src = v
          |  UNION ALL SELECT src FROM cp, ego WHERE dst = v))
          |SELECT src, dst FROM cp
          |WHERE src IN (SELECT id FROM nb) AND dst IN (SELECT id FROM nb)""".stripMargin))),

    // ---- Q9: exact wedge/triangle census (det. variant of sampling) ----
    ("q9_subgraph_census",
      (s: SparkSession, d: String) =>
        Queries.subgraphCensus(Tables.coPurchaseEdges(s, d)),
      Some(withSql(Oracle.CP_EDGES,
        """, deg AS (SELECT id, count(*) AS d FROM
          |  (SELECT src AS id FROM cp UNION ALL SELECT dst FROM cp) GROUP BY id),
          |wed AS (SELECT CAST(sum((d * (d - 1)) // 2) AS BIGINT) AS wedges FROM deg),
          |tri AS (SELECT count(*) AS triangles
          |        FROM cp ab JOIN cp bc ON ab.dst = bc.src
          |        JOIN cp ac ON ac.src = ab.src AND ac.dst = bc.dst)
          |SELECT wedges, triangles FROM wed CROSS JOIN tri""".stripMargin))),

    // ---- Q9b: SEEDED SAMPLED census — the reference's actual access
    //      pattern (SubgraphFrequencies.scala:107-148: random egos →
    //      induced neighborhood → sampled 3-vertex profiles), with every
    //      random draw replaced by md5 so the oracle replays the same
    //      egos and the same triples. Counts, not fractions (hash-exact).
    //      VERDICT r5 missing #3. ----
    ("q9b_census_sampled",
      (s: SparkSession, d: String) =>
        Queries.sampledSubgraphFrequencies(Tables.coPurchaseEdges(s, d),
          nEgos = 12, samplesPerEgo = 400),
      Some(withSql(Oracle.CP_EDGES,
        """, deg9 AS (SELECT id, count(*) AS d FROM
          |  (SELECT src AS id FROM cp UNION ALL SELECT dst FROM cp) GROUP BY id),
          |cand9 AS (SELECT id AS ego FROM deg9 WHERE d >= 4
          |          ORDER BY md5('q9b|' || id), id LIMIT 36),
          |nb9 AS (SELECT DISTINCT ego, v FROM (
          |  SELECT c.ego, e.dst AS v FROM cp e JOIN cand9 c ON e.src = c.ego
          |  UNION ALL
          |  SELECT c.ego, e.src AS v FROM cp e JOIN cand9 c ON e.dst = c.ego)),
          |ie9 AS (SELECT a.ego, e.src, e.dst FROM cp e
          |  JOIN nb9 a ON a.v = e.src
          |  JOIN nb9 b ON b.ego = a.ego AND b.v = e.dst),
          |vset9 AS (SELECT DISTINCT ego, v FROM (
          |  SELECT ego, src AS v FROM ie9 UNION ALL SELECT ego, dst AS v FROM ie9)),
          |egos9 AS (SELECT ego, sz FROM
          |  (SELECT ego, count(*) AS sz FROM vset9 GROUP BY ego)
          |  WHERE sz >= 4 ORDER BY md5('q9b|' || ego), ego LIMIT 12),
          |vlist9 AS (SELECT ego, v,
          |    row_number() OVER (PARTITION BY ego ORDER BY v) - 1 AS idx
          |  FROM vset9 WHERE ego IN (SELECT ego FROM egos9)),
          |hs9 AS (
          |  SELECT ego, sz, j,
          |    CAST(('0x' || substr(md5('q9b|' || ego || '_' || j || '_1'), 1, 8)) AS BIGINT) % sz AS i1,
          |    CAST(('0x' || substr(md5('q9b|' || ego || '_' || j || '_2'), 1, 8)) AS BIGINT) % (sz - 1) AS t2,
          |    CAST(('0x' || substr(md5('q9b|' || ego || '_' || j || '_3'), 1, 8)) AS BIGINT) % (sz - 2) AS t3
          |  FROM egos9, (SELECT unnest(range(0, 400)) AS j) js),
          |i29 AS (SELECT ego, j, i1,
          |    t2 + (CASE WHEN t2 >= i1 THEN 1 ELSE 0 END) AS i2, t3 FROM hs9),
          |i39 AS (SELECT ego, j, i1, i2,
          |    t3 + (CASE WHEN t3 >= least(i1, i2) THEN 1 ELSE 0 END)
          |       + (CASE WHEN t3 + (CASE WHEN t3 >= least(i1, i2) THEN 1 ELSE 0 END)
          |               >= greatest(i1, i2) THEN 1 ELSE 0 END) AS i3
          |  FROM i29),
          |tri9 AS (SELECT x.ego, x.j, a.v AS v1, b.v AS v2, c.v AS v3
          |  FROM i39 x
          |  JOIN vlist9 a ON a.ego = x.ego AND a.idx = x.i1
          |  JOIN vlist9 b ON b.ego = x.ego AND b.idx = x.i2
          |  JOIN vlist9 c ON c.ego = x.ego AND c.idx = x.i3),
          |prs9 AS (
          |  SELECT ego, j, least(v1, v2) AS src, greatest(v1, v2) AS dst FROM tri9
          |  UNION ALL SELECT ego, j, least(v1, v3), greatest(v1, v3) FROM tri9
          |  UNION ALL SELECT ego, j, least(v2, v3), greatest(v2, v3) FROM tri9),
          |cnts9 AS (SELECT p.ego, p.j, count(i.src) AS c
          |  FROM prs9 p LEFT JOIN ie9 i
          |    ON i.ego = p.ego AND i.src = p.src AND i.dst = p.dst
          |  GROUP BY p.ego, p.j)
          |SELECT ego,
          |  CAST(count(*) FILTER (c = 0) AS BIGINT) AS e0,
          |  CAST(count(*) FILTER (c = 1) AS BIGINT) AS e1,
          |  CAST(count(*) FILTER (c = 2) AS BIGINT) AS e2,
          |  CAST(count(*) FILTER (c = 3) AS BIGINT) AS e3
          |FROM cnts9 GROUP BY ego""".stripMargin))),

    // ---- Q10: out-neighbors with timestamps (reference
    //      SocialNetworkExample.scala:166-168) ----
    ("q10_out_with_timestamps",
      (s: SparkSession, d: String) => {
        val db = GraphDB.orderGraph(s, d)
        db.edges.join(broadcast(Queries.minSrc(db.edges)), col("src") === col("qv"))
          .select("dst", "ets")
      },
      Some(withSql(Oracle.EDGES,
        "SELECT dst, ets FROM edges WHERE src = (SELECT min(src) FROM edges)"))),

    // ---- Q12: name → id index lookup (reference WikipediaGraph.scala:134-157) ----
    ("q12_lookup_by_name",
      (s: SparkSession, d: String) => {
        val vs = Tables.vertices(s, d)
        val target = vs.filter(col("vtype") === "supplier").agg(min("name").as("qn"))
        Queries.lookupByName(vs.crossJoin(broadcast(target)), col("name") === col("qn"))
      },
      Some(withSql(Oracle.VERTICES,
        """SELECT id, vtype, name FROM vertices
          |WHERE name = (SELECT min(name) FROM vertices WHERE vtype = 'supplier')""".stripMargin))),

    // ---- W2: in-edge sweep over a dst interval (reference
    //      GraphChiDatabase.scala:2083-2122) — partition-prunable range ----
    ("w2_sweep_in_interval",
      (s: SparkSession, d: String) =>
        Tables.orderEdgesForDstRange(s, d, Tables.SupplierBase, Tables.SupplierBase + 4)
          .filter(col("dst").between(Tables.SupplierBase, Tables.SupplierBase + 4))
          .groupBy("dst")
          .agg(count(lit(1)).as("n"), sum("rating").cast("long").as("rating_sum")),
      Some(withSql(Oracle.EDGES,
        """SELECT dst, count(*) AS n, CAST(sum(rating) AS BIGINT) AS rating_sum
          |FROM edges WHERE dst BETWEEN 1000000 AND 1000004 GROUP BY dst""".stripMargin))),

    // ---- W2c: the dst-interval sweep served from the dst-SORTED second
    //      materialization of the edge store (the reference's in-edge
    //      index): dst is a real column there, so the range prunes row
    //      groups with no rewrite at all; same oracle as w2 ----
    ("w2c_sweep_in_interval_store",
      (s: SparkSession, d: String) =>
        Tables.orderEdgesStoredByDst(s, d)
          .filter(col("dst").between(Tables.SupplierBase, Tables.SupplierBase + 4))
          .groupBy("dst")
          .agg(count(lit(1)).as("n"), sum("rating").cast("long").as("rating_sum")),
      Some(withSql(Oracle.EDGES,
        """SELECT dst, count(*) AS n, CAST(sum(rating) AS BIGINT) AS rating_sum
          |FROM edges WHERE dst BETWEEN 1000000 AND 1000004 GROUP BY dst""".stripMargin))),

    // ---- W2b: the same dst-interval sweep in its NATURAL form — no
    //      hand-rewrite; the OffsetComparisonRewrite optimizer rule inverts
    //      `l_suppkey + 1e6 BETWEEN lo AND hi` onto the source column so
    //      the range still reaches the parquet scan (plan asserted in
    //      RuleSpec; same oracle as w2) ----
    ("w2b_sweep_in_interval_rule",
      (s: SparkSession, d: String) => {
        // install into a CHILD session (same SparkContext, own sessionState)
        // so the rewrite never leaks into other queries' planning — the
        // rule is semantics-changing in non-ANSI overflow corners
        val s2 = s.newSession()
        graft.plans.OffsetComparisonRewrite.install(s2)
        Tables.orderEdges(s2, d)
          .filter(col("dst").between(Tables.SupplierBase, Tables.SupplierBase + 4))
          .groupBy("dst")
          .agg(count(lit(1)).as("n"), sum("rating").cast("long").as("rating_sum"))
      },
      Some(withSql(Oracle.EDGES,
        """SELECT dst, count(*) AS n, CAST(sum(rating) AS BIGINT) AS rating_sum
          |FROM edges WHERE dst BETWEEN 1000000 AND 1000004 GROUP BY dst""".stripMargin))),

    // ---- W5: two-dimensional (src AND dst) range sweep served from the
    //      Z-ORDERED third materialization (Tables.edgeStoreZPath): the
    //      Morton-interleaved sort gives every file/row group tight
    //      min/max on BOTH columns, so each range reaches the scan and
    //      prunes — one layout serving both sweep directions (spec
    //      asserts the two-sided clustering; Delta/Iceberg ZORDER as a
    //      plain write-time sort key) ----
    ("w5_zorder_range",
      (s: SparkSession, d: String) =>
        Tables.orderEdgesStoredZ(s, d)
          .filter(col("src").between(1, 400) &&
            col("dst").between(Tables.SupplierBase + 1, Tables.SupplierBase + 40))
          .agg(count(lit(1)).as("n"),
            sum("src").cast("long").as("src_sum"),
            sum("dst").cast("long").as("dst_sum"),
            sum(cents(col("weight"))).as("weight_cents")),
      Some(withSql(Oracle.EDGES,
        """SELECT count(*) AS n, CAST(sum(src) AS BIGINT) AS src_sum,
          |       CAST(sum(dst) AS BIGINT) AS dst_sum,
          |       CAST(sum(CAST(CAST(weight AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS weight_cents
          |FROM edges
          |WHERE src BETWEEN 1 AND 400 AND dst BETWEEN 1000001 AND 1000040""".stripMargin))),

    // ---- W6: fact⋈fact join served from BUCKETED storage
    //      (Tables.bucketedOrdersLineitem): both tables bucketed 8-way on
    //      their join keys at write time, so the sort-merge join runs
    //      with NO Exchange on either side (W6BucketedJoinSpec asserts
    //      the Exchange-free plan). The shuffle is paid once at ingest —
    //      the Spark mirror of the reference sharding both edge
    //      directions on vertex ranges (FastSharder.java:55-198) so
    //      queries never re-partition ----
    ("w6_bucketed_join",
      (s: SparkSession, d: String) => {
        val (ot, lt) = Tables.bucketedOrdersLineitem(s, d)
        s.table(ot).join(s.table(lt), col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
            sum(cents(col("l_extendedprice"))).as("price_cents"))
      },
      Some(
        """SELECT o_orderpriority, count(*) AS n_items,
          |       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS price_cents
          |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          |GROUP BY o_orderpriority""".stripMargin)),

    // ---- W8: schema evolution — the evolving store appends a batch
    //      with a NEW column; mergeSchema reconciles footers at read
    //      time and pre-evolution rows surface the column as null. No
    //      old-file rewrite: at 100 TB an additive column is a metadata
    //      change, not a re-ingest ----
    ("w8_schema_evolution",
      (s: SparkSession, d: String) =>
        s.read.option("mergeSchema", "true")
          .parquet(Tables.evolvedEventStorePath(s, d))
          .groupBy(col("quality").isNotNull.cast("long").as("has_quality"))
          .agg(count(lit(1)).as("n"),
            sum("val_cents").cast("long").as("val_cents"),
            sum(coalesce(col("quality"), lit(0L))).cast("long").as("quality_sum")),
      Some(
        """SELECT CAST(event_id % 2 AS BIGINT) AS has_quality, count(*) AS n,
          |  CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS val_cents,
          |  CAST(sum(CASE WHEN event_id % 2 = 1 THEN event_id % 100 ELSE 0 END) AS BIGINT) AS quality_sum
          |FROM events GROUP BY 1""".stripMargin)),

    // ---- W7: DYNAMIC partition pruning — the day-partitioned event log
    //      joined to a filtered date dimension; the qualifying days are
    //      only known at runtime (the dim is materialized, its dow
    //      column opaque to constraint propagation), so whole `day=`
    //      directories are skipped via the DPP subquery filter
    //      (W7DppSpec asserts it reaches the scan). At 100 TB this is
    //      the difference between scanning 1/7th of the log and all of
    //      it ----
    ("w7_dpp_day_prune",
      (s: SparkSession, d: String) => {
        val ev = s.read.parquet(Tables.eventsByDayPath(s, d))
        val dim = Tables.eventDayDim(s, d).filter(col("dow") === 1)
        ev.join(dim, "day")
          .agg(countDistinct(col("day")).as("n_days"),
            count(lit(1)).as("n"),
            sum(cents(col("value"))).as("val_cents"))
      },
      Some(
        """WITH ev AS (SELECT epoch_ns(ts) // 86400000000000 AS day, value FROM events)
          |SELECT count(DISTINCT day) AS n_days, count(*) AS n,
          |       CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS val_cents
          |FROM ev WHERE day % 7 = 1""".stripMargin)),

    // ---- W3: sweep with vertex-column join (reference
    //      GraphChiDatabase.scala:1875-1957) — the PageRank access pattern ----
    ("w3_sweep_in_join",
      (s: SparkSession, d: String) => {
        val e = Tables.orderEdges(s, d)
        val v = Tables.vertices(s, d).select(col("id").as("src"), col("acctbal"))
        e.join(v, "src").groupBy(col("dst").as("id"))
          .agg(count(lit(1)).as("n"),
               sum(cents(col("acctbal"))).as("bal_cents"))
      },
      Some(withSql(Oracle.EDGES + ",\n" + Oracle.VERTICES,
        """SELECT e.dst AS id, count(*) AS n,
          |       CAST(sum(CAST(CAST(v.acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS bal_cents
          |FROM edges e JOIN vertices v ON e.src = v.id
          |GROUP BY e.dst""".stripMargin))),

    // ---- P6: getMany — point multi-get over a vertex id set (reference
    //      Column.scala:48-57 getMany) ----
    ("p6_get_many",
      (s: SparkSession, d: String) => {
        val ids = (1L to 5L).map(_ + Tables.SupplierBase)
        Tables.vertices(s, d).filter(col("id").isin(ids: _*))
          .select("id", "name", "acctbal")
      },
      Some(withSql(Oracle.VERTICES,
        """SELECT id, name, acctbal FROM vertices
          |WHERE id IN (1000001, 1000002, 1000003, 1000004, 1000005)""".stripMargin))),

    // ---- C8: auto-fill columns — defaults materialized on first touch
    //      (reference GraphChiDatabase.scala:888-899, Column.scala:77-78):
    //      hierarchy-graph endpoints without a vertex row get generated
    //      property values via coalesce-with-default ----
    ("c8_autofill",
      (s: SparkSession, d: String) => {
        val db = GraphDB.nationGraph(s, d)
        db.endpoints.join(db.vertices, Seq("id"), "left_outer")
          .select(col("id"),
            coalesce(col("vtype"), lit("auto")).as("vtype"),
            coalesce(col("name"), concat(lit("v"), col("id").cast("string"))).as("name"))
      },
      Some(withSql(Oracle.NEDGES + ",\n" + Oracle.VERTICES,
        """, ep AS (SELECT DISTINCT id FROM
          |  (SELECT src AS id FROM nedges UNION ALL SELECT dst FROM nedges))
          |SELECT ep.id, COALESCE(v.vtype, 'auto') AS vtype,
          |       COALESCE(v.name, 'v' || ep.id) AS name
          |FROM ep LEFT JOIN vertices v ON ep.id = v.id""".stripMargin))),

    // ---- Q6b: SSSP parent tree (deterministic min-parent variant) ----
    ("q6_sssp_parents",
      (s: SparkSession, d: String) => {
        val sym = Tables.nationEdgesSym(s, d)
        val src = sym.filter(col("src") >= Tables.SupplierBase && col("src") < Tables.NationBase)
          .agg(min("src").as("id"))
        Traversals.ssspTree(sym, src, maxDepth = 4)
      },
      Some(withSql(Oracle.NEDGES_SYM,
        """, f AS (SELECT min(src) AS s FROM nsym WHERE src >= 1000000 AND src < 2000000),
          |walk(id, dist) AS (
          |  SELECT s, 0 FROM f
          |  UNION
          |  SELECT n.dst, w.dist + 1 FROM walk w JOIN nsym n ON w.id = n.src WHERE w.dist < 4),
          |dd AS (SELECT id, CAST(min(dist) AS BIGINT) AS dist FROM walk GROUP BY id),
          |par AS (
          |  SELECT n.dst AS id, min(n.src) AS parent
          |  FROM nsym n JOIN dd p ON n.src = p.id JOIN dd c ON n.dst = c.id
          |  WHERE c.dist = p.dist + 1
          |  GROUP BY n.dst)
          |SELECT dd.id, dd.dist, COALESCE(par.parent, dd.id) AS parent
          |FROM dd LEFT JOIN par ON dd.id = par.id""".stripMargin))),

    // ---- N1/P1 served from the materialized sorted edge store: same
    //      oracle as the derived-graph entries — the store must hold the
    //      identical graph; only the physical layout (range-partitioned,
    //      src-sorted, row-group prunable) differs ----
    ("n1_query_out_store",
      (s: SparkSession, d: String) => {
        val db = GraphDB.orderGraphStored(s, d)
        db.edges.join(broadcast(Queries.minSrc(db.edges)), col("src") === col("qv"))
          .select("src", "dst", "etype", "ets", "weight", "rating")
      },
      Some(withSql(Oracle.EDGES,
        """SELECT src, dst, etype, ets, weight, rating FROM edges
          |WHERE src = (SELECT min(src) FROM edges)""".stripMargin))),

    ("p1_find_edge_store",
      (s: SparkSession, d: String) => {
        val db = GraphDB.orderGraphStored(s, d)
        val v = Queries.minSrc(db.edges)
        val w = db.edges.join(broadcast(v), col("src") === col("qv"))
          .agg(min("dst").as("qw"))
        db.edges.join(broadcast(v), col("src") === col("qv"))
          .join(broadcast(w), col("dst") === col("qw"))
          .filter(col("etype") === 0)
          .agg(count(lit(1)).as("n"))
      },
      Some(withSql(Oracle.EDGES,
        """SELECT count(*) AS n FROM edges
          |WHERE src = (SELECT min(src) FROM edges)
          |  AND dst = (SELECT min(dst) FROM edges WHERE src = (SELECT min(src) FROM edges))
          |  AND etype = 0""".stripMargin))),

    // ---- N7: random vertex (reference GraphChiDatabase.scala:1839-1852;
    //      unseeded there — determinized as an md5 keyed shuffle, which is
    //      just as arbitrary but reproducible in ANY engine, so the pick
    //      is fully oracle-checked). Computed as an argmin over a struct
    //      — min(struct(h, id)) compares fields left-to-right, exactly
    //      ORDER BY h, id LIMIT 1 — so the plan is ONE partial-combined
    //      aggregation over the raw endpoint rows: no distinct shuffle
    //      (duplicate ids cannot change a min) and no sort ----
    ("n7_random_vertex",
      (s: SparkSession, d: String) => {
        val db = GraphDB.orderGraph(s, d)
        db.edges.select(col("src").as("id"))
          .unionAll(db.edges.select(col("dst").as("id")))
          .agg(min(struct(md5(concat(lit("n7|"), col("id"))).as("h"),
            col("id").as("id"))).as("m"))
          // a global agg over zero rows yields one NULL row, but the
          // oracle's ORDER BY ... LIMIT 1 yields zero — match it
          .where(col("m").isNotNull)
          .select(col("m.id").as("id"))
      },
      Some(withSql(Oracle.EDGES,
        """, ep AS (SELECT DISTINCT id FROM
          |  (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges))
          |SELECT id FROM ep ORDER BY md5('n7|' || id), id LIMIT 1""".stripMargin))),

    // ---- Q2: FoF with randomized friend limit (reference Queries.scala:64-70;
    //      unseeded Random there — md5-shuffled hop-1 subset here, engine-
    //      independent so the whole query is oracle-checked) ----
    ("q2_fof_limit",
      (s: SparkSession, d: String) => {
        val e = Tables.socialEdges(s, d)
        val v = Queries.minSrc(e)
        val hop1 = e.join(broadcast(v), col("src") === col("qv"))
          .select(col("dst").as("mid"), col("qv")).distinct()
          .orderBy(md5(concat(lit("q2|"), col("mid"))), col("mid")).limit(10)
        hop1.join(e.select(col("src").as("mid"), col("dst")), "mid")
          .filter(col("dst") =!= col("qv"))
          .groupBy(col("dst").as("id")).agg(count(lit(1)).as("paths"))
          .orderBy(col("paths").desc, col("id")).limit(20)
      },
      Some(withSql(Oracle.UEDGES,
        """, qv AS (SELECT min(src) AS v FROM uedges),
          |hop1 AS (
          |  SELECT mid FROM (SELECT DISTINCT u.dst AS mid FROM uedges u, qv WHERE u.src = qv.v)
          |  ORDER BY md5('q2|' || mid), mid LIMIT 10)
          |SELECT u.dst AS id, count(*) AS paths
          |FROM hop1 h JOIN uedges u ON u.src = h.mid, qv
          |WHERE u.dst <> qv.v
          |GROUP BY u.dst
          |ORDER BY paths DESC, id LIMIT 20""".stripMargin))),
  )
}
