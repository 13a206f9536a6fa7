package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] exercises one operator family of SURVEY.md §2
  * against the derived graph/tables of [[Tables]]; [[oracleSql]] holds the
  * DuckDB-equivalent SQL over the same parquet inputs ([[Oracle]]
  * fragments). Column names and value types are aligned on both sides —
  * the driver's compare sorts columns by name and hashes values.
  */
object SparkEntry {
  import Oracle.withSql

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * Q1/Q7 friends-of-friends + top-20 (reference Queries.scala:49-54). */
  def entry(spark: SparkSession): DataFrame =
    Queries.friendsOfFriendsExclTop20(Tables.socialEdges(spark, "/root/testdata/sf0.001"))

  private type Q = (SparkSession, String) => DataFrame


  /** Registry: name -> (spark query, optional DuckDB oracle). */
  private val coreEntries: Seq[(String, Q, Option[String])] = Seq(

    // ---- N1/N2: single-vertex neighborhood (SURVEY §2.3) ----
    ("n1_query_out",
      (s: SparkSession, d: String) => {
        val db = GraphDB.orderGraph(s, d)
        db.edges.join(broadcast(Queries.minSrc(db.edges)), col("src") === col("qv"))
          .select("src", "dst", "etype", "ets", "weight", "rating")
      },
      Some(withSql(Oracle.EDGES,
        """SELECT src, dst, etype, ets, weight, rating FROM edges
          |WHERE src = (SELECT min(src) FROM edges)""".stripMargin))),

    ("n2_query_in",
      (s: SparkSession, d: String) => {
        val db = GraphDB.orderGraph(s, d)
        val v = db.edges.agg(min("dst").as("qv"))
        db.edges.join(broadcast(v), col("dst") === col("qv"))
          .select("src", "dst", "etype", "ets", "weight", "rating")
      },
      Some(withSql(Oracle.EDGES,
        """SELECT src, dst, etype, ets, weight, rating FROM edges
          |WHERE dst = (SELECT min(dst) FROM edges)""".stripMargin))),

    // ---- N3: batched out-neighbors = semi-join (SURVEY §2.3) ----
    ("n3_query_out_multiple",
      (s: SparkSession, d: String) => {
        val db = GraphDB.orderGraph(s, d)
        val ids = db.edges.select("src").distinct().orderBy("src").limit(10)
        db.queryOutMultiple(ids).select("src", "dst", "etype", "ets", "weight", "rating")
      },
      Some(withSql(Oracle.EDGES,
        """SELECT src, dst, etype, ets, weight, rating FROM edges
          |WHERE src IN (SELECT DISTINCT src FROM edges ORDER BY src LIMIT 10)""".stripMargin))),

    // ---- N4/Q10: neighbors joined with vertex + edge columns ----
    ("n4_join_vertex_column",
      (s: SparkSession, d: String) => {
        val db = GraphDB.orderGraph(s, d)
        val out = db.edges.join(broadcast(Queries.minSrc(db.edges)), col("src") === col("qv"))
          .select(col("dst"), col("ets"))
        db.joinVertex(out, "dst", Seq("name", "vtype")).select("dst", "ets", "name", "vtype")
      },
      Some(withSql(Oracle.EDGES + ",\n" + Oracle.VERTICES,
        """SELECT e.dst, e.ets, v.name, v.vtype
          |FROM edges e JOIN vertices v ON e.dst = v.id
          |WHERE e.src = (SELECT min(src) FROM edges)""".stripMargin))),

    // ---- N6: degrees (SURVEY §2.3) ----
    ("n6_degrees",
      (s: SparkSession, d: String) => GraphDB.orderGraph(s, d).degrees,
      Some(withSql(Oracle.EDGES,
        """, outd AS (SELECT src AS id, count(*) AS c FROM edges GROUP BY src),
          |ind AS (SELECT dst AS id, count(*) AS c FROM edges GROUP BY dst)
          |SELECT COALESCE(o.id, i.id) AS id, COALESCE(i.c, 0) AS indeg,
          |       COALESCE(o.c, 0) AS outdeg,
          |       COALESCE(i.c, 0) + COALESCE(o.c, 0) AS degree
          |FROM outd o FULL OUTER JOIN ind i ON o.id = i.id""".stripMargin))),

    // ---- N8: cardinalities ----
    ("n8_counts",
      (s: SparkSession, d: String) => {
        val db = GraphDB.orderGraph(s, d)
        db.numVertices.crossJoin(db.numEdges)
      },
      Some(withSql(Oracle.EDGES,
        """SELECT (SELECT count(*) FROM (SELECT src FROM edges UNION SELECT dst FROM edges)) AS num_vertices,
          |       (SELECT count(*) FROM edges) AS num_edges""".stripMargin))),

    // ---- Q1/Q7: FoF + top-20 (flagship) ----
    ("q1_fof_excl_top20",
      (s: SparkSession, d: String) =>
        Queries.friendsOfFriendsExclTop20(Tables.socialEdges(s, d)),
      Some(withSql(Oracle.UEDGES,
        """, qv AS (SELECT min(src) AS v FROM uedges),
          |hop1 AS (SELECT DISTINCT u.dst AS mid FROM uedges u, qv WHERE u.src = qv.v)
          |SELECT u.dst AS id, count(*) AS paths
          |FROM hop1 h JOIN uedges u ON u.src = h.mid, qv
          |WHERE u.dst <> qv.v
          |GROUP BY u.dst
          |ORDER BY paths DESC, id LIMIT 20""".stripMargin))),

    // ---- Q1 served from the materialized sorted store: the flagship
    //      query against the substrate a 100 TB deployment reads — no
    //      lineitem⋈orders derivation in the plan, point hop-1 prunes
    //      row groups. Same oracle as q1 (same rows by construction). ----
    ("q1b_fof_excl_top20_store",
      (s: SparkSession, d: String) => {
        // one-pass symmetrization (r14): the union form scanned the
        // store twice per plan — Tables.symmetrize rationale
        val sym = Tables.symmetrize(Tables.orderEdgesStored(s, d),
          Seq("src", "dst", "etype", "ets", "weight", "rating"))
        Queries.friendsOfFriendsExclTop20(sym)
      },
      Some(withSql(Oracle.UEDGES,
        """, qv AS (SELECT min(src) AS v FROM uedges),
          |hop1 AS (SELECT DISTINCT u.dst AS mid FROM uedges u, qv WHERE u.src = qv.v)
          |SELECT u.dst AS id, count(*) AS paths
          |FROM hop1 h JOIN uedges u ON u.src = h.mid, qv
          |WHERE u.dst <> qv.v
          |GROUP BY u.dst
          |ORDER BY paths DESC, id LIMIT 20""".stripMargin))),

    // ---- Q1 SERVED: the same flagship FoF as an ONLINE lookup against
    //      the DURABLE store — the out hop routed by manifest src stats
    //      into src-sorted files, the REVERSED hop routed into the
    //      dst-bucketed in-edge MIRROR (the reference's per-shard in-edge
    //      index, QueryShard.java:662-812), so both directions prune by
    //      sort order on real graphs (VERDICT r9 #1; the prior sym-scan
    //      form leaned on dst footer stats of src-sorted files, which
    //      only copy-local fixtures make tight). v0 is answered from
    //      manifest stats (driver arithmetic, no job). Same oracle as
    //      q1/q1b: identical rows by construction. ----
    ("q1s_fof_served_store",
      (s: SparkSession, d: String) => {
        val st = registry.DurableQueries.baseStore(s, d)
        val vm = registry.DurableQueries.mirrorVersion(s, d)
        st.servedFof(vm, st.minEndpoint(vm).get)
      },
      Some(withSql(Oracle.UEDGES,
        """, qv AS (SELECT min(src) AS v FROM uedges),
          |hop1 AS (SELECT DISTINCT u.dst AS mid FROM uedges u, qv WHERE u.src = qv.v)
          |SELECT u.dst AS id, count(*) AS paths
          |FROM hop1 h JOIN uedges u ON u.src = h.mid, qv
          |WHERE u.dst <> qv.v
          |GROUP BY u.dst
          |ORDER BY paths DESC, id LIMIT 20""".stripMargin))),

    // ---- Q1 SERVED off an ADOPTED store ([[DurableStore.adopt]]): the
    //      same online FoF, but the store was built by INDEXING existing
    //      sorted parquet IN PLACE — a metadata-only manifest over the
    //      file footers, zero rows moved or rewritten (the 100 TB
    //      data-lake onboarding path: index, don't rewrite). Exercises
    //      serving reads whose footers/pages were written by a foreign
    //      job, not by the store's own writer. Same oracle as q1/q1b/q1s:
    //      identical rows by construction. ----
    ("q1a_fof_served_adopted",
      (s: SparkSession, d: String) => {
        val st = registry.DurableQueries.adoptedStore(s, d)
        st.servedFof(1, st.minEndpoint(1).get)
      },
      Some(withSql(Oracle.UEDGES,
        """, qv AS (SELECT min(src) AS v FROM uedges),
          |hop1 AS (SELECT DISTINCT u.dst AS mid FROM uedges u, qv WHERE u.src = qv.v)
          |SELECT u.dst AS id, count(*) AS paths
          |FROM hop1 h JOIN uedges u ON u.src = h.mid, qv
          |WHERE u.dst <> qv.v
          |GROUP BY u.dst
          |ORDER BY paths DESC, id LIMIT 20""".stripMargin))),

    // ---- Q3: plain 2-hop reachable set ----
    ("q3_fof",
      (s: SparkSession, d: String) => Queries.friendsOfFriends(Tables.socialEdges(s, d)),
      Some(withSql(Oracle.UEDGES,
        """, qv AS (SELECT min(src) AS v FROM uedges),
          |hop1 AS (SELECT DISTINCT u.dst AS mid FROM uedges u, qv WHERE u.src = qv.v)
          |SELECT DISTINCT u.dst AS id FROM hop1 h JOIN uedges u ON u.src = h.mid""".stripMargin))),

    // ---- Q4: induced subgraph on the typed hierarchy graph ----
    ("q4_induced_subgraph",
      (s: SparkSession, d: String) => {
        val e = Tables.nationEdges(s, d)
        Queries.inducedSubgraph(e, e.select("src").union(e.select("dst"))
          .filter(col("src") >= Tables.SupplierBase).distinct())
      },
      Some(withSql(Oracle.NEDGES,
        """, vs AS (SELECT src AS id FROM nedges WHERE src >= 1000000
          |          UNION SELECT dst FROM nedges WHERE dst >= 1000000)
          |SELECT e.src, e.dst, e.etype FROM nedges e
          |WHERE e.src IN (SELECT id FROM vs) AND e.dst IN (SELECT id FROM vs)""".stripMargin))),

    // ---- Q5: shortest-path distance (driver-loop BFS w/ early exit) ----
    ("q5_shortest_path",
      (s: SparkSession, d: String) => {
        val sym = Tables.nationEdgesSym(s, d)
        val cust = Tables.customer(s, d)
        val from = cust.agg(min("c_custkey").as("id"))
        val to = cust.join(from, cust("c_custkey") === from("id"))
          .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
          .select((col("n_regionkey") + Tables.RegionBase).cast("long").as("tid"))
        Traversals.shortestPathDist(sym, from, to, maxDepth = 4)
      },
      Some(withSql(Oracle.NEDGES_SYM,
        """, f AS (SELECT min(c_custkey) AS s FROM customer),
          |t AS (SELECT n_regionkey + 3000000 AS tid FROM customer JOIN nation ON c_nationkey = n_nationkey
          |      WHERE c_custkey = (SELECT s FROM f)),
          |walk(id, dist) AS (
          |  SELECT s, 0 FROM f
          |  UNION
          |  SELECT n.dst, w.dist + 1 FROM walk w JOIN nsym n ON w.id = n.src WHERE w.dist < 4)
          |SELECT CAST(min(dist) AS BIGINT) AS dist FROM walk WHERE id IN (SELECT tid FROM t)""".stripMargin))),

    // ---- Q5 reference-shaped: bidirectional BFS, same distance ----
    ("q5_shortest_path_bidi",
      (s: SparkSession, d: String) => {
        val sym = Tables.nationEdgesSym(s, d)
        val cust = Tables.customer(s, d)
        val from = cust.agg(min("c_custkey").as("id"))
        val to = cust.join(from, cust("c_custkey") === from("id"))
          .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
          .select((col("n_regionkey") + Tables.RegionBase).cast("long").as("tid"))
        Traversals.bidirectionalDist(sym, from, to.toDF("id"), maxDepth = 4)._1
      },
      Some(withSql(Oracle.NEDGES_SYM,
        """, f AS (SELECT min(c_custkey) AS s FROM customer),
          |t AS (SELECT n_regionkey + 3000000 AS tid FROM customer JOIN nation ON c_nationkey = n_nationkey
          |      WHERE c_custkey = (SELECT s FROM f)),
          |walk(id, dist) AS (
          |  SELECT s, 0 FROM f
          |  UNION
          |  SELECT n.dst, w.dist + 1 FROM walk w JOIN nsym n ON w.id = n.src WHERE w.dist < 4)
          |SELECT CAST(min(dist) AS BIGINT) AS dist FROM walk WHERE id IN (SELECT tid FROM t)""".stripMargin))),

    // ---- Q5 full output: the path itself via the min-parent tree ----
    ("q5_shortest_path_nodes",
      (s: SparkSession, d: String) => {
        val sym = Tables.nationEdgesSym(s, d)
        val cust = Tables.customer(s, d)
        val from = cust.agg(min("c_custkey").as("id"))
        val to = cust.join(from, cust("c_custkey") === from("id"))
          .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
          .select((col("n_regionkey") + Tables.RegionBase).cast("long").as("tid"))
        Traversals.shortestPathNodes(sym, from, to, maxDepth = 4)
      },
      Some(withSql(Oracle.NEDGES_SYM,
        """, f AS (SELECT min(c_custkey) AS s FROM customer),
          |t AS (SELECT n_regionkey + 3000000 AS tid FROM customer JOIN nation ON c_nationkey = n_nationkey
          |      WHERE c_custkey = (SELECT s FROM f)),
          |walk(id, dist) AS (
          |  SELECT s, 0 FROM f
          |  UNION
          |  SELECT n.dst, w.dist + 1 FROM walk w JOIN nsym n ON w.id = n.src WHERE w.dist < 4),
          |dd AS (SELECT id, CAST(min(dist) AS BIGINT) AS dist FROM walk GROUP BY id),
          |par AS (
          |  SELECT n.dst AS id, min(n.src) AS parent
          |  FROM nsym n JOIN dd p ON n.src = p.id JOIN dd c ON n.dst = c.id
          |  WHERE c.dist = p.dist + 1
          |  GROUP BY n.dst),
          |tree AS (SELECT dd.id, dd.dist, COALESCE(par.parent, dd.id) AS parent
          |         FROM dd LEFT JOIN par ON dd.id = par.id),
          |wpath(id, dist, parent) AS (
          |  SELECT tree.id, tree.dist, tree.parent FROM tree, t WHERE tree.id = t.tid
          |  UNION
          |  SELECT tr.id, tr.dist, tr.parent FROM wpath w JOIN tree tr ON tr.id = w.parent
          |  WHERE w.parent <> w.id)
          |SELECT dist AS pos, id FROM wpath""".stripMargin))),

    // ---- Q6/C5: BFS distance sweep from one source ----
    ("q6_sssp_dist",
      (s: SparkSession, d: String) => {
        val sym = Tables.nationEdgesSym(s, d)
        val src = sym.filter(col("src") >= Tables.SupplierBase && col("src") < Tables.NationBase)
          .agg(min("src").as("id")).withColumn("source", col("id"))
        Traversals.bfsDistances(sym, src, maxDepth = 4).select("id", "dist")
      },
      Some(withSql(Oracle.NEDGES_SYM,
        """, f AS (SELECT min(src) AS s FROM nsym WHERE src >= 1000000 AND src < 2000000),
          |walk(id, dist) AS (
          |  SELECT s, 0 FROM f
          |  UNION
          |  SELECT n.dst, w.dist + 1 FROM walk w JOIN nsym n ON w.id = n.src WHERE w.dist < 4)
          |SELECT id, CAST(min(dist) AS BIGINT) AS dist FROM walk GROUP BY id""".stripMargin))),

    // ---- C4/Q13: connected components to fixpoint + histogram ----
    ("c4_cc_labels",
      (s: SparkSession, d: String) =>
        Traversals.connectedComponents(Tables.nationEdgesSym(s, d)),
      Some(withSql(Oracle.NEDGES_SYM,
        """, verts AS (SELECT src AS id FROM nsym UNION SELECT dst FROM nsym),
          |reach(id, r) AS (
          |  SELECT id, id FROM verts
          |  UNION
          |  SELECT w.id, n.dst FROM reach w JOIN nsym n ON w.r = n.src)
          |SELECT id, min(r) AS label FROM reach GROUP BY id""".stripMargin))),

    // ---- C4s: the OUT-OF-CORE CC variant (edges streamed from storage
    //      per superstep, only vertex labels resident — the reference's
    //      PSW discipline; runs the 1B-edge envelope's full-graph leg).
    //      Same fixpoint, same oracle as c4. ----
    ("c4s_cc_labels_scan",
      (s: SparkSession, d: String) =>
        Traversals.connectedComponentsScan(Tables.nationEdgesSym(s, d)),
      Some(withSql(Oracle.NEDGES_SYM,
        """, verts AS (SELECT src AS id FROM nsym UNION SELECT dst FROM nsym),
          |reach(id, r) AS (
          |  SELECT id, id FROM verts
          |  UNION
          |  SELECT w.id, n.dst FROM reach w JOIN nsym n ON w.r = n.src)
          |SELECT id, min(r) AS label FROM reach GROUP BY id""".stripMargin))),

    ("q13_cc_histogram",
      (s: SparkSession, d: String) =>
        Traversals.componentHistogramTop20(Tables.nationEdgesSym(s, d)),
      Some(withSql(Oracle.NEDGES_SYM,
        """, verts AS (SELECT src AS id FROM nsym UNION SELECT dst FROM nsym),
          |reach(id, r) AS (
          |  SELECT id, id FROM verts
          |  UNION
          |  SELECT w.id, n.dst FROM reach w JOIN nsym n ON w.r = n.src),
          |labels AS (SELECT id, min(r) AS label FROM reach GROUP BY id)
          |SELECT label, count(*) AS csize FROM labels GROUP BY label
          |ORDER BY csize DESC, label LIMIT 20""".stripMargin))),

    // ---- C3: PageRank, reference-exact update rule, scaled-int ----
    ("c3_pagerank_top20",
      (s: SparkSession, d: String) => PageRank.top20(Tables.orderEdges(s, d), iters = 3),
      Some(PageRank.oracleSql(3))),

    // ---- W1/§2.8: relational scan-agg surface (decimal-exact sums) ----
    ("w1_lineitem_agg",
      (s: SparkSession, d: String) =>
        Tables.lineitem(s, d).groupBy("l_returnflag", "l_linestatus").agg(
          sum(cents(col("l_quantity"))).as("sum_qty_cents"),
          sum(cents(col("l_extendedprice"))).as("sum_base_price_cents"),
          count(lit(1)).as("count_order")),
      Some(
        """SELECT l_returnflag, l_linestatus,
          |  CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_qty_cents,
          |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
          |  count(*) AS count_order
          |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)),
  )

  private def all: Seq[QueryEntry] =
    coreEntries ++ registry.PointOpsQueries.entries ++ registry.EventQueries.entries ++
      registry.TextQueries.entries ++ registry.DedupQueries.entries ++
      registry.VectorQueries.entries ++ registry.ComputeQueries.entries ++
      registry.RelationalQueries.entries ++ registry.DurableQueries.entries ++
      registry.TypedQueries.entries ++ registry.StreamingQueries.entries ++
      registry.ZipfQueries.entries ++ registry.GraphQueries.entries

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (n, q, _) => n -> q }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
