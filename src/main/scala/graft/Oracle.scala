package graft

/** ANSI-SQL (DuckDB-compatible) definitions of the derived graph tables in
  * [[Tables]]. Every `SparkEntry.oracleSql` entry composes these WITH
  * fragments so the oracle derives the identical graph from the same
  * parquet inputs (FIXTURES.md §3).
  *
  * Determinism rules shared with the Spark side:
  *  - double→int via explicit floor (Spark casts truncate, DuckDB rounds);
  *  - money sums as DECIMAL (exact, order-independent);
  *  - top-k always ordered by (measure, id) so ties cannot reorder;
  *  - iterative algorithms in scaled integer arithmetic (see [[PageRank]]).
  */
object Oracle {
  /** Directed order graph — mirrors [[Tables.orderEdges]]. */
  val EDGES: String =
    """edges AS (
      |  SELECT o_custkey AS src, l_suppkey + 1000000 AS dst, 0 AS etype,
      |         epoch_ms(o_orderdate) AS ets, l_extendedprice AS weight,
      |         CAST(floor(l_quantity) AS INT) % 5 + 1 AS rating
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)""".stripMargin

  /** Symmetrized order graph — mirrors [[Tables.socialEdges]]. */
  val UEDGES: String =
    EDGES + """,
      |uedges AS (
      |  SELECT src, dst, etype, ets, weight, rating FROM edges
      |  UNION ALL
      |  SELECT dst AS src, src AS dst, etype, ets, weight, rating FROM edges)""".stripMargin

  /** Multi-etype order graph — mirrors [[Tables.orderEdgesTyped]]. */
  val TEDGES: String =
    """tedges AS (
      |  SELECT o_custkey AS src, l_suppkey + 1000000 AS dst,
      |         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS etype,
      |         epoch_ms(o_orderdate) AS ets, l_extendedprice AS weight,
      |         CAST(floor(l_quantity) AS INT) % 5 + 1 AS rating
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)""".stripMargin

  /** Symmetrized multi-etype graph — mirrors [[Tables.orderEdgesTypedSym]]. */
  val TEDGES_SYM: String =
    TEDGES + """,
      |tsym AS (
      |  SELECT src, dst, etype, ets, weight, rating FROM tedges
      |  UNION ALL
      |  SELECT dst AS src, src AS dst, etype, ets, weight, rating FROM tedges)""".stripMargin

  /** Typed hierarchy graph — mirrors [[Tables.nationEdges]]. */
  val NEDGES: String =
    """nedges AS (
      |  SELECT s_suppkey + 1000000 AS src, s_nationkey + 2000000 AS dst, 0 AS etype FROM supplier
      |  UNION ALL
      |  SELECT c_custkey AS src, c_nationkey + 2000000 AS dst, 0 AS etype FROM customer
      |  UNION ALL
      |  SELECT n_nationkey + 2000000 AS src, n_regionkey + 3000000 AS dst, 1 AS etype FROM nation)""".stripMargin

  /** Undirected hierarchy graph — mirrors [[Tables.nationEdgesSym]]. */
  val NEDGES_SYM: String =
    NEDGES + """,
      |nsym AS (
      |  SELECT src, dst, etype FROM nedges
      |  UNION ALL
      |  SELECT dst AS src, src AS dst, etype FROM nedges)""".stripMargin

  /** Vertex property table — mirrors [[Tables.vertices]]. */
  val VERTICES: String =
    """vertices AS (
      |  SELECT c_custkey AS id, 'customer' AS vtype, c_name AS name, c_acctbal AS acctbal FROM customer
      |  UNION ALL
      |  SELECT s_suppkey + 1000000 AS id, 'supplier' AS vtype, s_name AS name, s_acctbal AS acctbal FROM supplier)""".stripMargin

  /** Supplier co-purchase projection — mirrors [[Tables.coPurchaseEdges]]. */
  val CP_EDGES: String =
    EDGES + """,
      |cpe AS (SELECT src, dst FROM edges WHERE dst % 10 = 0),
      |cp AS (
      |  SELECT DISTINCT a.dst AS src, b.dst AS dst
      |  FROM cpe a JOIN cpe b ON a.src = b.src AND a.dst < b.dst)""".stripMargin

  def withSql(fragments: String, body: String): String =
    s"WITH RECURSIVE\n$fragments\n$body"
}
