package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's named composite queries (SURVEY.md §2.5) as single
  * Catalyst plans. Point-query parameters ("vertex v") are themselves
  * one-row aggregates joined in broadcast, so each query stays a single
  * declarative plan — no driver-side collect — and the DuckDB oracle uses
  * the same scalar subquery. */
object Queries {

  /** Smallest src id — the deterministic "query vertex" used across the
    * parity suite (a stand-in for the reference examples' hand-picked ids,
    * e.g. SocialNetworkExample.scala:143). */
  def minSrc(edges: DataFrame): DataFrame = edges.agg(min("src").as("qv"))

  /** Q1/Q7 friendsOfFriendsExcl + top-20 (reference Queries.scala:49-54):
    * hop1 = distinct out-neighbors of v; hop2 = every out-edge of hop1
    * (repeats kept), excluding v itself — NOTE the reference excludes only
    * the start vertex (`!start.hasVertex(dst)`), not the direct friends,
    * despite its doc comment; we replicate the code, not the comment.
    * Count per destination = number of 2-hop paths; top-20 by (paths desc,
    * id) — ties broken by id so the cut is deterministic. */
  def friendsOfFriendsExclTop20(edges: DataFrame): DataFrame = {
    val v = minSrc(edges)
    val hop1 = edges.join(broadcast(v), col("src") === col("qv"))
      .select(col("dst").as("mid"), col("qv")).distinct()
    val e2 = edges.select(col("src").as("mid"), col("dst"))
    hop1.join(e2, "mid")
      .filter(col("dst") =!= col("qv"))
      .groupBy(col("dst").as("id")).agg(count(lit(1)).as("paths"))
      .orderBy(col("paths").desc, col("id")).limit(20)
  }

  /** Q3 friendsOfFriends: plain distinct 2-hop reachable set (reference
    * Queries.scala:72-76). */
  def friendsOfFriends(edges: DataFrame): DataFrame = {
    val v = minSrc(edges)
    val hop1 = edges.join(broadcast(v), col("src") === col("qv"))
      .select(col("dst").as("mid")).distinct()
    hop1.join(edges.select(col("src").as("mid"), col("dst")), "mid")
      .select(col("dst").as("id")).distinct()
  }

  /** Q4 inducedSubgraph (reference Queries.scala:87-103): edges with both
    * endpoints in V — two semi-joins. V is unbounded (whole-graph vertex
    * sets are legal), so no broadcast hint: AQE picks broadcast only when
    * V is actually small. */
  def inducedSubgraph(edges: DataFrame, v: DataFrame): DataFrame = {
    val ids = v.toDF("id")
    edges
      .join(ids.withColumnRenamed("id", "src"), "src", "left_semi")
      .join(ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
      .select("src", "dst", "etype")
  }

  /** Q8 inducedNeighborhoodGraph (reference SubgraphFrequencies.scala:92-99)
    * over a canonical (src<dst, dedup) undirected projection: ego's
    * neighbors, then the induced edges among them. */
  def egoNet(cpEdges: DataFrame, ego: DataFrame): DataFrame = {
    val nb = cpEdges.join(broadcast(ego), col("src") === col("qv"))
      .select(col("dst").as("id"))
      .union(cpEdges.join(broadcast(ego), col("dst") === col("qv"))
        .select(col("src").as("id")))
      .distinct()
    inducedSubgraph(cpEdges.withColumn("etype", lit(0)), nb).select("src", "dst")
  }

  /** Q9 (deterministic variant of reference SubgraphFrequencies.scala:107-148):
    * exact wedge + triangle census of a canonical undirected graph instead
    * of the reference's unseeded sampling, so the oracle can hash-match. */
  def subgraphCensus(cpEdges: DataFrame): DataFrame = {
    val e = cpEdges.select("src", "dst")
    val deg = e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    val wedges = deg.agg(expr("sum((d * (d - 1)) div 2)").as("wedges"))
    val ab = e.select(col("src").as("a"), col("dst").as("b"))
    val bc = e.select(col("src").as("b"), col("dst").as("c"))
    val ac = e.select(col("src").as("a"), col("dst").as("c"))
    val triangles = ab.join(bc, "b").join(ac, Seq("a", "c"), "left_semi")
      .agg(count(lit(1)).as("triangles"))
    wedges.crossJoin(triangles)
  }

  /** Q12 name index (reference WikipediaGraph.scala:134-157,
    * StringToIdMap.java): the string→id index is a pushed-down predicate
    * on the vertex table — Parquet dictionary + min/max pruning replace the
    * binary-searched sorted array. */
  def lookupByName(vertices: DataFrame, namePred: Column): DataFrame =
    vertices.filter(namePred).select("id", "vtype", "name")
}
