package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative frontier traversals (SURVEY.md §2.5 Q5/Q6, §2.7 C4/C5): a
  * driver-side superstep loop where each step is one distributed
  * join+aggregate — the Spark shape of the reference's Ligra-style
  * traverseOut/traverseOutUntil (FrontierQueries.scala:82-244) and of
  * GraphChi's selective-scheduling iteration (GraphChiDatabase.scala:
  * 2124-2255). `localCheckpoint` truncates lineage per superstep, playing
  * the role of the reference's materialized per-iteration vertex state. */
object Traversals {

  /** BFS distances from every seed in `sources(source, id)` — the MultiBFS
    * pattern (reference MultiBFS.scala:100-157) with the per-vertex counter
    * vector replaced by (source, vertex) rows; single-source BFS (Q6,
    * reference Queries.scala:198-243) is the one-seed case. */
  def bfsDistances(edges: DataFrame, sources: DataFrame, maxDepth: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    var visited = sources.select(col("source"), col("id"), lit(0L).as("dist"))
      .localCheckpoint(true)
    var frontier = visited
    var depth = 0
    while (depth < maxDepth && !frontier.isEmpty) {
      depth += 1
      val next = frontier.join(e, frontier("id") === e("src"))
        .select(col("source"), col("dst").as("id"), lit(depth.toLong).as("dist"))
        .distinct()
        .join(visited.select(col("source").as("vsource"), col("id").as("vid")),
          col("id") === col("vid") && col("source") === col("vsource"), "left_anti")
        .localCheckpoint(true)
      visited = visited.union(next).localCheckpoint(true)
      frontier = next
    }
    visited
  }

  /** Q5 shortestPath(a,b) distance (reference Queries.scala:107-194): the
    * reference runs a bidirectional BFS with early meet; per SURVEY §7.3 we
    * verify the *distance*, computed by a forward BFS with early exit as
    * soon as the target is reached (the driver-loop form of
    * FinishQueryException, reference FrontierQueries.scala:191-244). */
  def shortestPathDist(edges: DataFrame, from: DataFrame, to: DataFrame, maxDepth: Int): DataFrame = {
    val src = from.toDF("id").withColumn("source", col("id"))
    val dists = bfsDistancesEarlyStop(edges, src, to.toDF("tid"), maxDepth)
    dists.join(to.toDF("tid"), dists("id") === col("tid"), "left_semi")
      .agg(min("dist").as("dist"))
  }

  private def bfsDistancesEarlyStop(edges: DataFrame, sources: DataFrame,
                                    target: DataFrame, maxDepth: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    var visited = sources.select(col("source"), col("id"), lit(0L).as("dist"))
      .localCheckpoint(true)
    var frontier = visited
    var depth = 0
    var found = !visited.join(target, col("id") === col("tid"), "left_semi").isEmpty
    while (depth < maxDepth && !found && !frontier.isEmpty) {
      depth += 1
      val next = frontier.join(e, frontier("id") === e("src"))
        .select(col("source"), col("dst").as("id"), lit(depth.toLong).as("dist"))
        .distinct()
        .join(visited.select(col("source").as("vsource"), col("id").as("vid")),
          col("id") === col("vid") && col("source") === col("vsource"), "left_anti")
        .localCheckpoint(true)
      visited = visited.union(next).localCheckpoint(true)
      frontier = next
      found = !next.join(target, col("id") === col("tid"), "left_semi").isEmpty
    }
    visited
  }

  /** Q6: single-source shortest-path tree (reference Queries.scala:198-243
    * writes a parent pointer per reached vertex): BFS distances + parent =
    * MIN predecessor id at dist-1 (the reference's parent is
    * arrival-order-dependent; min makes the tree deterministic, SURVEY
    * §7.3). The source is its own parent. */
  def ssspTree(edges: DataFrame, source: DataFrame, maxDepth: Int): DataFrame = {
    val dists = bfsDistances(edges, source.toDF("id").withColumn("source", col("id")),
      maxDepth).select("id", "dist").localCheckpoint(true)
    val e = edges.select("src", "dst")
    val par = e
      .join(dists.select(col("id").as("src"), col("dist").as("pdist")), "src")
      .join(dists.select(col("id").as("dst"), col("dist").as("cdist")), "dst")
      .filter(col("cdist") === col("pdist") + 1)
      .groupBy(col("dst").as("id")).agg(min("src").as("parent"))
    dists.join(par, Seq("id"), "left_outer")
      .select(col("id"), col("dist"), coalesce(col("parent"), col("id")).as("parent"))
  }

  /** Q5/Q6 path reconstruction (reference ShortestPathTree.pathTo,
    * Queries.scala:198-243 walks parent pointers): collect the (small)
    * parent map of the BFS tree and walk target → source. Returns the
    * path source-first, or empty if unreachable. */
  def pathTo(tree: DataFrame, source: Long, target: Long): Seq[Long] = {
    val parents = tree.select("id", "parent").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    if (!parents.contains(target)) return Seq.empty
    val path = scala.collection.mutable.ListBuffer(target)
    var cur = target
    while (cur != source && parents.contains(cur) && parents(cur) != cur) {
      cur = parents(cur)
      path.prepend(cur)
    }
    if (cur == source) path.toSeq else Seq.empty
  }

  /** C4 connected components by min-label propagation to fixpoint
    * (reference ConnectedComponentsLabelProp.scala:38-85): label(v) starts
    * as v and contracts to min(label) over the neighborhood.
    * PRECONDITION: labels propagate along edge direction only — pass a
    * SYMMETRIZED edge list (e.g. [[Tables.nationEdgesSym]]) for undirected
    * components, same as [[VertexCentric.pregelCC]].
    * Pregel's active-set is replaced by a convergence count per superstep;
    * the fixpoint (not the per-iteration trace) is what parity checks,
    * per SURVEY §7.3. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val e = edges.select("src", "dst").localCheckpoint(true)
    var labels = e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
      .distinct().withColumn("label", col("id")).localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      iter += 1
      val nbMin = e.join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id")).agg(min("label").as("nblabel"))
      val next = labels.join(nbMin, Seq("id"), "left_outer")
        .select(col("id"), least(col("label"), coalesce(col("nblabel"), col("label"))).as("label"))
        .localCheckpoint(true)
      changed = next.join(labels.withColumnRenamed("label", "old"), "id")
        .filter(col("label") =!= col("old")).count()
      labels = next
    }
    labels
  }

  /** Q13 component histogram (reference
    * ConnectedComponentsLabelProp.scala:66-84): top-20 components by size. */
  def componentHistogramTop20(edges: DataFrame): DataFrame =
    connectedComponents(edges)
      .groupBy("label").agg(count(lit(1)).as("csize"))
      .orderBy(col("csize").desc, col("label")).limit(20)
}
