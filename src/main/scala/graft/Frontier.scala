package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ligra-style frontier algebra (reference VertexFrontier.scala:34-201,
  * FrontierQueries.scala) re-expressed as a single DataFrame of vertex ids.
  *
  * The reference's sparse(hash-set)/dense(bitset) dual representation and
  * its 100k switching threshold (FrontierQueries.scala:45-65,
  * VertexFrontier.scala:203-217) collapse into one representation here:
  * Catalyst + AQE pick broadcast (≈sparse top-down) vs shuffle (≈dense
  * bottom-up) per hop, which is exactly the decision the thresholds
  * hand-code.
  */
class Frontier(val db: GraphDB, val ids: DataFrame) {
  private def of(d: DataFrame) = new Frontier(db, d)
  private def typeFilter(etype: Option[Int]): Column =
    etype.map(t => col("etype") === lit(t)).getOrElse(lit(true))

  /** One out-hop, deduplicated (F2, reference FrontierQueries.scala:82-99). */
  def traverseOut(etype: Option[Int] = None): Frontier =
    of(db.edges.filter(typeFilter(etype))
      .join(ids.withColumnRenamed("id", "src"), "src", "left_semi")
      .select(col("dst").as("id")).distinct())

  /** F3: one out-hop with a per-edge admission predicate (reference
    * traverseOut(etype, fn), FrontierQueries.scala:105-142) — the
    * host-language lambda becomes a Column predicate Catalyst can push. */
  def traverseOutWhere(condition: Column, etype: Option[Int] = None): Frontier =
    of(selectOut(etype, condition).select(col("dst").as("id")).distinct())

  /** One out-hop keeping per-edge rows, filtered by a destination predicate
    * (F6 selectOut, reference FrontierQueries.scala:255-278): repeats are
    * preserved so downstream group-bys count paths. */
  def selectOut(etype: Option[Int] = None, condition: Column = lit(true)): DataFrame =
    db.edges.filter(typeFilter(etype))
      .join(ids.withColumnRenamed("id", "src"), "src", "left_semi")
      .filter(condition)

  /** selectOut + count per destination (F7 groupByCount, reference
    * FrontierQueries.scala:280-302). */
  def groupByCountOut(etype: Option[Int] = None, condition: Column = lit(true)): DataFrame =
    selectOut(etype, condition).groupBy(col("dst").as("id")).agg(count(lit(1)).as("cnt"))

  /** F4: generic early-termination expansion (reference traverseOutUntil,
    * FrontierQueries.scala:191-244): repeat [[traverseOut]] until the
    * user predicate holds on the current frontier, the frontier empties,
    * or maxDepth hops are walked — the reusable form of the reference's
    * FinishQueryException early exit. Returns the frontier at exit. */
  def traverseOutUntil(maxDepth: Int, etype: Option[Int] = None)
                      (until: Frontier => Boolean): Frontier =
    of(Traversals.expandUntil(db.edges.filter(typeFilter(etype)), ids, maxDepth)(
      f => until(of(f))).frontier)

  /** F8: deterministic truncation; randomize uses a SEEDED shuffle (the
    * reference's unseeded Random, VertexFrontier.scala:53-68, is made
    * reproducible for the oracle). */
  def limit(n: Int, randomize: Boolean = false, seed: Long = 42L): Frontier =
    of(if (randomize) ids.orderBy(rand(seed), col("id")).limit(n).select("id")
       else ids.orderBy(col("id")).limit(n))

  // F9 set algebra (reference VertexFrontier.scala:34-201)
  def union(o: Frontier): Frontier = of(ids.union(o.ids).distinct())
  def remove(o: Frontier): Frontier = of(ids.except(o.ids))
  def intersect(o: Frontier): Frontier = of(ids.intersect(o.ids))
  def hasVertex(v: Long): Boolean = !ids.filter(col("id") === v).isEmpty
  def hasAnyVertex(o: Frontier): Boolean = !ids.intersect(o.ids).isEmpty
  def isEmpty: Boolean = ids.isEmpty
  def size: Long = ids.count()
}
