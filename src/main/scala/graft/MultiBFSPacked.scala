package graft

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** C5 MultiBFS in the reference's packed representation (reference
  * MultiBFS.scala:100-157 keeps a bounded counter VECTOR per vertex,
  * CompactBoundedCounterVector.java:37-182, and merges neighbor vectors
  * pointwise): per-vertex state is an Array[Int] of distances for K
  * seeds (-1 = unreached), and the superstep merge is a pointwise-min
  * typed [[Aggregator]] — the SURVEY §7.3 "custom Aggregator" case, a
  * non-algebraic fold over a packed custom type.
  *
  * The row-per-(source,vertex) variant ([[Traversals.bfsDistances]]) is
  * the shuffle-friendly form used for oracle parity; this one trades
  * shuffle rows for per-vertex state width, like the reference (memory ≈
  * V·K·w bits, MultiBFS.scala:51-61).
  */
object MultiBFSPacked {

  case class VState(id: Long, dist: Array[Int])

  /** Pointwise-min merge of distance vectors (-1 = unreached). */
  class MinVec(k: Int) extends Aggregator[VState, Array[Int], Array[Int]] {
    def zero: Array[Int] = Array.fill(k)(-1)
    private def mergeInto(b: Array[Int], v: Array[Int]): Array[Int] = {
      var i = 0
      while (i < b.length) {
        if (v(i) >= 0 && (b(i) < 0 || v(i) < b(i))) b(i) = v(i)
        i += 1
      }
      b
    }
    def reduce(b: Array[Int], a: VState): Array[Int] = mergeInto(b, a.dist)
    def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = mergeInto(b1, b2)
    def finish(r: Array[Int]): Array[Int] = r
    def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
    def outputEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
  }

  /** K simultaneous BFS from `sources` (ordered seed list). Returns
    * (source, id, dist) rows equal to [[Traversals.bfsDistances]]. */
  def run(spark: SparkSession, edges: DataFrame, sources: Seq[Long], maxDepth: Int): DataFrame = {
    import spark.implicits._
    val k = sources.length
    var state: Dataset[VState] = spark.createDataset(
      sources.zipWithIndex.map { case (s, i) =>
        VState(s, Array.tabulate(k)(j => if (j == i) 0 else -1))
      })
    val agg = new MinVec(k)

    for (depth <- 1 to maxDepth) {
      val d = depth
      // scatter from the FRONTIER only (some lane settled at d-1):
      // settled vertices would emit useless all-(-1) proposals per edge
      // per remaining superstep
      val frontier = state.filter(_.dist.contains(d - 1))
      val proposals = frontier.joinWith(
          edges.select(col("src").cast("long").as("s"), col("dst").cast("long").as("t")),
          col("id") === col("s"))
        .map { case (vs, row) =>
          VState(row.getLong(1), vs.dist.map(x => if (x == d - 1) d else -1))
        }
      // gather: pointwise-min merge of proposals into the state
      state = state.union(proposals)
        .groupByKey(_.id)
        .agg(agg.toColumn.name("dist"))
        .map { case (id, dist) => VState(id, dist) }
        .localCheckpoint(true)
    }
    state.flatMap(vs => vs.dist.zipWithIndex.collect {
      case (dist, i) if dist >= 0 => (sources(i), vs.id, dist.toLong)
    }).toDF("source", "id", "dist")
  }
}
