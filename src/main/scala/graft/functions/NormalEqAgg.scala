package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** The fixed side's factors packed for the c6b sweep: `ids` sorted
  * ascending, `flat(i*d + j)` = factor j of `ids(i)`. One flat primitive
  * array instead of 10^5 boxed rows — ships as ONE broadcast value and
  * reads with zero per-row allocation inside [[NormalEqAgg.update]]. */
final class PackedFactors(val ids: Array[Int], val flat: Array[Double],
                          val d: Int) extends Serializable {
  /** Index of `id` in [[ids]] (binary search — ~17 probes against a
    * 600 KB L2-resident array at 1.5·10^5 vertices), or -1. */
  def slot(id: Int): Int = java.util.Arrays.binarySearch(ids, id)
}

object PackedFactors {
  /** Collect a (id int, f array<double>) factor frame into packed form.
    * Same driver-memory bound as broadcasting the frame itself (the
    * bytes are identical; ~10^8 vertices against the 8 GB cap — the
    * documented [[graft.ALSSweep]] degradation point). */
  def collect(given: DataFrame, d: Int): PackedFactors = {
    val rows = given.select("id", "f").collect()
      .sortBy(_.getInt(0))
    val n = rows.length
    val ids = new Array[Int](n)
    val flat = new Array[Double](n * d)
    var i = 0
    while (i < n) {
      ids(i) = rows(i).getInt(0)
      val f = rows(i).getSeq[Double](1)
      var j = 0
      while (j < d) { flat(i * d + j) = f(j); j += 1 }
      i += 1
    }
    new PackedFactors(ids, flat, d)
  }
}

/** C6b's per-vertex normal-equation accumulator as a native
  * [[TypedImperativeAggregate]] over ONE primitive double buffer:
  * `[XtX upper triangle (d·(d+1)/2) | Xty (d) | deg (1)]`, with the
  * fixed side's factors FUSED INTO the aggregate as a broadcast
  * [[PackedFactors]] lookup.
  *
  * Replaces the `Aggregator`-backed UDAF over a broadcast-JOINED factor
  * column (VERDICT r8 #1): that shape deserialized a 10-double array
  * into a boxed tuple per rating row (~36M row-decodes per sf1 fit) and
  * dragged the 90-byte factor array through the join output and the
  * aggregate's sort-based fallback — 180 MB of sort buffer per task,
  * which under bench-session memory pressure turned 1.4 s sweeps into
  * 15-18 s ones. Here the aggregate consumes the bare
  * (solve-id, given-id, rating) rating row (24 bytes), looks the factor
  * up in the packed broadcast array, and accumulates into the primitive
  * buffer — no join operator, no encoder, no boxing, and the only
  * corpus-sized operator in the half-sweep is this aggregation over the
  * pre-partitioned ratings (zero exchanges, pinned in PlanShapeSpec).
  *
  * Semantics are the reference's per-edge XtX/Xty accumulation and
  * λ·deg-regularized Cholesky solve, exactly as before
  * (reference ALSMatrixFactorization.scala:148-190): `update` = the
  * per-edge loop, `merge` = element-wise add (map-side combine),
  * `eval` = expand triangle + λ·deg·I + [[graft.ALSSweep.choleskySolve]].
  * A given-id absent from the packed factors contributes nothing — the
  * same row-drop the former inner broadcast join performed.
  */
case class NormalEqAgg(
    givenId: Expression,
    rating: Expression,
    factors: Broadcast[PackedFactors],
    d: Int,
    lambda: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  private val tri = d * (d + 1) / 2 // XtX upper triangle, row-major i ≤ j
  private val len = tri + d + 1     // + Xty + deg

  override def createAggregationBuffer(): Array[Double] = new Array[Double](len)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val gv = givenId.eval(input)
    val rv = rating.eval(input)
    if (gv != null && rv != null) {
      val pf = factors.value
      val s = pf.slot(gv.asInstanceOf[Int])
      if (s >= 0) {
        val y = pf.flat
        val base = s * d
        val r = rv.asInstanceOf[Double]
        var p = 0
        var i = 0
        while (i < d) {
          val yi = y(base + i)
          buf(tri + i) += yi * r
          var j = i
          while (j < d) { buf(p) += yi * y(base + j); p += 1; j += 1 }
          i += 1
        }
        buf(tri + d) += 1.0
      }
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < len) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any = {
    val deg = buf(tri + d)
    // a group whose rated counterparts were ALL absent from the broadcast
    // accumulated nothing: the zero normal equations would Cholesky to
    // 0/0 = NaN factors that poison every later sweep. The broadcast-join
    // form this aggregate replaced DROPPED such groups — return null (the
    // SQL equivalent) to keep that contract. Unreachable from fit() today
    // (both sides initialize from the same ratings frame); load-bearing
    // for the documented at-scale degradation path that feeds factors
    // from a relational join (r9 review finding).
    if (deg == 0.0) return null
    val a = new Array[Double](d * d)
    var p = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        a(i * d + j) = buf(p)
        a(j * d + i) = buf(p)
        p += 1; j += 1
      }
      a(i * d + i) += lambda * deg
      i += 1
    }
    val b = java.util.Arrays.copyOfRange(buf, tri, tri + d)
    new GenericArrayData(graft.ALSSweep.choleskySolve(a, b))
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(len * 8)
    bb.asDoubleBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](len)
    ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): NormalEqAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): NormalEqAgg =
    copy(inputAggBufferOffset = o)

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def children: Seq[Expression] = Seq(givenId, rating)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(givenId = c(0), rating = c(1))
}

object NormalEqAgg {
  val FnName = "graft_normal_eq"
  private val regSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** `(givenId int, rating double)` → solved factor vector for the
    * grouping key, against the broadcast packed factors. The registry
    * builder captures the broadcast (a non-Column operand has no
    * call_function slot), so each invocation registers under a UNIQUE
    * suffixed name (ADVICE r9): a fixed name would let a lazily-composed
    * or concurrent query resolve against a LATER sweep's broadcast. The
    * per-call registry rows are metadata-sized. The caller must hand a
    * DOUBLE rating (no implicit casts through the registry path). */
  def of(spark: SparkSession, givenId: Column, rating: Column,
         factors: Broadcast[PackedFactors], d: Int, lambda: Double): Column = {
    val fn = s"${FnName}_${regSeq.incrementAndGet()}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fn, exprs => {
        require(exprs.length == 2, s"$fn expects (givenId, rating)")
        NormalEqAgg(exprs.head, exprs(1), factors, d, lambda)
      }, "built-in")
    org.apache.spark.sql.functions.call_function(fn, givenId, rating)
  }
}
