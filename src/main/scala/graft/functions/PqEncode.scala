package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.sql.{Column, SparkSession}

/** Native codegen product-quantization encoder: for an `array<float>`
  * embedding and a packed codebook of `ksub` full-dimension centroids
  * (`cb(cid * dim + i)`, doubles), returns the `array<int>` of per-
  * subspace L2-argmin centroid ids — subspace `j` compares elements
  * `[j·dim/m, (j+1)·dim/m)` of the vector against the same slice of each
  * centroid, ties to the SMALLEST cid (strict `<` while scanning cid
  * ascending — the same winner as `min(struct(d2, cid))` / the oracle's
  * `ORDER BY d2, cid` on bit-identical doubles; the accumulation order
  * over elements is ascending, matching the `aggregate(zip_with(..))`
  * left fold it replaces).
  *
  * Replaces e12's encode plan of corpus × m crossJoin ⋈ (m·ksub)
  * centroids + two keyed aggregations — a 128× row blowup per vector
  * with an interpreted lambda L2 per row (VERDICT r8 #3, 18.1 s at the
  * 200k-vector replay) — with ONE whole-stage-codegen projection over
  * the corpus: the SURVEY §7.3 preference-order (b) case, same pattern
  * as [[SimHash60]]. Null embedding → null; null ELEMENTS are not
  * handled (the embeddings table contract is non-null floats).
  */
case class PqEncode(child: Expression, cb: Array[Double], m: Int, ksub: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val dim = v.numElements()
    // a ragged row (dim ≠ training dim) would silently misindex the
    // packed codebook stride and argmin against garbage distances —
    // fail loud instead (ADVICE r9)
    if (cb.length != ksub * dim)
      throw new IllegalStateException(
        s"PqEncode: row dim $dim does not match codebook " +
          s"(${cb.length} = ksub $ksub × training dim ${cb.length / ksub})")
    val sub = dim / m
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = Double.MaxValue
      var bestC = 0
      var c = 0
      while (c < ksub) {
        var d2 = 0.0
        var t = 0
        while (t < sub) {
          val d = v.getFloat(j * sub + t).toDouble - cb(c * dim + j * sub + t)
          d2 += d * d
          t += 1
        }
        if (d2 < best) { best = d2; bestC = c }
        c += 1
      }
      codes(j) = bestC
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cbRef = ctx.addReferenceObj("pqcb", cb, "double[]")
      val dim = ctx.freshName("dim")
      val sub = ctx.freshName("sub")
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val t = ctx.freshName("t")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val d2 = ctx.freshName("d2")
      val d = ctx.freshName("d")
      s"""
         |int $dim = $a.numElements();
         |if ($cbRef.length != $ksub * $dim)
         |  throw new IllegalStateException("PqEncode: row dim " + $dim
         |    + " does not match codebook length " + $cbRef.length);
         |int $sub = $dim / $m;
         |int[] $codes = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  double $best = Double.MAX_VALUE;
         |  int $bestC = 0;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double $d2 = 0.0;
         |    for (int $t = 0; $t < $sub; $t++) {
         |      double $d = (double) $a.getFloat($j * $sub + $t)
         |        - $cbRef[$c * $dim + $j * $sub + $t];
         |      $d2 += $d * $d;
         |    }
         |    if ($d2 < $best) { $best = $d2; $bestC = $c; }
         |  }
         |  $codes[$j] = $bestC;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PqEncode {
  val FnName = "graft_pq_encode"
  private val regSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Register-and-call with the codebook captured in the builder (like
    * [[NormalEqAgg]]: a non-Column operand has no call_function slot).
    * Registered under a UNIQUE per-invocation name (ADVICE r9): the
    * builder captures STATE, so a fixed name would let a lazily-composed
    * or concurrent query resolve against a LATER registration's
    * codebook. A fresh suffix makes stale resolution impossible; temp-
    * function entries are name→builder map rows, metadata-sized. */
  def of(spark: SparkSession, embedding: Column, cb: Array[Double],
         m: Int, ksub: Int): Column = {
    val fn = s"${FnName}_${regSeq.incrementAndGet()}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fn, exprs => {
        require(exprs.length == 1, s"$fn expects (embedding)")
        PqEncode(exprs.head, cb, m, ksub)
      }, "built-in")
    org.apache.spark.sql.functions.call_function(fn, embedding)
  }
}
