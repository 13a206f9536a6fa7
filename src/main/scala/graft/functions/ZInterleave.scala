package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.{Column, SparkSession}

/** Native codegen Z-order (Morton) key: bit-interleave the low 31 bits
  * of two long columns (left → even bit positions, right → odd) into one
  * non-negative long. Sorting by this key lays rows on the Z-curve, so a
  * range predicate on EITHER input column maps to a bounded set of key
  * runs — parquet files/row groups written in zkey order carry tight
  * min/max stats on BOTH columns at once (the multi-dimensional
  * clustering a single-column sort cannot give; the Delta/Iceberg
  * OPTIMIZE ZORDER layout re-expressed as a plain sort key).
  *
  * Write-time only — the key never appears in query predicates, queries
  * keep filtering on the natural columns and rely on scan-stat pruning.
  * Inputs are masked to 31 bits: the id spaces here are < 2^23, and the
  * mask keeps the packed key positive so signed-long ordering equals
  * unsigned bit ordering. */
case class ZInterleave(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    ZInterleave.morton(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val mod = "graft.functions.ZInterleave$.MODULE$"
      s"${ev.value} = $mod.morton($a, $b);"
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ZInterleave {
  /** Spread the low 31 bits of x to even bit positions (standard
    * mask-shift Morton spreading). */
  def spread(x: Long): Long = {
    var v = x & 0x7FFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  def morton(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  val FnName = "graft_zorder"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => {
        require(exprs.length == 2, s"$FnName expects exactly 2 arguments")
        ZInterleave(exprs.head, exprs(1))
      }, "built-in")

  def of(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(FnName, a, b)
  }
}
