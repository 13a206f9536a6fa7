package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** Word-3-gram shingle set of a text column in one pass.
  *
  * Exactly equivalent to the composed form used by the DuckDB oracle
  * (lower → split `[^a-z0-9]+` → drop empties → 3-gram join with spaces;
  * <3 tokens → the whole token list joined), but evaluated as a single
  * expression instead of four nested HigherOrderFunctions each
  * materializing an intermediate array per row — the dedup pipeline's
  * hottest scalar path. Only ASCII-lowercasing is involved (tokens are
  * `[a-z0-9]+` by construction), so `Locale.ROOT` matches SQL `lower`.
  */
case class ShingleArray(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val sep = java.util.regex.Pattern.compile("[^a-z0-9]+")

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT)
    val tokens = sep.split(text).filter(_.nonEmpty)
    val shingles: Array[String] =
      if (tokens.length < 3) Array(tokens.mkString(" "))
      else Array.tabulate(tokens.length - 2)(i =>
        s"${tokens(i)} ${tokens(i + 1)} ${tokens(i + 2)}")
    new GenericArrayData(shingles.map(s => UTF8String.fromString(s): Any))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ShingleArray {
  val FnName = "graft_shingles"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => {
        require(exprs.length == 1, s"$FnName expects exactly 1 argument")
        ShingleArray(exprs.head)
      }, "built-in")

  def shingles(spark: SparkSession, text: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(FnName, text)
  }
}
