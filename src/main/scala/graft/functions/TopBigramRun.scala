package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen "most frequent word bigram" over an `array<string>` of
  * tokens: returns `struct(cnt, gram)` — the occurrence count of the
  * most frequent adjacent-token bigram and the bigram itself, ties
  * resolved to the lexicographically (binary UTF-8) smallest gram.
  * Fewer than two tokens → `(0, '')`.
  *
  * The Gopher-style repetition filters (Rae et al. '21 §A1.1, "top
  * n-gram character fraction") need this per-row mode; computing it with
  * a groupBy-per-(doc, gram) + window would shuffle every bigram of
  * every document twice, and the higher-order-function equivalent
  * (count-per-distinct via nested `filter` lambdas) is interpreted AND
  * O(n²) per row. This is the whole pipeline — build, sort, run-scan —
  * as one compiled call per row (the [[SimHash60]]/[[WinnowArray]]
  * pattern, SURVEY §7.3 preference-order (b)); no shuffle, no row
  * amplification.
  *
  * Ordering parity: grams sort and tie-break as [[UTF8String]] binary
  * comparisons (= Spark string `<` and DuckDB memcmp collation), NOT
  * Java String UTF-16 order — the two diverge above U+FFFF. */
case class TopBigramRun(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("cnt", LongType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  override def nullSafeEval(a: Any): Any =
    TopBigramRun.top(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mod = "graft.functions.TopBigramRun$.MODULE$"
      s"${ev.value} = $mod.top($a);"
    })

  override def nullable: Boolean = child.nullable

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TopBigramRun {
  private val Space = UTF8String.fromString(" ")

  /** The whole mode-of-bigrams per row: concat adjacent tokens, binary
    * sort, single run-length scan keeping (longest run, smallest gram). */
  def top(ts: ArrayData): InternalRow = {
    val n = ts.numElements()
    if (n < 2) return new GenericInternalRow(Array[Any](0L, UTF8String.EMPTY_UTF8))
    val bg = new Array[UTF8String](n - 1)
    var i = 0
    while (i < n - 1) {
      bg(i) = UTF8String.concat(ts.getUTF8String(i), Space, ts.getUTF8String(i + 1))
      i += 1
    }
    java.util.Arrays.sort(bg.asInstanceOf[Array[AnyRef]]) // UTF8String: binary order
    var best = 0L
    var bestG: UTF8String = UTF8String.EMPTY_UTF8
    var run = 1L
    var j = 1
    while (j <= bg.length) {
      if (j < bg.length && bg(j).equals(bg(j - 1))) run += 1
      else {
        // sorted ascending ⇒ the FIRST gram reaching the max is the
        // smallest; only a strictly longer run replaces it
        if (run > best) { best = run; bestG = bg(j - 1) }
        run = 1L
      }
      j += 1
    }
    new GenericInternalRow(Array[Any](best, bestG))
  }

  val FnName = "graft_top_bigram"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => {
        require(exprs.length == 1, s"$FnName expects exactly 1 argument")
        TopBigramRun(exprs.head)
      }, "built-in")

  def of(spark: SparkSession, tokens: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(FnName, tokens)
  }
}
