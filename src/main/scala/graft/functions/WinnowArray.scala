package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen winnowing fingerprints (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03) over a text column: md5-hex every char `k`-gram, keep the
  * lexicographic MINIMUM hash of each sliding window of `w` consecutive
  * k-gram hashes, return the sorted distinct selection as
  * `array<string>`.
  *
  * Value-identical to the composed built-ins form in
  * [[graft.TextOps.winnowSetsComposed]] (which mirrors the DuckDB oracle
  * SQL): char semantics via `UTF8String.substringSQL` (= SQL SUBSTRING),
  * texts shorter than k contribute one whole-text gram, windows clamp at
  * the array end, and hex-string min/sort are plain lexicographic
  * compares. The composed form nests two higher-order `transform`s whose
  * lambdas are interpreted per element — this expression is the whole
  * pipeline as one compiled call per row (the SimHash60 pattern,
  * SURVEY §7.3 preference-order (b)).
  */
case class WinnowArray(child: Expression, k: Int, w: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    WinnowArray.winnow(a.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mod = "graft.functions.WinnowArray$.MODULE$"
      s"${ev.value} = $mod.winnow($a, $k, $w);"
    })

  override def nullable: Boolean = child.nullable

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WinnowArray {
  /** The whole winnow per row: k-gram md5-hex array, per-window min,
    * distinct + sort. Hot path is index loops over a local array — no
    * per-element closure dispatch, one md5 per gram. */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val n = text.numChars()
    val count = math.max(n - k + 1, 1)
    val hs = new Array[String](count)
    var i = 0
    while (i < count) {
      // 1-based SQL substring, char semantics; clamps at the end — the
      // same gram the composed form's substring(text, i, k) produces
      hs(i) = org.apache.commons.codec.digest.DigestUtils.md5Hex(
        text.substringSQL(i + 1, k).getBytes)
      i += 1
    }
    val wins = math.max(count - w + 1, 1)
    val sel = new java.util.TreeSet[String]()
    var j = 0
    while (j < wins) {
      var m = hs(j)
      val end = math.min(j + w, count)
      var x = j + 1
      while (x < end) { if (hs(x).compareTo(m) < 0) m = hs(x); x += 1 }
      sel.add(m)
      j += 1
    }
    val out = new Array[Any](sel.size)
    val it = sel.iterator()
    var p = 0
    while (it.hasNext) { out(p) = UTF8String.fromString(it.next()); p += 1 }
    new GenericArrayData(out)
  }

  val FnName = "graft_winnow"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => {
        require(exprs.length == 1, s"$FnName expects exactly 1 argument")
        WinnowArray(exprs.head, 8, 4)
      }, "built-in")

  def of(spark: SparkSession, text: Column, k: Int = 8, w: Int = 4): Column = {
    // the registry path carries the default (k, w); non-default callers
    // get a dedicated registration
    if (k == 8 && w == 4) {
      register(spark)
      org.apache.spark.sql.functions.call_function(FnName, text)
    } else {
      val fn = s"${FnName}_${k}_$w"
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        fn, exprs => {
          require(exprs.length == 1, s"$fn expects exactly 1 argument")
          WinnowArray(exprs.head, k, w)
        }, "built-in")
      org.apache.spark.sql.functions.call_function(fn, text)
    }
  }
}
