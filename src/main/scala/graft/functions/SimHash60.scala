package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen 60-bit SimHash over an `array<string>` of (distinct)
  * tokens: per token, hash = the first 60 bits of md5 (exactly
  * `conv(substring(md5(t), 1, 15), 16, 10)` — 15 hex digits = the
  * big-endian first 8 digest bytes >>> 4); per bit b ∈ [0, 60), vote +1
  * if set else −1; pack the positive-vote bits into one long.
  *
  * Value-identical to the exploded per-bit derivation the DuckDB oracle
  * uses (the vote per (doc, bit) is the same order-independent integer
  * sum). The composed higher-order form (`transform` + md5 lambda +
  * nested `aggregate`/`zip_with` folds) is interpreted per ELEMENT and
  * allocates a 60-long vote array per token — measured slower than even
  * the 60× explode it was meant to replace; this expression is the whole
  * pipeline (hash + vote + pack) as one compiled loop with a single
  * stack-local vote array per row. The SURVEY §7.3 preference-order (b)
  * case, like [[FloatDotProduct]].
  *
  * `half` selects which 60 md5 bits feed the votes: 0 = digest bytes
  * 0-7 (hex chars 1-15, the d4 signature), 1 = bytes 8-15 (hex chars
  * 17-31). Two halves give the 120-bit wide fingerprint whose 4×30-bit
  * bands stay collision-bounded at corpus sizes where the 60-bit
  * 4×15-bit bands saturate (the e9b scale path; PERF.md corpus replay).
  */
case class SimHash60(child: Expression, half: Int = 0) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any = {
    val ts = a.asInstanceOf[ArrayData]
    val n = ts.numElements()
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (ts.isNullAt(i)) return null
      val h = SimHash60.tokenHash(ts.getUTF8String(i), half)
      var b = 0
      while (b < 60) {
        votes(b) += (((h >> b) & 1L).toInt << 1) - 1
        b += 1
      }
      i += 1
    }
    SimHash60.pack(votes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val votes = ctx.freshName("votes")
      val mod = "graft.functions.SimHash60$.MODULE$"
      s"""
         |int $n = $a.numElements();
         |int[] $votes = new int[60];
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  long $h = $mod.tokenHash($a.getUTF8String($i), $half);
         |  for (int $b = 0; $b < 60; $b++) {
         |    $votes[$b] += ((int) (($h >> $b) & 1L) << 1) - 1;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $mod.pack($votes);
         |}
       """.stripMargin
    })

  override def nullable: Boolean = true

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object SimHash60 {
  /** 60 md5 bits over the token's UTF-8 bytes: half 0 = digest bytes
    * 0-7 big-endian >>> 4, bit-equal to the SQL form
    * `cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)`; half 1 =
    * bytes 8-15, ≡ `conv(substring(md5(t), 17, 15), 16, 10)`. */
  def tokenHash(t: UTF8String, half: Int): Long = {
    val md = org.apache.commons.codec.digest.DigestUtils.md5(t.getBytes)
    var h = 0L
    var j = 8 * half
    while (j < 8 * half + 8) { h = (h << 8) | (md(j) & 0xFFL); j += 1 }
    h >>> 4
  }

  def tokenHash(t: UTF8String): Long = tokenHash(t, 0)

  def pack(votes: Array[Int]): Long = {
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  val FnName = "graft_simhash60"
  val FnNameHi = "graft_simhash60_hi"

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => {
        require(exprs.length == 1, s"$FnName expects exactly 1 argument")
        SimHash60(exprs.head)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnNameHi, exprs => {
        require(exprs.length == 1, s"$FnNameHi expects exactly 1 argument")
        SimHash60(exprs.head, half = 1)
      }, "built-in")
  }

  def of(spark: SparkSession, tokens: Column, half: Int = 0): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      if (half == 0) FnName else FnNameHi, tokens)
  }
}
