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
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any = {
    val ts = a.asInstanceOf[ArrayData]
    val n = ts.numElements()
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (ts.isNullAt(i)) return null
      val h = SimHash60.tokenHash(ts.getUTF8String(i))
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
         |  long $h = $mod.tokenHash($a.getUTF8String($i));
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
  /** First 60 bits of md5 over the token's UTF-8 bytes — bit-equal to the
    * SQL form `cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)`. */
  def tokenHash(t: UTF8String): Long = {
    val md = org.apache.commons.codec.digest.DigestUtils.md5(t.getBytes)
    var h = 0L
    var j = 0
    while (j < 8) { h = (h << 8) | (md(j) & 0xFFL); j += 1 }
    h >>> 4
  }

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

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => {
        require(exprs.length == 1, s"$FnName expects exactly 1 argument")
        SimHash60(exprs.head)
      }, "built-in")

  def of(spark: SparkSession, tokens: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(FnName, tokens)
  }
}
