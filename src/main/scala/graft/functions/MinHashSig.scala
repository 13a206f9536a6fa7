package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String
import graft.Dedup

/** Native codegen MinHash signature straight off the text column: the
  * whole shingle → 8-keyed-md5 → per-key minimum pipeline as ONE compiled
  * call per row, returning `array<string>` of the 8 minimum hex hashes.
  *
  * Value-identical to `Dedup.signatureFrom(Dedup.shingles(docs))` — same
  * tokenization as [[ShingleArray]] (lower → split `[^a-z0-9]+` → drop
  * empties; <3 tokens → whole token list as one shingle), same keyed hash
  * `md5('k|' || shingle)`, same lexicographic hex minimum. Shingle
  * DEDUPLICATION is skipped on purpose: duplicates cannot change a
  * minimum (the spec pins equality against the exploded-distinct form).
  *
  * Scale: the exploded pipeline shuffles every (doc, shingle) row to
  * min-aggregate per document — on a 100 TB corpus that is the single
  * biggest shuffle in the dedup path. This expression removes it
  * entirely: signatures are a narrow projection (the d4 SimHash story),
  * and only the 4-band join shuffles — tiny fixed-width rows. */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    MinHashSig.sig(a.asInstanceOf[UTF8String], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mod = "graft.functions.MinHashSig$.MODULE$"
      s"${ev.value} = $mod.sig($a, $numHashes);"
    })

  override def nullable: Boolean = child.nullable

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MinHashSig {
  private val sep = java.util.regex.Pattern.compile("[^a-z0-9]+")

  /** The whole signature per row: one md5 per (key, shingle), running
    * minima in a local array — no intermediate shingle array survives. */
  def sig(text: UTF8String, numHashes: Int): ArrayData = {
    val t = text.toString.toLowerCase(java.util.Locale.ROOT)
    val tokens = sep.split(t).filter(_.nonEmpty)
    val mins = new Array[String](numHashes)
    def consider(sh: String): Unit = {
      var k = 0
      while (k < numHashes) {
        val h = org.apache.commons.codec.digest.DigestUtils.md5Hex(
          (k.toString + "|" + sh).getBytes("UTF-8"))
        if (mins(k) == null || h.compareTo(mins(k)) < 0) mins(k) = h
        k += 1
      }
    }
    if (tokens.length < 3) consider(tokens.mkString(" "))
    else {
      var i = 0
      while (i <= tokens.length - 3) {
        consider(tokens(i) + " " + tokens(i + 1) + " " + tokens(i + 2))
        i += 1
      }
    }
    new GenericArrayData(mins.map(m => UTF8String.fromString(m): Any))
  }

  val FnName = "graft_minhash_sig"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => {
        require(exprs.length == 1, s"$FnName expects exactly 1 argument")
        MinHashSig(exprs.head, Dedup.NumHashes)
      }, "built-in")

  def of(spark: SparkSession, text: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(FnName, text)
  }
}
