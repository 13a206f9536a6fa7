package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass contamination probe for [[graft.Dedup.contaminationBloom]]:
  * tokenize the text (lower → split `[^a-z0-9]+` → drop empties — the
  * same derivation as [[ShingleArray]] / the oracle's TOK), form each
  * word `k`-gram, hash it with the SAME xxhash64(seed 42) the sketch was
  * built over, probe the Bloom filter, and return ONLY the surviving
  * grams as `array<string>`.
  *
  * Exists because the composed form (HOF `transform` building every gram
  * via `slice`+`concat_ws`, explode, then a per-row probe) interprets
  * the whole gram chain per element — HigherOrderFunctions are
  * CodegenFallback — and generates a row per gram just to discard
  * ~(1-fpp) of them: measured 20-23 s at the 500k-doc replay against
  * this expression's single JVM eval per DOCUMENT. Texts with fewer than
  * `k` tokens yield an empty array (no gram — matching the oracle's
  * `range(1, len(ts) - (k-2))`).
  *
  * The sketch ships as serialized bytes and deserializes once per task
  * (transient lazy); probe parity holds because the hash here is
  * literally [[XxHash64Function]] over the gram's UTF-8 bytes, the same
  * function the build side's `xxhash64(g)` column evaluates.
  */
case class GramProbe(child: Expression, k: Int, bfBytes: Array[Byte])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val sep = java.util.regex.Pattern.compile("[^a-z0-9]+")

  @transient private lazy val bloom =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bfBytes))

  override def nullSafeEval(input: Any): Any = {
    // Locale.ROOT here vs SQL lower() on the sketch-build side: for
    // ASCII the two agree byte-for-byte; outside ASCII UTF8String falls
    // back to default-locale toLowerCase, where e.g. a tr_TR JVM maps
    // 'I' differently and a contamination gram could be silently missed
    // (the md5 verify join only removes false POSITIVES). ASCII-only
    // corpus contract, the same one [[ShingleArray]] documents — the
    // benchmark sketch is built from SQL lower() over ASCII text
    // (ADVICE r9).
    val text = input.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT)
    val tokens = sep.split(text).filter(_.nonEmpty)
    val n = tokens.length - (k - 1)
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[Any]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      val g = UTF8String.fromString(sb.toString)
      if (bloom.mightContainLong(XxHash64Function.hash(g, StringType, 42L)))
        out.add(g)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object GramProbe {
  val FnName = "graft_gram_probe"
  private val regSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Register-and-call with (k, sketch bytes) captured in the builder
    * (the [[NormalEqAgg]] pattern — non-Column operands have no
    * call_function slot), under a UNIQUE per-invocation name (ADVICE
    * r9) so no later registration's sketch can ever be resolved by an
    * earlier, lazily-composed query. */
  def of(spark: SparkSession, text: Column, k: Int,
         bfBytes: Array[Byte]): Column = {
    val fn = s"${FnName}_${regSeq.incrementAndGet()}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fn, exprs => {
        require(exprs.length == 1, s"$fn expects (text)")
        GramProbe(exprs.head, k, bfBytes)
      }, "built-in")
    org.apache.spark.sql.functions.call_function(fn, text)
  }
}
