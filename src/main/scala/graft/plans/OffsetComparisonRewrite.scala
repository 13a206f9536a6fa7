package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Catalyst optimizer rule: rewrite comparisons of a constant-offset
  * expression against a literal —
  *
  *   `(x + C) cmp K`  →  `x cmp (K - C)`
  *   `(x - C) cmp K`  →  `x cmp (K + C)`
  *
  * for integral x. Catalyst does not invert arithmetic on the left of a
  * comparison (its UnwrapCastInBinaryComparison only handles casts), so a
  * range predicate on a DERIVED column like the graph's `dst = l_suppkey +
  * 1e6` stalls above the scan and parquet gets no pushdown — the W2 sweep
  * had to hand-rewrite its interval onto the source column
  * (Tables.orderEdgesForDstRange). This rule does that rewrite in the
  * optimizer, so the natural `dst BETWEEN lo AND hi` form prunes row
  * groups too: after the rewrite the predicate is a plain attribute
  * comparison that FileSourceStrategy pushes into the scan.
  *
  * Registered per-session via `spark.experimental.extraOptimizations`
  * (see [[install]]) — the lightweight injection point; a packaged deploy
  * would use SparkSessionExtensions.injectOptimizerRule.
  *
  * Overflow safety: the folded literal is computed with exact arithmetic
  * and the rewrite is skipped when it would overflow. (In ANSI mode the
  * original form faults if x + C overflows for some row; the rewritten
  * form simply compares — acceptable for pruning predicates, where the
  * offset is a schema constant chosen not to overflow.)
  */
object OffsetComparisonRewrite extends Rule[LogicalPlan] {

  private def exactSub(k: Long, c: Long): Option[Long] =
    try Some(Math.subtractExact(k, c)) catch { case _: ArithmeticException => None }
  private def exactAdd(k: Long, c: Long): Option[Long] =
    try Some(Math.addExact(k, c)) catch { case _: ArithmeticException => None }

  /** (inner attr-side expression, folded literal) for `expr cmp K`. */
  private def invert(lhs: Expression, k: Long): Option[(Expression, Long)] = lhs match {
    case Add(x, Literal(c: Long, LongType), _)      => exactSub(k, c).map((x, _))
    case Add(Literal(c: Long, LongType), x, _)      => exactSub(k, c).map((x, _))
    case Subtract(x, Literal(c: Long, LongType), _) => exactAdd(k, c).map((x, _))
    case Add(x, Literal(c: Int, IntegerType), _)      => exactSub(k, c.toLong).map((x, _))
    case Add(Literal(c: Int, IntegerType), x, _)      => exactSub(k, c.toLong).map((x, _))
    case Subtract(x, Literal(c: Int, IntegerType), _) => exactAdd(k, c.toLong).map((x, _))
    case _ => None
  }

  private def lit(v: Long, like: Expression): Option[Literal] = like.dataType match {
    case LongType => Some(Literal(v, LongType))
    case IntegerType if v >= Int.MinValue && v <= Int.MaxValue =>
      Some(Literal(v.toInt, IntegerType))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case cmp: BinaryComparison =>
      (cmp.left, cmp.right) match {
        case (l, Literal(k: Long, LongType)) =>
          rewrite(cmp, l, k).getOrElse(cmp)
        case (l, Literal(k: Int, IntegerType)) =>
          rewrite(cmp, l, k.toLong).getOrElse(cmp)
        case _ => cmp
      }
  }

  private def rewrite(cmp: BinaryComparison, lhs: Expression, k: Long): Option[Expression] =
    for {
      (x, folded) <- invert(lhs, k)
      if x.dataType == LongType || x.dataType == IntegerType
      l <- lit(folded, x)
    } yield cmp.withNewChildren(Seq(x, l))

  /** Idempotently add the rule to the session's extra optimizer batch. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(this))
      spark.experimental.extraOptimizations = cur :+ this
  }
}
