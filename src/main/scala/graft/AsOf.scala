package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * `rightTs <= leftTs` on the same key (ties broken by max payload, so
  * the result is deterministic).
  *
  * Implemented the scale-correct way — tag both sides, union, and sweep
  * one window per key ordered by (ts, side, payload) carrying the last
  * seen right row. ONE shuffle on the key, no join blowup: the naive
  * `JOIN ON key AND rts <= lts` + argmax (which the DuckDB oracle uses)
  * is O(|L|·|R|) per key and would melt at 100 TB; the window form is
  * O((|L|+|R|) log) and AQE-skew-splittable. The reference has no as-of
  * operator at all (SURVEY §2.8 lists it as a gap to expose).
  */
object AsOf {

  /** Returns left rows (selected by `leftOut`) + `asof_ts` + `asof_val`
    * of the matched right row; left rows with no match are dropped
    * (inner as-of). */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTs: Column, rightTs: Column, payload: Column,
           leftOut: Seq[String]): DataFrame = {
    val l = left.select(
      (leftOut.map(col) :+ col(key).as("_k") :+ leftTs.as("_ts")): _*)
      .withColumn("_side", lit(1)).withColumn("_p", lit(null).cast("long"))
    val r = right.select(col(key).as("_k"), rightTs.as("_ts"),
        payload.cast("long").as("_p"))
      .withColumn("_side", lit(0))
    val lAligned = l.select(("_k" +: "_ts" +: "_side" +: "_p" +: leftOut).map(col): _*)
    val rAligned = leftOut.foldLeft(r.select("_k", "_ts", "_side", "_p")) {
      (df, c) => df.withColumn(c, lit(null))
    }
    val w = Window.partitionBy("_k")
      .orderBy(col("_ts"), col("_side"), col("_p").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry (ts, payload) as ONE struct so both fields always come from
    // the same right row (two independent last(...) calls could mix rows
    // when the newest match has a NULL payload)
    lAligned.unionByName(rAligned)
      .withColumn("_asof",
        last(when(col("_side") === 0, struct(col("_ts"), col("_p"))), ignoreNulls = true).over(w))
      .filter(col("_side") === 1 && col("_asof").isNotNull)
      .select((leftOut.map(col) :+ col("_asof._ts").as("asof_ts")
        :+ col("_asof._p").as("asof_val")): _*)
  }
}
