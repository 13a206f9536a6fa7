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
  * O((|L|+|R|) log). Skew caveat: AQE skew handling splits shuffle-JOIN
  * partitions, NOT window partitions — one hot key serializes into one
  * task here. For skewed keys use [[joinSalted]], which salts the window
  * by time bucket and merges carry-outs across buckets. The reference has
  * no as-of operator at all (SURVEY §2.8 lists it as a gap to expose).
  */
object AsOf {

  /** Returns left rows (selected by `leftOut`) + `asof_ts` + `asof_val`
    * of the matched right row; left rows with no match are dropped
    * (inner as-of). */
  /** Shared prelude of [[join]]/[[joinSalted]]: tag left (side 1) and right
    * (side 0) rows and align them to one schema — the input contract both
    * variants MUST share (their equality is the salted form's invariant). */
  private def tagAndAlign(left: DataFrame, right: DataFrame, key: String,
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
    lAligned.unionByName(rAligned)
  }

  def join(left: DataFrame, right: DataFrame, key: String,
           leftTs: Column, rightTs: Column, payload: Column,
           leftOut: Seq[String]): DataFrame = {
    val all = tagAndAlign(left, right, key, leftTs, rightTs, payload, leftOut)
    val w = Window.partitionBy("_k")
      .orderBy(col("_ts"), col("_side"), col("_p").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry (ts, payload) as ONE struct so both fields always come from
    // the same right row (two independent last(...) calls could mix rows
    // when the newest match has a NULL payload)
    all
      .withColumn("_asof",
        last(when(col("_side") === 0, struct(col("_ts"), col("_p"))), ignoreNulls = true).over(w))
      .filter(col("_side") === 1 && col("_asof").isNotNull)
      .select((leftOut.map(col) :+ col("_asof._ts").as("asof_ts")
        :+ col("_asof._p").as("asof_val")): _*)
  }

  /** Skew-safe as-of: salt the window partition with a TIME BUCKET
    * (`floor(ts / bucketWidth)`), so a hot key's timeline splits across
    * parallel tasks, then merge in two cheap passes:
    *
    *   1. per (key, bucket): the same last-right-row sweep as [[join]];
    *   2. per (key, bucket): the bucket's max right struct ("carry-out"),
    *      then a running max over the key's few bucket rows gives each
    *      bucket its carry-IN — the latest right row from all earlier
    *      buckets. A left row's match is its within-bucket sweep if
    *      present (always later than any carry-in), else the carry-in.
    *
    * Identical results to [[join]] (spec pins it on a hot-key fixture);
    * the hot key costs O(rows/bucket) per task instead of O(rows). */
  def joinSalted(left: DataFrame, right: DataFrame, key: String,
                 leftTs: Column, rightTs: Column, payload: Column,
                 leftOut: Seq[String], bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // integer div (not double floor) — exact at any ts magnitude; any
    // monotone bucketing of the timeline is correct here
    val all = tagAndAlign(left, right, key, leftTs, rightTs, payload, leftOut)
      .withColumn("_b", expr(s"_ts div $bucketWidth"))
    // pass 1: within-bucket sweep (hot key now parallel across buckets)
    val wb = Window.partitionBy("_k", "_b")
      .orderBy(col("_ts"), col("_side"), col("_p").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = all.withColumn("_asof",
      last(when(col("_side") === 0, struct(col("_ts"), col("_p"))), ignoreNulls = true).over(wb))
    // pass 2: carry-in per bucket = running max of earlier buckets' best
    // right row — one row per (key, bucket), tiny window over buckets
    val carryOut = all.filter(col("_side") === 0)
      .groupBy("_k", "_b").agg(max(struct(col("_ts"), col("_p"))).as("_carry"))
    val wc = Window.partitionBy("_k").orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = swept.select("_k", "_b").distinct()
      .join(carryOut, Seq("_k", "_b"), "left_outer")
      .withColumn("_carry_in", max(col("_carry")).over(wc))
      .select("_k", "_b", "_carry_in")
    swept.filter(col("_side") === 1)
      .join(carryIn, Seq("_k", "_b"))
      .withColumn("_best", coalesce(col("_asof"), col("_carry_in")))
      .filter(col("_best").isNotNull)
      .select((leftOut.map(col) :+ col("_best._ts").as("asof_ts")
        :+ col("_best._p").as("asof_val")): _*)
  }
}
