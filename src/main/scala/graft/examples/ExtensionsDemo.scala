package graft.examples

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Self-contained proof that [[graft.plans.GraftExtensions]] wires the
  * custom rule + function into a session built with `withExtensions`:
  * prints whether the NATURAL dst-interval predicate reached the parquet
  * scan on the source column, and evaluates `graft_dot` from SQL. Run:
  *
  *   sbt "runMain graft.examples.ExtensionsDemo"
  */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val plan = Tables.orderEdges(spark, dir)
      .filter(col("dst").between(Tables.SupplierBase, Tables.SupplierBase + 4))
      .queryExecution.executedPlan.toString
    val pushed = plan.contains("GreaterThanOrEqual(l_suppkey,0)") &&
      plan.contains("LessThanOrEqual(l_suppkey,4)")
    println(s"[ext] offset rewrite pushed to scan: $pushed")

    val dot = spark.sql(
      "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").first().getDouble(0)
    println(s"[ext] graft_dot via SQL: $dot (expect 11.0)")
    // the injected SimHash60 must agree with the SQL derivation of one
    // token's hash: a single token votes its own bits
    val sh = spark.sql(
      "SELECT graft_simhash60(array('hello')) = " +
        "CAST(conv(substring(md5('hello'), 1, 15), 16, 10) AS BIGINT) AS ok")
      .first().getBoolean(0)
    println(s"[ext] graft_simhash60 via SQL matches md5 derivation: $sh")
    // the injected ShingleArray must produce the word 3-grams of a
    // 4-token string (two shingles, overlapping)
    val shingles = spark.sql("SELECT graft_shingles('a b c d') AS s")
      .first().getSeq[String](0)
    println(s"[ext] graft_shingles via SQL: $shingles (expect [a b c, b c d])")
    // wrong arity must fail analysis loudly — graft_winnow(text, 16, 8)
    // must NOT silently run with the hardcoded k=8/w=4
    val arityRejected =
      try { spark.sql("SELECT graft_winnow('abc', 16, 8)").collect(); false }
      catch { case e: org.apache.spark.sql.AnalysisException =>
        e.getMessage.contains("graft_winnow") }
    println(s"[ext] graft_winnow wrong-arity rejected: $arityRejected")
    require(pushed && dot == 11.0 && sh && shingles == Seq("a b c", "b c d")
        && arityRejected,
      "extensions not active")
    println("[ext] OK")
    spark.stop()
  }
}
