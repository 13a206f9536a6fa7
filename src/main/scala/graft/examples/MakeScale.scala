package graft.examples

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize a data-bound bench fixture: replicate an sf dir K× as
  * id-shifted disjoint copies of every table, keeping all join keys
  * consistent (orderkey shifts match between lineitem and orders, custkey
  * between orders and customer, …) and keeping the disjoint-id-space
  * invariants of [[graft.Tables]] (shifted suppliers stay below
  * NationBase, shifted customers below SupplierBase). `sf0.1 × 10` ≈ sf1:
  * 6M lineitem rows, the scale where per-job overhead stops hiding plan
  * differences — the BENCH_sf1 input.
  *
  * An optional 4th arg restricts which tables are SCALED (the rest are
  * copied 1×): `documents,embeddings` builds the sf10-class corpus
  * fixture — 100× docs/vectors for the dedup/ANN envelope without
  * crossing the graph tables' id-space bounds (safe only for k ≤ 10).
  *
  * Usage: MakeScale <srcDir> <outDir> [k=10] [scaleOnly=t1,t2,...]
  */
object MakeScale {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val k = if (args.length > 2) args(2).toInt else 10
    val scaleOnly: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).toSet) else None
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def rep(name: String, shifts: Map[String, Long], parts: Int = 8): Unit = {
      val t = spark.read.parquet(s"$src/$name.parquet")
      if (scaleOnly.exists(!_.contains(name))) {
        t.write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")
        println(s"[makescale] $name copied 1x")
        return
      }
      val all = (0 until k).map { i =>
        val shifted = shifts.foldLeft(t) { case (df, (c, base)) =>
          df.withColumn(c, col(c) + lit(i * base)) }
        // id shifts alone leave copy CONTENT identical, which turns a
        // replicated corpus into a dup-factor-k stress (near-dup cluster
        // sizes, and thus pair-emitting outputs, grow quadratically BY
        // CONSTRUCTION). For the linear-growth envelope the copies must be
        // content-disjoint like the graph copies are id-disjoint: tag every
        // document token with the copy index, and sign-flip embedding
        // dimensions by a per-copy hash pattern (norm-preserving; distinct
        // sign patterns decorrelate drawn vectors, cross-copy cosine ~0).
        // The tag must be FUSED (alphanumeric, no separator character): a
        // 'c1_' prefix would be split off by the [^a-z0-9]+ tokenizer,
        // leaving every copy's distinct-token SET (and so its simhash)
        // nearly identical — quadratic cross-copy Hamming structure at
        // exactly the entries this fixture exists to scale-test. Tagging
        // rides the fixture's space separators; 'c7xvector' stays one
        // token through tokenize and shingle alike.
        val disjoint =
          if (name == "documents" && i > 0)
            shifted.withColumn("text",
              concat(lit(s"c${i}x"), regexp_replace(col("text"), " ", s" c${i}x")))
          else if (name == "embeddings" && i > 0)
            shifted.withColumn("embedding", expr(
              s"transform(embedding, (x, j) -> x * CAST(1 - 2 * pmod(hash($i, j), 2) AS FLOAT))"))
          else shifted
        disjoint
      }.reduce(_ unionByName _)
      all.repartition(parts).write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")
      println(s"[makescale] $name x$k -> ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    // shift bases sized so k<=10 copies never cross an id-space boundary
    rep("lineitem", Map("l_orderkey" -> 10000000L, "l_suppkey" -> 10000L,
      "l_partkey" -> 1000000L), parts = 16)
    rep("orders", Map("o_orderkey" -> 10000000L, "o_custkey" -> 50000L))
    rep("customer", Map("c_custkey" -> 50000L))
    rep("supplier", Map("s_suppkey" -> 10000L))
    rep("part", Map("p_partkey" -> 1000000L))
    rep("events", Map("event_id" -> 10000000L, "user_id" -> 100000L))
    rep("documents", Map("doc_id" -> 10000000L))
    rep("embeddings", Map("vec_id" -> 10000000L))
    // reference dimensions stay fixed (shared by every copy)
    Seq("nation", "region").foreach { n =>
      spark.read.parquet(s"$src/$n.parquet")
        .write.mode(SaveMode.Overwrite).parquet(s"$out/$n.parquet")
    }
    // provenance stamp: a stale fixture (built by older code, or with
    // different args) once shipped three rounds of sf1 artifacts whose
    // dedup/text entries measured collapsed sf0.1-sized distinct content
    // — Bench records this stamp in every artifact so a fixture and the
    // numbers measured on it can never be separated again
    val stamp =
      s"""{"generator":"makescale-v2-contentdisjoint","k":$k,""" +
        s""""scaleOnly":${scaleOnly.map(_.toSeq.sorted.mkString("\"", ",", "\"")).getOrElse("null")},""" +
        s""""src":"$src","doc_tagging":true,"embedding_signflip":true}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out, "_fixture.json"),
      stamp.getBytes("UTF-8"))
    println(s"[makescale] stamped $out/_fixture.json")
    spark.stop()
  }
}
