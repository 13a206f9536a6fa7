package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-7 continuation: point-in-time feature join (x6), hard-negative
  * mining (e15), RRF fusion (e16), chunking (t22), linear quality
  * classifier (t23), Katz centrality (g22), URL-canonical dedup (d13). */
class Round7bSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def docs(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  def emb(rows: (Long, Seq[Float])*) = {
    val s = spark; import s.implicits._
    rows.map { case (id, v) => (id, v.toArray) }.toDF("vec_id", "embedding")
  }

  test("chunkDocs windows every token, overlaps, short tail, short doc") {
    val c = docs(
      1L -> (1 to 20).map(i => s"t$i").mkString(" "), // 20 tokens
      2L -> "only three tokens")
    val r = TextOps.chunkDocs(c, window = 16, stride = 8).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3)))
    val d1 = r.filter(_._1 == 1L).sortBy(_._2)
    // starts 0, 8, 16 -> lengths 16, 12, 4
    assert(d1.map(x => (x._2, x._3)).toSeq == Seq((0L, 16L), (1L, 12L), (2L, 4L)))
    assert(d1(0)._4 == TestSpark.md5Hex((1 to 16).map(i => s"t$i").mkString(" ")))
    assert(d1(2)._4 == TestSpark.md5Hex((17 to 20).map(i => s"t$i").mkString(" ")))
    // a doc shorter than one window yields exactly one chunk
    assert(r.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 3L,
      TestSpark.md5Hex("only three tokens"))))
  }

  test("chunkDocs drops token-free docs") {
    val r = TextOps.chunkDocs(docs(1L -> "...", 2L -> "ok"), 4, 2).collect()
    assert(r.map(_.getLong(0)).toSet == Set(2L))
  }

  test("linearQualityScore is the sum of per-token bucket weights") {
    val c = docs(1L -> "alpha beta alpha", 2L -> "")
    val r = TextOps.linearQualityScore(c, buckets = 64).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    // reproduce the weight chain on the driver for one token
    def h(s0: String): Long =
      java.lang.Long.parseLong(TestSpark.md5Hex(s0).take(15), 16)
    def w(tok: String): Long = h(s"lqw|${h(s"lq|$tok") % 64}") % 2001 - 1000
    assert(r(1L)._1 == 3L)
    assert(r(1L)._2 == 2 * w("alpha") + w("beta"))
    assert(r(1L)._3 == (if (r(1L)._2 >= 0) 1L else 0L))
    // empty doc: zero tokens, score 0, passes
    assert(r(2L) == ((0L, 0L, 1L)))
  }

  test("katzCentrality counts attenuated walks exactly") {
    val s = spark; import s.implicits._
    // path graph 1 -> 2 -> 3 plus a parallel edge 1 -> 2
    val e = Seq((1L, 2L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r = TestSpark.toMap2(Traversals.katzCentrality(e, k = 10))
    // w1: 2->2, 3->1 ; w2: walks len2 end at 3 = 2 ; w3: none
    // katz(2) = 4*2 = 8 ; katz(3) = 4*1 + 2*2 = 8
    assert(r == Map(2L -> 8L, 3L -> 8L))
  }

  test("hardNegatives keeps only the band below the positive bar") {
    // query = vec 0; vec 1 is a near-dup (cos ~ 1), vec 2 orthogonal,
    // vec 3 at cos = 0.1 (in band), vec 4 opposite
    val e = emb(
      0L -> Seq(1f, 0f), 1L -> Seq(1f, 0.001f), 2L -> Seq(0f, 1f),
      3L -> Seq(0.1f, 0.99498743710662f), 4L -> Seq(-1f, 0f))
    val r = Similarity.hardNegatives(e, k = 5, lo = 50000L, hi = 150000L)
      .collect().map(_.getLong(0)).toSeq
    assert(r == Seq(3L))
  }

  test("rrfFusion blends the two rankings with 1e6 div (60 + rank)") {
    // cosine ranks by direction; MIPS rewards norm: vec 2 is a huge
    // off-direction vector that MIPS ranks first but cosine ranks last
    val e = emb(
      0L -> Seq(1f, 0f),
      1L -> Seq(2f, 0.02f),
      2L -> Seq(10f, 30f),
      3L -> Seq(0.9f, 0.1f))
    val r = Similarity.rrfFusion(e, k = 3, n = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    // cosine order: 1, 3, 2 ; mips order: 2, 1, 3
    val byId = r.map(x => x._1 -> x._2).toMap
    assert(byId(1L) == 1000000 / 61 + 1000000 / 62)
    assert(byId(2L) == 1000000 / 63 + 1000000 / 61)
    assert(byId(3L) == 1000000 / 62 + 1000000 / 63)
    assert(r.forall(_._3 == 2L)) // every candidate sits in both lists here
  }

  test("urlCanonicalDedup collapses tracking/case/www variants") {
    val s = spark; import s.implicits._
    val d = Seq((0L, "x", "src0"), (50L, "y", "src0"), (1L, "z", "src0"))
      .toDF("doc_id", "text", "source")
    val r = Dedup.urlCanonicalDedup(d).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    // doc 0 and doc 50 share doc_id mod 50 and source -> same canonical
    val c0 = r.find(_._3 == 0L).get
    assert(c0._1 == "https://src0.example.com/p/0/?id=0" && c0._2 == 2L)
    assert(r.find(_._3 == 1L).get._1 == "https://src0.example.com/p/1/?id=1")
  }

  test("pointInTimeFeatures has no leakage: features strictly precede the label") {
    val s = spark; import s.implicits._
    // user 7: view(t=1, v=1.00), purchase(t=2, v=2.00), purchase(t=3, v=3.00)
    val base = 1700000000L * 1000000000L
    val ev = Seq(
      (10L, base + 1000000000L, 7L, "view", 1.0),
      (11L, base + 2000000000L, 7L, "purchase", 2.0),
      (12L, base + 3000000000L, 7L, "purchase", 3.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    ev.write.mode("overwrite").parquet("/tmp/graft-x6-spec/events.parquet")
    val fn = SparkEntry.queries("x6_feature_join_pit")
    val r = fn(spark, "/tmp/graft-x6-spec").collect()
      .map(x => x.getLong(0) -> (x.getLong(3), x.getLong(4), x.getString(5))).toMap
    // label at t=2 sees ONLY the view; label at t=3 sees view + purchase(2)
    assert(r(11L) == ((1L, 100L, "view")))
    assert(r(12L) == ((2L, 300L, "purchase")))
  }
}
