package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-7 continuation #3: perceptual media blockhash near-dup (m5),
  * RAG indexing composite (x8), semi-supervised label propagation (c12). */
class Round7dSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("blockHash: payload edits flip only the touched blocks' bits") {
    implicit val s = spark; import s.implicits._
    // 120 bytes -> 2 bytes per block; doc 2 perturbs ONE region of doc 1,
    // doc 3 is structurally different
    val base = ("ab" * 30) + ("zy" * 30) // low half then high half
    val edit = ("ab" * 30) + ("zy" * 27) + "aa" + ("zy" * 2)
    val other = ("az" * 60)
    val media = Seq((1L, base), (2L, edit), (3L, other))
      .toDF("doc_id", "text")
    val h = Multimodal.blockHash(Multimodal.asMedia(media)).collect()
      .map(r => r.doc_id -> r.simhash).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(1L), h(2L)) <= 3)       // local edit stays near
    assert(ham(h(1L), h(3L)) > 3)        // different structure lands far
    // determinism: recompute equals
    val h2 = Multimodal.blockHash(Multimodal.asMedia(media)).collect()
      .map(r => r.doc_id -> r.simhash).toMap
    assert(h == h2)
  }

  test("phash near-dup pairs obey the pigeonhole radius") {
    implicit val s = spark; import s.implicits._
    val base = ("ab" * 30) + ("zy" * 30)
    val edit = ("ab" * 30) + ("zy" * 27) + "aa" + ("zy" * 2)
    val media = Seq((1L, base), (2L, edit), (3L, "az" * 60))
      .toDF("doc_id", "text")
    val pairs = Dedup.hammingPairsFrom(
      Multimodal.blockHash(Multimodal.asMedia(media)).toDF(), radius = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 <= 3)
  }

  test("ragIndexTopK scores are exact and exclude the query chunk") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, (1 to 20).map(i => s"w$i").mkString(" ")),
      (2L, (1 to 20).map(i => s"w$i").mkString(" ")), // duplicate text
      (3L, "totally different words here"))
      .toDF("doc_id", "text")
    val r = TextOps.ragIndexTopK(docs, k = 5).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    // query = (1, 0); doc 2 chunk 0 has the SAME fingerprint -> same
    // embedding -> cosine exactly 1e6, ranked first
    assert(r.head == ((2L, 0L, 1000000L)))
    assert(!r.contains((1L, 0L, 1000000L))) // the query chunk itself is excluded
  }

  test("semiSupervisedLabels: seeds clamp, neighbors adopt, isolated stay -1") {
    val s = spark; import s.implicits._
    // seed 10 (class 1) wired to 5 and 6; seed 20 (class 2) also wired
    // to 6 -> 6 tie-breaks to the SMALLER label; 99 is isolated
    val e = Seq((10L, 5L), (5L, 10L), (10L, 6L), (6L, 10L),
      (20L, 6L), (6L, 20L), (98L, 99L), (99L, 98L))
      .toDF("src", "dst")
    val r = TestSpark.toMap2(Traversals.semiSupervisedLabels(e, rounds = 3))
    assert(r(10L) == 1L)  // clamped seed: class = 10 % 3 = 1
    assert(r(20L) == 2L)  // clamped seed: class = 20 % 3 = 2
    assert(r(5L) == 1L)
    assert(r(6L) == 1L)   // votes {1, 2} -> count tie -> min label 1
    assert(r(99L) == -1L) // no labeled neighbor ever
  }
}
