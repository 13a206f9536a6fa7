package graft

import org.scalatest.funsuite.AnyFunSuite

/** G18/G18b: neighborhood function — exact counts on graphs small enough
  * to enumerate by hand, and sketch-vs-exact agreement for the HyperANF
  * path (sparse-mode HLL is exact at these cardinalities). */
class AnfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def nf(edges: (Long, Long)*): Map[Int, Long] = {
    val s = spark; import s.implicits._
    val sym = edges.toDF("src", "dst")
    Traversals.neighborhoodFunction(sym, maxH = 3)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
  }

  test("path a-b-c, symmetric: balls grow 3, 7, 9, 9") {
    // pairs within h: h=0 identity(3); h=1 +4 edges directed; h=2 a<->c
    val m = nf(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 2L)
    assert(m == Map(0 -> 3L, 1 -> 7L, 2 -> 9L, 3 -> 9L))
  }

  test("two disjoint directed edges: closure saturates immediately") {
    val m = nf(1L -> 2L, 3L -> 4L)
    assert(m == Map(0 -> 4L, 1 -> 6L, 2 -> 6L, 3 -> 6L))
  }

  test("HyperANF estimate flags est_ok on every hop and matches the exact column") {
    val s = spark; import s.implicits._
    // 4-cycle, symmetric: N(0)=4, N(1)=12, N(2)=16 (diameter 2)
    val e = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L)
    val sym = (e ++ e.map(_.swap)).toDF("src", "dst")
    val rows = Traversals.anfHyperLogLog(sym, maxH = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.sortBy(_._1).map(t => (t._1, t._2)).toSeq ==
      Seq((0, 4L), (1, 12L), (2, 16L)))
    assert(rows.forall(_._3), s"sketch estimate out of tolerance: ${rows.mkString(",")}")
  }
}
