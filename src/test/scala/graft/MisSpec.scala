package graft

import org.scalatest.funsuite.AnyFunSuite

/** G15: Luby's maximal independent set — independence and maximality are
  * checked structurally (they hold for ANY valid MIS), determinism by
  * re-run equality. */
class MisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def mis(edges: (Long, Long)*): (Set[Long], Seq[(Long, Long)]) = {
    val s = spark; import s.implicits._
    val canon = edges.toDF("src", "dst")
    val m = Traversals.maximalIndependentSet(canon)
      .collect().map(_.getLong(0)).toSet
    (m, edges)
  }

  def assertValidMis(m: Set[Long], edges: Seq[(Long, Long)]): Unit = {
    // independence: no edge inside the set
    assert(!edges.exists { case (a, b) => m(a) && m(b) },
      s"edge inside MIS $m")
    // maximality: every non-member has a member neighbor
    val verts = edges.flatMap(e => Seq(e._1, e._2)).toSet
    val adj = (edges ++ edges.map(_.swap)).groupMap(_._1)(_._2)
    val uncovered = (verts -- m).filterNot(v => adj(v).exists(m))
    assert(uncovered.isEmpty, s"non-members $uncovered have no MIS neighbor")
  }

  test("star graph: MIS is either the hub or all leaves, and is valid") {
    val (m, e) = mis(1L -> 2L, 1L -> 3L, 1L -> 4L, 1L -> 5L)
    assertValidMis(m, e)
  }

  test("path and triangle components are covered validly") {
    val (m, e) = mis(1L -> 2L, 2L -> 3L, 3L -> 4L, // path
      10L -> 11L, 11L -> 12L, 10L -> 12L) // triangle
    assertValidMis(m, e)
    assert(m.count(Set(10L, 11L, 12L)) == 1) // triangle contributes exactly 1
  }

  test("isolated-in-canon vertices (appear only once) still decided; rerun deterministic") {
    val edges = Seq(1L -> 2L, 3L -> 4L, 5L -> 6L, 2L -> 3L)
    val (m1, e) = mis(edges: _*)
    val (m2, _) = mis(edges: _*)
    assertValidMis(m1, e)
    assert(m1 == m2)
  }
}
