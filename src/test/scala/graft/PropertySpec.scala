package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests (FIXTURES.md §2 plan): operator results on random small
  * graphs must equal brute-force Scala reference computations. */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(5).withMaxSize(30), p)
    assert(res.passed, res.status.toString)
  }

  val genEdges: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(for {
      s <- Gen.choose(0L, 11L)
      d <- Gen.choose(0L, 11L).suchThat(_ != s)
    } yield (s, d))

  test("FoF path counts equal brute-force 2-hop enumeration") {
    check(Prop.forAll(genEdges) { es =>
      val edges = TestSpark.edgesDF(es.map { case (s, d) => (s, d, 0) })
      val got = Queries.friendsOfFriendsExclTop20(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val v = es.map(_._1).min
      val hop1 = es.filter(_._1 == v).map(_._2).distinct
      val counts = es.filter(e => hop1.contains(e._1) && e._2 != v)
        .groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val top = counts.toSeq.sortBy { case (id, c) => (-c, id) }.take(20).toMap
      got == top
    })
  }

  test("BFS distances equal brute-force BFS") {
    check(Prop.forAll(genEdges) { es =>
      val s = spark; import s.implicits._
      val edges = TestSpark.edgesDF(es.map { case (a, b) => (a, b, 0) })
      val src = es.map(_._1).min
      val got = Traversals.bfsDistances(edges, Seq((src, src)).toDF("source", "id"), 15)
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      val adj = es.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
      var dist = Map(src -> 0L)
      var frontier = List(src)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(u => adj.getOrElse(u, Nil))
          .distinct.filterNot(dist.contains)
        val d = dist(frontier.head) + 1
        next.foreach(v => dist += v -> d)
        frontier = next
      }
      got == dist
    })
  }

  test("connected components equal brute-force union-find") {
    check(Prop.forAll(genEdges) { es =>
      val sym = (es ++ es.map(_.swap)).distinct
      val edges = TestSpark.edgesDF(sym.map { case (a, b) => (a, b, 0) })
      val got = TestSpark.toMap2(Traversals.connectedComponents(edges))
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      sym.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(v => v -> find(v)).toMap
      got == expected
    })
  }
}
