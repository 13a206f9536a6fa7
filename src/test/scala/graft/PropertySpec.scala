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

  test("bidirectional distance equals forward BFS distance on random graphs") {
    check(Prop.forAll(genEdges) { es =>
      val s = spark; import s.implicits._
      val edges = TestSpark.edgesDF(es.map { case (a, b) => (a, b, 0) })
      val from = es.map(_._1).min
      val to = es.map(_._2).max
      val fwd = Traversals.shortestPathDist(edges,
        Seq(from).toDF("id"), Seq(to).toDF("tid"), maxDepth = 15).first()
      val (bidiDf, _, _) = Traversals.bidirectionalDist(edges,
        Seq(from).toDF("id"), Seq(to).toDF("id"), maxDepth = 15)
      val bidi = bidiDf.first()
      (fwd.isNullAt(0) && bidi.isNullAt(0)) ||
        (!fwd.isNullAt(0) && !bidi.isNullAt(0) && fwd.getLong(0) == bidi.getLong(0))
    })
  }

  test("salted as-of equals plain as-of on random event/order sets") {
    import org.apache.spark.sql.functions.col
    val genData = for {
      evs <- Gen.nonEmptyListOf(for {
        k <- Gen.choose(0L, 2L); ts <- Gen.choose(0L, 200L)
      } yield (k, ts))
      ords <- Gen.nonEmptyListOf(for {
        k <- Gen.choose(0L, 2L); ts <- Gen.choose(0L, 200L); p <- Gen.choose(0L, 9L)
      } yield (k, ts, p))
      w <- Gen.choose(1L, 60L)
    } yield (evs, ords, w)
    check(Prop.forAll(genData) { case (evs, ords, w) =>
      val s = spark; import s.implicits._
      val left = evs.zipWithIndex.map { case ((k, ts), i) => (i.toLong, k, ts) }
        .toDF("event_id", "k", "ets")
      val right = ords.toDF("k", "ots", "ok")
      def norm(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      norm(AsOf.join(left, right, "k", col("ets"), col("ots"), col("ok"), Seq("event_id"))) ==
        norm(AsOf.joinSalted(left, right, "k", col("ets"), col("ots"), col("ok"),
          Seq("event_id"), bucketWidth = w))
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

  // random documents over a small vocabulary so 5-gram collisions occur
  val genDocs: Gen[List[(Long, String)]] =
    Gen.nonEmptyListOf(for {
      id <- Gen.choose(0L, 60L)
      n  <- Gen.choose(0, 12)
      ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e"))
    } yield (id, ws.mkString(" "))).map(_.distinctBy(_._1))

  test("contamination equals brute-force n-gram intersection counts") {
    check(Prop.forAll(genDocs) { ds =>
      val s = spark; import s.implicits._
      val k = 5
      val docs = ds.toDF("doc_id", "text")
      val got = Dedup.contamination(docs, k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      def grams(t: String): Set[String] = {
        val w = t.split("\\s+").filter(_.nonEmpty)
        if (w.length < k) Set.empty
        else w.sliding(k).map(_.mkString(" ")).toSet
      }
      val bench = ds.filter(_._1 % 20 == 0).flatMap(d => grams(d._2)).toSet
      val expected = ds.filter(_._1 % 20 != 0)
        .map { case (id, t) => id -> grams(t).count(bench).toLong }
        .filter(_._2 > 0).toMap
      got == expected
    })
  }

  test("stratified sample equals per-row JVM md5 membership") {
    check(Prop.forAll(genDocs) { ds =>
      val s = spark; import s.implicits._
      val docs = ds.map { case (id, t) => (id, t, if (id % 3 == 0) "en" else "de") }
      val got = TextOps.stratifiedSample(docs.toDF("doc_id", "text", "lang"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) 0L else r.getLong(3))).toSet
      def sampled(id: Long): Boolean = {
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s"t5|$id".getBytes("UTF-8"))
        "%02x".format(d(0) & 0xff).charAt(0) < '4'
      }
      val expected = docs.groupBy(_._3).map { case (lang, rows) =>
        val in = rows.filter(r => sampled(r._1))
        (lang, rows.size.toLong, in.size.toLong, in.map(_._1).sum)
      }.toSet
      got == expected
    })
  }
}
