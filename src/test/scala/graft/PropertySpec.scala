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

  test("served FoF equals the scan form on random graphs, row for row") {
    // the q1s serving composition (collected hop-1 mids, literal IN
    // pushdown) must be a pure PHYSICAL variant: same rows, same
    // deterministic (paths desc, id) top-20 cut as the broadcast-join
    // scan form, on any graph — including repeated edges (path
    // multiplicity) and 2-cycles through the query vertex
    check(Prop.forAll(genEdges) { es =>
      val edges = TestSpark.edgesDF(es.map { case (s, d) => (s, d, 0) })
      val scan = Queries.friendsOfFriendsExclTop20(edges)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val served = Queries.friendsOfFriendsExclTop20Served(edges)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      served == scan
    })
  }

  test("STORE-served FoF (mirror-routed reverse hop) equals the sym scan form") {
    // DurableStore.servedFof reads the out hop from src-routed primary
    // files and the reverse hop from the dst-bucketed in-edge mirror;
    // on any random graph (repeated edges, 2-cycles, hubs) it must be
    // row-equal to the broadcast-join scan form over the symmetric view,
    // with the query vertex answered from manifest stats alone
    check(Prop.forAll(genEdges) { es =>
      import org.apache.spark.sql.functions.col
      val edges = TestSpark.edgesDF(es.map { case (s, d) => (s, d, 0) })
      val e = edges.select("src", "dst")
      val sym = e.unionByName(
        e.select(col("dst").as("src"), col("src").as("dst")))
      val scan = Queries.friendsOfFriendsExclTop20(sym)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val root = java.nio.file.Files.createTempDirectory("graft-prop-srv").toString
      val st = DurableStore.create(spark, edges, root,
        numBuckets = 2, withInEdgeIndex = true)
      val v0 = st.minEndpoint(1).get
      // indexed store: BOTH hops answered DRIVER-LOCALLY (the zero-job
      // serving path — localReadLongs + fofTopKLocal)
      val served = st.servedFof(1, v0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      // budgets forced to zero: the one-job hop-2 FALLBACK must produce
      // the same rows (the local path is a pure physical variant)
      val servedJob = st.servedFof(1, v0,
          localFileBudget = 0, localDeltaRowBudget = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      // unindexed store: the two-job fallback (distributed hop 1, full
      // -view reverse hop) must produce the same rows
      val root2 = java.nio.file.Files.createTempDirectory("graft-prop-srv0").toString
      val st2 = DurableStore.create(spark, edges, root2, numBuckets = 2)
      val served2 = st2.servedFof(1, v0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      v0 == (es.map(_._1) ++ es.map(_._2)).min &&
        served == scan && servedJob == scan && served2 == scan
    })
  }

  test("fofTopKLocal equals a naive count on large random multisets (table-growth path)") {
    // the serving top-k's open-addressed counter starts at 4096 slots
    // and doubles past 50% load — fixture graphs never push it there,
    // so pin the growth path directly: ~19k distinct keys force
    // multiple rehashes; negative keys exercise the hash's sign handling
    val rnd = new scala.util.Random(7)
    for (n <- Seq(0, 100, 50000)) {
      val v0 = 5L
      val hop2 = Array.fill(n)(rnd.between(-1000L, 19000L))
      val expect = hop2.filter(_ != v0)
        .groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
        .toSeq.sortBy { case (id, c) => (-c, id) }.take(20)
      assert(Queries.fofTopKLocal(hop2, v0, 20) == expect)
    }
  }

  test("out-of-core scan CC equals resident CC on random symmetric graphs") {
    // connectedComponentsScan streams the edge frame per superstep and
    // broadcast-hints the label side under the vertex gate; its fixpoint
    // must be IDENTICAL to connectedComponents' — and with the gate
    // forced to 0 (no broadcast hint, AQE-planned join) identical again
    check(Prop.forAll(genEdges) { es =>
      import org.apache.spark.sql.functions.col
      val edges = TestSpark.edgesDF(es.map { case (s, d) => (s, d, 0) })
      val e = edges.select("src", "dst")
      val sym = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      def m(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val resident = m(Traversals.connectedComponents(sym))
      m(Traversals.connectedComponentsScan(sym)) == resident &&
        m(Traversals.connectedComponentsScan(sym, broadcastLabelsUpTo = 0)) == resident
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

  test("winnowing guarantee: docs sharing a substring >= k+w-1 share a fingerprint") {
    val genShared: Gen[(String, String, String)] = for {
      core <- Gen.listOfN(12, Gen.alphaLowerChar).map(_.mkString) // 12 >= k+w-1 = 11
      pre  <- Gen.listOfN(5, Gen.numChar).map(_.mkString)
      suf  <- Gen.listOfN(7, Gen.numChar).map(_.mkString)
    } yield (core, pre, suf)
    check(Prop.forAll(genShared) { case (core, pre, suf) =>
      val s = spark; import s.implicits._
      val d = Seq((1L, pre + core), (2L, core + suf)).toDF("doc_id", "text")
      val prints = TextOps.winnowPrints(d).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
      (prints(1L) & prints(2L)).nonEmpty
    })
  }

  test("batch sessionization equals brute-force session assignment") {
    val genEvents: Gen[List[(Long, Long, Long)]] = // (event_id, user, ts_us)
      Gen.nonEmptyListOf(for {
        u <- Gen.choose(0L, 3L)
        t <- Gen.choose(0L, 10L) // coarse ticks; gap below is 3 ticks
      } yield (u, t)).map(_.zipWithIndex.map { case ((u, t), i) => (i.toLong, u, t) })
    val gapUs = 3L
    check(Prop.forAll(genEvents) { evs =>
      val s = spark; import s.implicits._
      s.createDataFrame(evs.map { case (id, u, t) => (u, id, t, 1.0) })
        .toDF("user_id", "event_id", "ts_us", "value")
        .createOrReplaceTempView("pe")
      // query body mirrors r11; compare per-user session partitions
      val sessions = s.sql(
        s"""WITH s1 AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
           |                        OR ts_us - lag(ts_us) OVER w > $gapUs THEN 1 ELSE 0 END AS ns
           |       FROM pe WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
           |s2 AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
           |                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           |       FROM s1)
           |SELECT user_id, sid, count(*) AS n, min(ts_us) AS a, max(ts_us) AS b
           |FROM s2 GROUP BY user_id, sid""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      // brute force: per user, sort by (ts, id), cut where gap exceeds gapUs
      val expected = evs.groupBy(_._2).flatMap { case (u, es) =>
        val sorted = es.sortBy(e => (e._3, e._1))
        val cuts = sorted.zip(Option.empty[Long] +: sorted.map(e => Some(e._3)))
          .map { case (e, prev) => prev.forall(p => e._3 - p > gapUs) }
        val sids = cuts.scanLeft(0L)((acc, c) => if (c) acc + 1 else acc).tail
        sorted.zip(sids).groupBy(_._2).map { case (sid, g) =>
          (u, sid, g.size.toLong, g.map(_._1._3).min, g.map(_._1._3).max)
        }
      }.toSet
      sessions == expected
    })
  }

  test("weighted SSSP equals brute-force Dijkstra") {
    val genWeighted: Gen[List[(Long, Long, Int)]] =
      Gen.nonEmptyListOf(for {
        s <- Gen.choose(0L, 9L)
        d <- Gen.choose(0L, 9L).suchThat(_ != s)
        w <- Gen.choose(1, 5)
      } yield (s, d, w))
    check(Prop.forAll(genWeighted) { es =>
      val sess = spark; import sess.implicits._
      val edges = es.toDF("src", "dst", "rating")
      val got = Traversals.weightedSSSP(edges).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val src = es.map(_._1).min
      // brute-force Dijkstra over the multigraph (min parallel edge wins)
      var dist = Map(src -> 0L)
      var frontier = Set(src)
      while (frontier.nonEmpty) {
        val improved = scala.collection.mutable.Map.empty[Long, Long]
        for ((a, b, w) <- es if dist.contains(a)) {
          val nd = dist(a) + w
          if (nd < dist.getOrElse(b, Long.MaxValue) &&
              nd < improved.getOrElse(b, Long.MaxValue)) improved(b) = nd
        }
        frontier = improved.collect {
          case (v, nd) if nd < dist.getOrElse(v, Long.MaxValue) => v }.toSet
        dist = dist ++ improved.filter { case (v, nd) =>
          nd < dist.getOrElse(v, Long.MaxValue) }
      }
      got == dist
    })
  }

  test("temporal reach (delta frontier) equals the naive full-expansion unroll") {
    val genTemporal: Gen[List[(Long, Long, Long)]] =
      Gen.nonEmptyListOf(for {
        s <- Gen.choose(0L, 9L)
        d <- Gen.choose(0L, 9L).suchThat(_ != s)
        t <- Gen.choose(0L, 6L)
      } yield (s, d, t))
    check(Prop.forAll(genTemporal) { es =>
      val sess = spark; import sess.implicits._
      val hops = 4
      val edges = es.toDF("src", "dst", "ets")
      val src = es.map(_._1).min
      val got = Traversals.temporalReachFrom(edges, Seq(src).toDF("v"), hops)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // naive reference: expand the WHOLE arrival map every hop (the
      // pre-delta form the rewrite must stay value-identical to)
      var arr = Map(src -> 0L)
      for (_ <- 1 to hops) {
        val msgs = for ((u, v, t) <- es; a <- arr.get(u) if t >= a) yield v -> t
        arr = (arr.toSeq ++ msgs).groupBy(_._1)
          .map { case (v, xs) => v -> xs.map(_._2).min }
      }
      got == arr
    })
  }

  test("k-core fixpoint equals brute-force iterative peeling") {
    check(Prop.forAll(genEdges) { es =>
      val canonPairs = es.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b)) }.distinct
      if (canonPairs.isEmpty) true
      else {
        val canon = TestSpark.edgesDF(canonPairs.map { case (a, b) => (a, b, 0) })
          .select("src", "dst")
        val got = Traversals.kCore(canon, k = 2).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        // brute force: peel until stable
        var verts = canonPairs.flatMap(e => Seq(e._1, e._2)).distinct.toSet
        var stable = false
        var deg = Map.empty[Long, Long]
        while (!stable) {
          val ie = canonPairs.filter(e => verts(e._1) && verts(e._2))
          deg = ie.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
            .view.mapValues(_.size.toLong).toMap
          val next = verts.filter(v => deg.getOrElse(v, 0L) >= 2)
          if (next == verts) stable = true else verts = next
        }
        got == verts.map(v => v -> deg(v)).toMap
      }
    })
  }

  test("big-star CC labels equal label-prop CC labels on random graphs") {
    check(Prop.forAll(genEdges) { es =>
      val pairs = es.collect { case (a, b) if a != b => (a, b) }.distinct
      if (pairs.isEmpty) true
      else {
        val sym = TestSpark.edgesDF(pairs.map { case (a, b) => (a, b, 0) } ++
          pairs.map { case (a, b) => (b, a, 0) })
        val star = Traversals.ccBigStar(sym).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val prop = Traversals.connectedComponents(sym).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        star == prop
      }
    })
  }

  test("degree-oriented triangle list equals brute-force triple enumeration") {
    check(Prop.forAll(genEdges) { es =>
      val canonPairs = es.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b)) }.distinct
      Prop.classify(canonPairs.nonEmpty, "nonempty") {
        if (canonPairs.isEmpty) true
        else {
          val canon = TestSpark.edgesDF(canonPairs.map { case (a, b) => (a, b, 0) })
            .select("src", "dst")
          val got = Queries.triangleList(canon)
            .collect().map(r => Set(r.getLong(0), r.getLong(1), r.getLong(2))).toSet
          val eset = canonPairs.toSet
          def adj(u: Long, v: Long) = eset.contains((math.min(u, v), math.max(u, v)))
          val verts = canonPairs.flatMap(e => Seq(e._1, e._2)).distinct.sorted
          val expected = (for {
            i <- verts.indices; j <- (i + 1) until verts.size; k <- (j + 1) until verts.size
            if adj(verts(i), verts(j)) && adj(verts(j), verts(k)) && adj(verts(i), verts(k))
          } yield Set(verts(i), verts(j), verts(k))).toSet
          // exactly-once: the row count must equal the distinct-set count
          val n = Queries.triangleList(canon).count()
          got == expected && n == expected.size
        }
      }
    })
  }

  test("neighborhood function equals brute-force BFS ball sizes and is monotone in h") {
    check(Prop.forAll(genEdges) { es =>
      val edges = TestSpark.edgesDF(es.map { case (s, d) => (s, d, 0) })
      val got = Traversals.neighborhoodFunction(edges, maxH = 3)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val verts = (es.map(_._1) ++ es.map(_._2)).distinct
      val adj = es.distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      def ball(v: Long, h: Int): Set[Long] = {
        var s = Set(v)
        for (_ <- 1 to h) s = s ++ s.flatMap(x => adj.getOrElse(x, Set.empty))
        s
      }
      val expected = (0 to 3)
        .map(h => h -> verts.map(v => ball(v, h).size.toLong).sum).toMap
      got == expected && (0 until 3).forall(h => got(h) <= got(h + 1))
    })
  }

  test("landmark estimates upper-bound the true distance on symmetric graphs") {
    check(Prop.forAll(genEdges) { es =>
      val sym = (es ++ es.map(_.swap)).distinct
      val edges = TestSpark.edgesDF(sym.map { case (s, d) => (s, d, 0) })
      val got = Traversals.landmarkDistanceEstimates(
          edges, nLandmarks = 3, nProbes = 5, maxDepth = 3)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      def dist(u: Long, v: Long): Option[Int] = {
        var frontier = Set(u); var seen = Set(u); var d = 0
        while (frontier.nonEmpty && !seen.contains(v) && d < 20) {
          d += 1
          frontier = frontier.flatMap(x => adj.getOrElse(x, Set.empty)) -- seen
          seen = seen ++ frontier
        }
        if (seen.contains(v) && (v == u || d > 0)) Some(if (v == u) 0 else d) else None
      }
      got.forall { case ((u, v), est) =>
        dist(u, v) match {
          case Some(d) => est >= d // triangle upper bound
          case None    => false   // a common landmark implies a path exists
        }
      }
    })
  }

  test("count-min estimates always >= exact counts, exact side equals brute force") {
    check(Prop.forAll(genDocs) { ds =>
      val s = spark; import s.implicits._
      val got = TextOps.countMinHeavyHitters(ds.toDF("doc_id", "text"), k = 10)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val counts = ds.flatMap(_._2.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      got.forall { case (t, exact, est) =>
        est >= exact && counts.get(t).contains(exact)
      }
    })
  }
}
