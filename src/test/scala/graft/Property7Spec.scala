package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

/** Property tests for the round-7 final-wave operators: results on random
  * small inputs must equal brute-force Scala reference computations. */
class Property7Spec extends AnyFunSuite {
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

  val genDocs: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.nonEmptyListOf(
      Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")).map(_.mkString(" ")))

  test("chunking covers every token exactly and respects window boundaries") {
    check(Prop.forAll(genDocs) { texts =>
      val s = spark; import s.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = TextOps.chunkDocs(docs, window = 4, stride = 2).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      got.groupBy(_._1).forall { case (id, chunks) =>
        val toks = texts(id.toInt).split(" ").toSeq
        val expect = (0 to (toks.length - 1) / 2).map { ci =>
          val sl = toks.slice(ci * 2, math.min(ci * 2 + 4, toks.length))
          (id, ci.toLong, sl.length.toLong, TestSpark.md5Hex(sl.mkString(" ")))
        }
        chunks.sortBy(_._2).toSeq == expect
      }
    })
  }

  test("maximal matching is valid and maximal on random graphs") {
    check(Prop.forAll(genEdges) { es =>
      val s = spark; import s.implicits._
      val canon = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter(e => e._1 != e._2).distinct
      if (canon.isEmpty) true
      else {
        val m = Traversals.maximalMatching(canon.toDF("src", "dst")).collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        val mv = m.flatMap(p => Seq(p._1, p._2))
        val valid = mv.distinct.length == mv.length &&
          m.forall(p => canon.contains(p))
        val maximal = canon.forall(e =>
          mv.contains(e._1) || mv.contains(e._2))
        valid && maximal
      }
    })
  }

  test("katz equals brute-force attenuated walk counting") {
    check(Prop.forAll(genEdges) { es =>
      val s = spark; import s.implicits._
      val got = Traversals.katzCentrality(es.toDF("src", "dst"), k = 50)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // brute force: w1/w2/w3 walk counts over the MULTI edge list
      def step(prev: Map[Long, Long]): Map[Long, Long] =
        es.flatMap { case (u, v) => prev.get(u).map(w => v -> w) }
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val w1 = es.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val w2 = step(w1)
      val w3 = step(w2)
      val ids = w1.keySet ++ w2.keySet ++ w3.keySet
      val expect = ids.map(v => v ->
        (4 * w1.getOrElse(v, 0L) + 2 * w2.getOrElse(v, 0L) + w3.getOrElse(v, 0L))).toMap
      got == expect
    })
  }

  test("PIT features equal per-label brute-force over strictly earlier events") {
    val genEvents: Gen[List[(Long, Long, Long, String, Double)]] =
      Gen.nonEmptyListOf(for {
        u <- Gen.choose(1L, 3L)
        t <- Gen.choose(1L, 50L)
        ty <- Gen.oneOf("view", "click", "purchase")
        v <- Gen.choose(1, 99)
      } yield (u, t, ty, v)).map(_.zipWithIndex.map { case ((u, t, ty, v), i) =>
        (i.toLong, 1700000000L * 1000000000L + t * 1000000000L, u, ty, v / 1.0)
      })
    check(Prop.forAll(genEvents) { evs =>
      val s = spark; import s.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-pit-prop").toString
      evs.toDF("event_id", "ts", "user_id", "event_type", "value")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = SparkEntry.queries("x6_feature_join_pit")(spark, dir)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(3), r.getLong(4), r.getString(5))).toMap
      // brute force per purchase: order by (ts_us, event_id)
      val ordered = evs.sortBy(e => (e._2 / 1000, e._1))
      val expect = ordered.zipWithIndex.collect {
        case ((id, ts, u, "purchase", _), idx) =>
          val prior = ordered.take(idx).filter(_._3 == u)
          id -> (prior.size.toLong,
            prior.map(e => math.round(e._5 * 100)).sum,
            prior.lastOption.map(_._4).getOrElse("none"))
      }.toMap
      got == expect
    })
  }

  test("containment bounds: inter <= min(n_a, n_b) and ppm in [0, 1e6]") {
    check(Prop.forAll(genDocs) { texts =>
      val s = spark; import s.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val rows = Dedup.containmentVerify(docs, allPairs = true).collect()
      rows.forall { r =>
        val (na, nb, inter) = (r.getLong(2), r.getLong(3), r.getLong(4))
        val (cab, cba) = (r.getLong(5), r.getLong(6))
        inter <= math.min(na, nb) &&
          cab >= 0 && cab <= 1000000 && cba >= 0 && cba <= 1000000 &&
          (inter != na || cab == 1000000L)
      }
    })
  }
}
