package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-7 continuation #2: Markov transitions (r20), curriculum buckets
  * (x7), k-anonymity (t24), maximal matching (g23), schema-evolution
  * read (w8). */
class Round7cSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("markov transitions: exact ppm row-normalized counts") {
    val s = spark; import s.implicits._
    val base = 1700000000L * 1000000000L
    // user 1: a -> b -> a ; user 2: a -> b
    val ev = Seq(
      (1L, base + 1e9.toLong, 1L, "a", 0.0),
      (2L, base + 2e9.toLong, 1L, "b", 0.0),
      (3L, base + 3e9.toLong, 1L, "a", 0.0),
      (4L, base + 1e9.toLong, 2L, "a", 0.0),
      (5L, base + 2e9.toLong, 2L, "b", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    ev.write.mode("overwrite").parquet("/tmp/graft-r20-spec/events.parquet")
    val r = SparkEntry.queries("r20_markov_transitions")(spark, "/tmp/graft-r20-spec")
      .collect().map(x => (x.getString(0), x.getString(1)) -> (x.getLong(2), x.getLong(3))).toMap
    // transitions: a->b twice, b->a once
    assert(r(("a", "b")) == ((2L, 1000000L)))
    assert(r(("b", "a")) == ((1L, 1000000L)))
    assert(r.size == 2)
  }

  test("curriculumBuckets: value-coherent phases ordered by difficulty") {
    val s = spark; import s.implicits._
    // 4 docs: two all-common (difficulty 0), two all-rare (difficulty 1000)
    val d = Seq(
      (1L, "x x x"), (2L, "x x"), // 'x' freq 5 > maxFreq -> 0 rare
      (3L, "aaa bbb"), (4L, "ccc ddd")) // singletons -> all rare
      .toDF("doc_id", "text")
    val r = TextOps.curriculumBuckets(d, maxFreq = 2, phases = 4).collect()
      .map(x => x.getLong(0) -> (x.getLong(2), x.getLong(3))).toMap
    assert(r(1L) == ((0L, 0L)) && r(2L) == ((0L, 0L)))
    // the 1000-difficulty value starts at rank 2 of 4 -> phase 4*2/4 = 2
    assert(r(3L) == ((1000L, 2L)) && r(4L) == ((1000L, 2L)))
  }

  test("kAnonymity flags classes below k") {
    val s = spark; import s.implicits._
    val d = (1L to 6L).map(i => (i, "one two", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .unionByName(Seq((7L, "one two", "fr", "s1"))
        .toDF("doc_id", "text", "lang", "source"))
    val r = TextOps.kAnonymity(d, k = 5).collect()
      .map(x => (x.getString(0), x.getLong(3), x.getLong(4)))
    assert(r.toSet == Set(("en", 6L, 1L), ("fr", 1L, 0L)))
  }

  test("maximalMatching is a valid maximal matching") {
    val s = spark; import s.implicits._
    // path 1-2-3-4 plus isolated edge 5-6
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("src", "dst")
    val m = Traversals.maximalMatching(e).collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val verts = m.flatMap(p => Seq(p._1, p._2))
    assert(verts.distinct.length == verts.length) // no vertex matched twice
    assert(m.contains((5L, 6L))) // isolated edge must be matched (maximality)
    // maximality on the path: at least one of the three path edges matched,
    // and no two unmatched adjacent vertices remain
    val mv = verts.toSet
    val unmatchedEdges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
      .filter(p => !mv.contains(p._1) && !mv.contains(p._2))
    assert(unmatchedEdges.isEmpty)
  }

  test("schema-evolution read: merged schema nulls the pre-evolution rows") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-w8-spec").toString
    Seq((1L, 10L)).toDF("id", "v").write.mode("append").parquet(dir)
    Seq((2L, 20L, 7L)).toDF("id", "v", "quality").write.mode("append").parquet(dir)
    val r = spark.read.option("mergeSchema", "true").parquet(dir)
      .orderBy("id").collect()
    assert(r.length == 2)
    assert(r(0).isNullAt(r(0).fieldIndex("quality")))
    assert(r(1).getLong(r(1).fieldIndex("quality")) == 7L)
  }
}
