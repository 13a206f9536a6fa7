package graft

import org.scalatest.funsuite.AnyFunSuite

/** C11: seeded Lloyd k-means — separable clusters resolve, rerun is
  * deterministic, and every vector lands somewhere (partition property). */
class KmeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def emb(rows: (Long, Seq[Float])*) = {
    val s = spark; import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("two separable blobs split into two clusters covering all vectors") {
    val near0 = Seq(0.01f, 0.02f)
    val near1 = Seq(0.9f, 0.95f)
    val e = emb(
      1L -> Seq(0.0f, 0.0f), 2L -> near0, 3L -> Seq(0.03f, 0.01f),
      10L -> Seq(1.0f, 1.0f), 11L -> near1, 12L -> Seq(0.97f, 0.99f))
    val got = Similarity.lloydKmeans(e, k = 2, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.toSeq.map(_._2).sum == 6L, s"every vector assigned: $got")
    // one cluster sums the low ids (1+2+3), the other the high (10+11+12)
    assert(got.map(_._3) == Set(6L, 33L), s"blobs not separated: $got")
  }

  test("rerun equality (no RNG anywhere)") {
    val e = emb((1L to 20L).map(i =>
      i -> Seq((i % 7).toFloat / 7f, (i % 3).toFloat / 3f)): _*)
    val run = () => Similarity.lloydKmeans(e, k = 4, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run() == run())
  }
}
