package graft.registry

import graft._
import org.apache.spark.sql.SparkSession

/** Similarity-search queries over `embeddings` — see [[graft.Similarity]].
  * e1 is the exact brute-force baseline (oracle-checked); e2 is the
  * LSH-bucketed scale path (seeded-deterministic in Spark; the bucketing
  * is not worth replicating in SQL — rows-only check). */
object VectorQueries {
  val entries: Seq[QueryEntry] = Seq(

    ("e1_ann_bruteforce_topk",
      (s: SparkSession, d: String) =>
        Similarity.bruteForceTopK(Tables.embeddings(s, d), k = 10),
      Some(
        """WITH q AS (SELECT vec_id AS qid, embedding AS qv
          |           FROM embeddings ORDER BY vec_id LIMIT 1)
          |SELECT e.vec_id,
          |  CAST(floor(
          |    list_reduce(list_transform(list_zip(e.embedding, q.qv),
          |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), (s, v) -> s + v)
          |    / (sqrt(list_reduce(list_transform(e.embedding,
          |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (s, v) -> s + v))
          |     * sqrt(list_reduce(list_transform(q.qv,
          |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (s, v) -> s + v)))
          |    * 1000000) AS BIGINT) AS cos_scaled
          |FROM embeddings e, q WHERE e.vec_id <> q.qid
          |ORDER BY cos_scaled DESC, e.vec_id LIMIT 10""".stripMargin)),

    ("e2_ann_lsh_topk",
      (s: SparkSession, d: String) =>
        Similarity.lshTopK(Tables.embeddings(s, d), bits = 4, k = 10),
      None),

    ("e3_ann_ivf_topk",
      (s: SparkSession, d: String) =>
        Similarity.ivfTopK(Tables.embeddings(s, d), k = 10, nCells = 16, nprobe = 4),
      None),
  )
}
