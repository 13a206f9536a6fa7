package graft.examples

import graft._
import org.apache.spark.sql.SparkSession

/** Recall tuning probe for the e12 product-quantization path: sweeps
  * (m, ksub, cand) against the e1 brute-force truth on both small
  * fixtures. PQ with md5-sampled (untrained) codebooks on the
  * deliberately-weak fixture (planted pairs at cos≈0.4–0.5) is the
  * hardest regime — production corpora with real cluster structure and
  * trained codebooks sit well above these floors. The registry's
  * (PqM, PqKsub, PqCand) choice is pinned from this sweep.
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = Tables.embeddings(spark, dir)
      val brute = Similarity.bruteForceTopK(emb, 10)
        .collect().map(_.getLong(0)).toSet
      for ((m, ksub, cand) <- Seq((8, 16, 50), (8, 32, 50), (8, 64, 50),
                                  (8, 16, 100), (8, 32, 100), (4, 32, 50))) {
        val pq = Similarity.pqTopK(emb, k = 10, cand = cand, m = m, ksub = ksub)
          .collect().map(_.getLong(0)).toSet
        println(s"PQPROBE dir=$dir m=$m ksub=$ksub cand=$cand recall@10=${(pq & brute).size}")
      }
    }
    spark.stop()
  }
}
