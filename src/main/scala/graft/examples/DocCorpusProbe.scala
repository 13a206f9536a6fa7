package graft.examples

import graft._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf10-class CORPUS envelope (COVERAGE r8 handoff #5): the dedup/ANN
  * families at 500k documents / 200k vectors — 100 content-disjoint
  * copies of sf0.1 built by [[MakeScale]] (`100 documents,embeddings`:
  * copy-tagged tokens, sign-flipped embeddings, so cross-copy near-dup
  * structure is zero and correct plans grow ~linearly in k).
  *
  * What the full-registry bench run at this fixture cannot show is the
  * LSH S-curve lesson this probe pins down: with the registry-default
  * 2 minhash rows per band, a random pair's per-band collision odds are
  * only squared, and on a low-entropy corpus (small shingle vocabulary)
  * the candidate set turns quadratic — measured 104M candidate pairs
  * over 494k collapsed docs (210 pairs/doc), which the downstream
  * shingle-intersection verify cannot absorb (it filled the disk at
  * ~10^10 intersection rows). The SAME pipeline at 4 rows per band
  * (j² → j⁴ per-band match probability) returns to near-dup-structure-
  * sized candidates and a flat verify. Production sizing:
  * r ≈ log(n) / log(1/j_bg) for background pair similarity j_bg.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<sf10docs dir> runMain
  *        graft.examples.DocCorpusProbe
  */
object DocCorpusProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft-sf10docs")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[corpus] $label%-28s $s%8.2f s   (rows=$n)")
      s
    }

    val docs = Tables.documents(spark, dir)
    println(s"== corpus probe: ${docs.count()} documents, dir=$dir ==")

    // collapse-first base (the d3b discipline) — on the content-disjoint
    // fixture every text is distinct, so this is the corpus itself and
    // the candidate volume below is PURE LSH behavior, not dup clusters
    val reps = Dedup.representatives(docs)
    val sh = Dedup.shingles(reps).localCheckpoint(true)
    println(s"[corpus] shingle rows: ${sh.count()}")

    // the S-curve measurement: candidate volume at r=2 (registry default,
    // 4 bands) vs r=4 (2 bands) over the SAME 8-hash signatures
    timed("candidates_r2_count") {
      Dedup.minhashCandidatesFrom(sh, rowsPerBand = 2).count()
    }
    System.gc()
    timed("candidates_r4_count") {
      Dedup.minhashCandidatesFrom(sh, rowsPerBand = 4).count()
    }
    System.gc()
    // full collapse-first verify at the scale-sized band width
    timed("d3b_verify_r4") {
      Dedup.jaccardVerifyFrom(sh, rowsPerBand = 4).count()
    }
    System.gc()
    // the e9 saturation fix: 120-bit fingerprint, 4×30-bit bands — the
    // same radius-3 pigeonhole guarantee with 2^15× fewer random band
    // collisions than e9's 60-bit 4×15 (94.6 s at this corpus)
    timed("e9b_wide_neardup") {
      Dedup.hammingNearDupPairsWide(docs).count()
    }
    spark.stop()
  }
}
