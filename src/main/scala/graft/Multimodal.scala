package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for the training-data pipeline surface:
  * media payloads are opaque `binary` columns with typed metadata, and the
  * decode / feature-extract steps run as typed `mapPartitions` over
  * batches — the Spark-side schema, partitioning and batch shape are real;
  * only the codec itself is a clearly-marked deterministic STUB (no media
  * libraries in this container).
  *
  * At scale the pattern is: keep payloads in their own column (Parquet
  * stores them contiguously), partition by content id, and run decode as a
  * narrow per-partition transform — no shuffle is introduced.
  */
object Multimodal {

  /** An opaque media row: payload + source id. */
  case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Extracted metadata (the "decoded" features). */
  case class MediaMeta(doc_id: Long, byte_len: Long, fake_width: Long,
                       fake_height: Long, fp: String)

  /** Build a binary media column from the documents table (stand-in for
    * image/audio payload ingestion). */
  def asMedia(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")).as[MediaRow]
  }

  /** STUB decoder: a real codec would parse the container header here.
    * The deterministic fake derives "dimensions" from the byte length so
    * the pipeline (and its oracle) stay testable end-to-end. */
  private def decodeStub(payload: Array[Byte]): (Long, Long) = {
    val n = payload.length.toLong
    (n % 640, n / 640)
  }

  private def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"$b%02x").mkString

  /** Decode + feature-extract as a typed per-partition batch transform —
    * the mapPartitions boundary is where a Pandas-UDF/NJPEG/ffmpeg batch
    * call would sit. */
  def extractMeta(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h) = decodeStub(r.payload)
        MediaMeta(r.doc_id, r.payload.length.toLong, w, h, md5hex(r.payload))
      }
    }
  }

  /** End-to-end media metadata pipeline over documents. */
  def metaPipeline(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    extractMeta(asMedia(Tables.documents(spark, dir))).toDF()
  }

  /** One sampled "frame": parent id, frame index, the frame's byte slice
    * length and its fingerprint. */
  case class FrameRow(doc_id: Long, frame_idx: Long, frame_len: Long, frame_fp: String)

  /** Frame sampling (video → every k-th frame): the payload is cut into
    * fixed-size "frames" and every `stride`-th one is emitted. A real
    * implementation swaps the slicing for an ffmpeg/decoder batch call at
    * the same mapPartitions boundary; the 1→N row fan-out, typed output
    * schema, and narrow (shuffle-free) execution are the production shape.
    * Deterministic (byte slices + md5) so an oracle can mirror it. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int, stride: Int)
                  (implicit spark: SparkSession): Dataset[FrameRow] = {
    require(frameBytes > 0, "frameBytes must be positive")
    require(stride > 0, "stride must be positive")
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val nFrames = (r.payload.length + frameBytes - 1) / frameBytes
        (0 until nFrames by stride).iterator.map { f =>
          val from = f * frameBytes
          val until = math.min(from + frameBytes, r.payload.length)
          val slice = java.util.Arrays.copyOfRange(r.payload, from, until)
          FrameRow(r.doc_id, f.toLong, slice.length.toLong, md5hex(slice))
        }
      }
    }
  }

  /** "Resize" / re-encode step (image → thumbnail): a real codec call
    * would sit in the partition batch; the deterministic stand-in keeps
    * every `ratio`-th byte, preserving the binary-in/binary-out column
    * shape so downstream stages (storage, dedup over `fp`) are exercised
    * for real. */
  def resizeStub(media: Dataset[MediaRow], ratio: Int)
                (implicit spark: SparkSession): Dataset[MediaRow] = {
    require(ratio > 0, "ratio must be positive")
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val out = new Array[Byte]((r.payload.length + ratio - 1) / ratio)
        var i = 0
        while (i < out.length) { out(i) = r.payload(i * ratio); i += 1 }
        MediaRow(r.doc_id, out)
      }
    }
  }

  /** End-to-end frame-sample pipeline over documents (m2). */
  def framePipeline(spark: SparkSession, dir: String,
                    frameBytes: Int = 16, stride: Int = 2): DataFrame = {
    implicit val s: SparkSession = spark
    sampleFrames(asMedia(Tables.documents(spark, dir)), frameBytes, stride).toDF()
  }

  /** One analysis window: parent id, window index, length, and a
    * per-window scalar feature ("energy" = byte sum). */
  case class WindowRow(doc_id: Long, win_idx: Long, win_len: Long, energy: Long)

  /** Audio-shaped feature extraction: OVERLAPPING windows (hop < window,
    * the STFT/MFCC access pattern — unlike [[sampleFrames]]' disjoint
    * strided frames) with a per-window scalar computed from the raw
    * bytes. A real pipeline swaps the byte-sum for the DSP batch call at
    * this same mapPartitions boundary; the windowing arithmetic, 1→N
    * fan-out and narrow execution are the production shape, and the
    * deterministic byte-sum keeps it oracle-expressible. */
  def windowFeatures(media: Dataset[MediaRow], winBytes: Int, hopBytes: Int)
                    (implicit spark: SparkSession): Dataset[WindowRow] = {
    require(winBytes > 0 && hopBytes > 0, "winBytes and hopBytes must be positive")
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val n = r.payload.length
        (0 until n by hopBytes).iterator.map { from =>
          val until = math.min(from + winBytes, n)
          var e = 0L
          var i = from
          while (i < until) { e += r.payload(i) & 0xFF; i += 1 }
          WindowRow(r.doc_id, (from / hopBytes).toLong, (until - from).toLong, e)
        }
      }
    }
  }

  /** End-to-end windowed-feature pipeline over documents (m3). */
  def windowPipeline(spark: SparkSession, dir: String,
                     winBytes: Int = 32, hopBytes: Int = 16): DataFrame = {
    implicit val s: SparkSession = spark
    windowFeatures(asMedia(Tables.documents(spark, dir)), winBytes, hopBytes).toDF()
  }

  /** M5: perceptual block-hash over the media payload — a REAL perceptual
    * hash (the blockhash family: Yang et al. '06 shape on raw bytes, what
    * pHash does on DCT coefficients): split the payload into 60 equal
    * byte blocks; bit b = 1 iff 60·sum(block b) > Σ all bytes (block
    * above the mean). Unlike a cryptographic digest, a small payload edit
    * flips only the bits of the touched blocks, so near-identical media
    * land within small Hamming distance — exactly the property the e9
    * banded join exploits downstream. Runs inside the typed mapPartitions
    * codec slot (where a real decoder's DCT would sit); the comparison is
    * exact integers, so the oracle reproduces every bit.
    *
    * Block boundaries: block b covers byte positions [b·n/60, (b+1)·n/60)
    * (integer division) — empty when n < 60 spreads thin; empty blocks
    * sum 0. */
  case class MediaHash(doc_id: Long, simhash: Long)
  def blockHash(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[MediaHash] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val n = r.payload.length
        var total = 0L
        var i = 0
        while (i < n) { total += r.payload(i) & 0xFF; i += 1 }
        var h = 0L
        var b = 0
        while (b < 60) {
          // Long arithmetic: b * n overflows Int for payloads ≥ ~36 MB —
          // exactly the large-media regime this operator targets
          val from = (b.toLong * n / 60).toInt
          val until = ((b + 1).toLong * n / 60).toInt
          var s = 0L
          var j = from
          while (j < until) { s += r.payload(j) & 0xFF; j += 1 }
          if (60L * s > total) h |= 1L << b
          b += 1
        }
        MediaHash(r.doc_id, h)
      }
    }
  }

  /** M5 pipeline: payload → blockhash → e9 banded Hamming near-dup
    * pairs. The only corpus-sized exchange is the band join. */
  def phashNearDup(spark: SparkSession, dir: String, radius: Int = 3,
                   nBands: Int = 4): DataFrame = {
    implicit val s: SparkSession = spark
    Dedup.hammingPairsFrom(
      blockHash(asMedia(Tables.documents(spark, dir))).toDF(),
      radius, nBands)
  }
}
