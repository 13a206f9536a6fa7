package graft

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}

/** Durable, versioned edge store — the Spark re-expression of the
  * reference's LSM shard machinery (reference GraphChiDatabase.scala:622-795
  * buffer flush + merge, DiskShard.mergeToAndClear:309-420, FastSharder
  * shard writer:55-198).
  *
  * Layout under `root/`:
  *  - `v<N>/b<i>/…parquet`  bucket files: range-bucketed by `src` (bucket
  *    bounds fixed at create time), sorted by (src, dst) within each file
  *    so parquet row-group stats prune point/range reads — the sorted
  *    shard of the reference.
  *  - `v<N>/delta…/…parquet`  delta files: raw appended micro-batches
  *    (each one a flushed EdgeBuffer), unsorted, merged away by
  *    [[compact]] — the LSM level-0.
  *  - `manifest/v<N>.tsv`  immutable manifest: the exact file set of
  *    version N plus per-file (srcMin, srcMax, dstMin, dstMax) stats for
  *    file-level pruning and mutation routing.
  *  - `VERSION`  the version pointer, flipped atomically (tmp + rename)
  *    after a new manifest is fully written — readers never observe a
  *    partial commit.
  *
  * Every mutation is copy-on-write: it reads a BASE version, rewrites only
  * the files its predicate can touch (routed via manifest stats), reuses
  * the untouched files by reference, and commits a NEW version. Old
  * versions stay readable forever (time travel), which also makes
  * concurrent registry entries order-independent — each derives from the
  * version it was handed, never from a shared mutable head.
  *
  * Scale notes: the manifest/pointer commit is driver-side local-fs here;
  * on a cluster the same two-phase shape (write immutable files, then
  * atomically swing a pointer) is what object-store table formats do — the
  * design carries over, only the pointer swap needs a conditional-put.
  * Bucket count is fixed at create; a 100 TB store would split/merge
  * buckets during compaction using the same manifest mechanics.
  */
class DurableStore(val spark: SparkSession, val root: String) {
  import DurableStore._

  def currentVersion: Int =
    new String(Files.readAllBytes(Paths.get(root, "VERSION"))).trim.toInt

  def manifest(v: Int): Manifest = readManifest(root, v)

  /** The full edge table at version `v` — union of all live files. */
  def read(v: Int): DataFrame =
    readFiles(spark, manifest(v).files.map(_.path))

  def readLatest(): DataFrame = read(currentVersion)

  /** Point read pruned at the FILE level via manifest stats (the
    * interval→shard routing of reference VertexInterval.java:50-78);
    * row-group stats inside the chosen files prune further. */
  def readForSrc(v: Int, src: Long): DataFrame = {
    val m = manifest(v)
    val hit = m.files.filter(f => src >= f.srcMin && src <= f.srcMax)
    if (hit.isEmpty) read(v).limit(0) else readFiles(spark, hit.map(_.path))
  }

  /** S1 durable append: the batch becomes one delta file set (stats
    * recorded, rows untouched) — the flush of one EdgeBuffer. O(batch),
    * no base files rewritten. */
  def append(fromV: Int, batch: DataFrame): Int = commit(fromV) { (m, nv) =>
    val b = batch.localCheckpoint(true)
    val f = writeOne(b, s"$root/v$nv/delta", bucket = -1, sorted = false)
    m.files :+ f
  }

  /** P3 durable updateEdge: conditional column rewrite, copy-on-write on
    * the files whose src range can contain `srcKey` (all files when no
    * key is given). */
  def updateEdges(fromV: Int, pred: Column, column: String, value: Column,
                  srcKey: Option[Long] = None): Int =
    rewrite(fromV, touches(srcKey, None),
      df => df.withColumn(column, when(pred, value).otherwise(col(column))))

  /** P4 durable deleteEdges. */
  def deleteEdges(fromV: Int, pred: Column, srcKey: Option[Long] = None,
                  dstKey: Option[Long] = None): Int =
    rewrite(fromV, touches(srcKey, dstKey), _.filter(!pred))

  /** P5 durable deleteVertex: touches files covering v on EITHER endpoint
    * (the src-sorted layout prunes the src side; the dst side falls back
    * to per-file dst stats, broad by construction — the reference pays the
    * same cost via its per-shard in-edge index). */
  def deleteVertex(fromV: Int, v: Long): Int =
    rewrite(fromV,
      f => (v >= f.srcMin && v <= f.srcMax) || (v >= f.dstMin && v <= f.dstMax),
      _.filter(col("src") =!= v && col("dst") =!= v))

  /** LSM compaction: route delta rows to their buckets, merge each hit
    * bucket's files with its delta rows into fresh (src, dst)-sorted
    * files, drop all deltas. Buckets with no delta rows are reused by
    * reference. A week of micro-batch appends bin-packs back to one file
    * set per bucket. */
  def compact(fromV: Int): Int = {
    val m = manifest(fromV)
    val deltas = m.files.filter(!_.sorted)
    if (deltas.isEmpty) return fromV
    commit(fromV) { (_, nv) =>
      val keep = m.files.filter(_.sorted)
      val d = readFiles(spark, deltas.map(_.path))
        .withColumn("_b", bucketCol(m.bounds)).localCheckpoint(true)
      val hitBuckets = d.select("_b").distinct().collect().map(_.getInt(0)).toSet
      val (hit, untouched) = keep.partition(f => hitBuckets.contains(f.bucket))
      val merged = hit.groupBy(_.bucket).toSeq.sortBy(_._1).map { case (b, fs) =>
        val df = readFiles(spark, fs.map(_.path))
          .unionByName(d.filter(col("_b") === b).drop("_b"))
        writeOne(df, s"$root/v$nv/b$b", b, sorted = true)
      }
      // delta rows may land in buckets that had no base file yet
      val fresh = (hitBuckets -- hit.map(_.bucket)).toSeq.sorted.map { b =>
        writeOne(d.filter(col("_b") === b).drop("_b"), s"$root/v$nv/b$b", b, sorted = true)
      }
      untouched ++ merged ++ fresh
    }
  }

  def asGraph(vertices: DataFrame, v: Int): GraphDB =
    new GraphDB(spark, read(v), vertices)

  // ---- internals ----

  private def touches(srcKey: Option[Long], dstKey: Option[Long])(f: StoreFile): Boolean =
    srcKey.forall(k => k >= f.srcMin && k <= f.srcMax) &&
      dstKey.forall(k => k >= f.dstMin && k <= f.dstMax)

  /** Copy-on-write core: rewrite files matched by `touch` with `f`, reuse
    * the rest, commit a new manifest. Bucket files stay sorted; delta
    * files are rewritten in place as (smaller) deltas. */
  private def rewrite(fromV: Int, touch: StoreFile => Boolean,
                      f: DataFrame => DataFrame): Int = commit(fromV) { (m, nv) =>
    val (hit, keep) = m.files.partition(touch)
    val out = hit.zipWithIndex.map { case (sf, i) =>
      val df = f(readFiles(spark, Seq(sf.path)))
      if (sf.sorted) writeOne(df, s"$root/v$nv/b${sf.bucket}_$i", sf.bucket, sorted = true)
      else writeOne(df, s"$root/v$nv/delta_$i", bucket = -1, sorted = false)
    }
    keep ++ out
  }

  /** Allocate the next version, build its file list, write the manifest,
    * flip the pointer. The JVM-level lock stands in for the conditional
    * pointer swap a shared deployment would use. */
  private def commit(fromV: Int)(build: (Manifest, Int) => Seq[StoreFile]): Int =
    DurableStore.synchronized {
      val m = manifest(fromV)
      val nv = currentVersion + 1
      val files = build(m, nv)
      writeManifest(root, Manifest(nv, m.bounds, files))
      setPointer(root, nv)
      nv
    }

  private def writeOne(df: DataFrame, dir: String, bucket: Int, sorted: Boolean): StoreFile =
    DurableStore.writeOne(df, dir, bucket, sorted)
}

object DurableStore {
  /** One immutable parquet file set (a directory Spark wrote) plus the
    * stats that route mutations and prune point reads. */
  final case class StoreFile(bucket: Int, path: String, srcMin: Long, srcMax: Long,
                             dstMin: Long, dstMax: Long, sorted: Boolean)
  final case class Manifest(version: Int, bounds: Seq[Long], files: Seq[StoreFile])

  /** src → bucket index against the create-time upper bounds: the number
    * of bounds strictly below src (last bound = Long.MaxValue covers the
    * tail). Pure array arithmetic — codegen-friendly, no join. */
  def bucketCol(bounds: Seq[Long]): Column =
    aggregate(
      array(bounds.dropRight(1).map(lit(_)): _*),
      lit(0),
      (acc, b) => acc + when(col("src") > b, 1).otherwise(0)).cast("int")

  /** Create version 1 from a full edge table: range-bucket by src (bounds
    * from quantiles, deduplicated), one sorted file set per bucket.
    * ONE shuffled write (repartition on bucket, sort within, partitionBy)
    * plus one stats aggregation — not a scan per bucket; this is the
    * full-table path, it must scale like a bulk load. */
  def create(spark: SparkSession, edges: DataFrame, root: String,
             numBuckets: Int = 8): DurableStore = {
    val e = edges.localCheckpoint(true)
    val qs = e.stat.approxQuantile("src",
      (1 to numBuckets).map(_.toDouble / numBuckets).toArray, 0.01)
      .map(_.toLong).distinct.sorted
    val bounds = (qs.dropRight(1) :+ Long.MaxValue).toSeq
    val eb = e.withColumn("_b", bucketCol(bounds))
    eb.repartition(col("_b")).sortWithinPartitions("_b", "src", "dst")
      .write.mode(SaveMode.Overwrite).partitionBy("_b").parquet(s"$root/v1")
    val files = eb.groupBy("_b")
      .agg(min("src").cast("long"), max("src").cast("long"),
           min("dst").cast("long"), max("dst").cast("long"))
      .collect().sortBy(_.getInt(0)).toSeq.map { r =>
        StoreFile(r.getInt(0), s"$root/v1/_b=${r.getInt(0)}",
          r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), sorted = true)
      }
    Files.createDirectories(Paths.get(root, "manifest"))
    writeManifest(root, Manifest(1, bounds, files))
    setPointer(root, 1)
    new DurableStore(spark, root)
  }

  private def writeOne(df: DataFrame, dir: String, bucket: Int, sorted: Boolean): StoreFile = {
    val d = df.localCheckpoint(true)
    val out =
      if (sorted) d.repartition(1).sortWithinPartitions("src", "dst")
      else d
    out.write.mode(SaveMode.Overwrite).parquet(dir)
    val st = d.agg(
      coalesce(min("src"), lit(Long.MaxValue)), coalesce(max("src"), lit(Long.MinValue)),
      coalesce(min("dst"), lit(Long.MaxValue)), coalesce(max("dst"), lit(Long.MinValue))).head()
    StoreFile(bucket, dir, st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3), sorted)
  }

  private def readFiles(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.parquet(paths: _*)

  private def manifestPath(root: String, v: Int) = Paths.get(root, "manifest", s"v$v.tsv")

  private def writeManifest(root: String, m: Manifest): Unit = {
    Files.createDirectories(Paths.get(root, "manifest"))
    val lines =
      s"version\t${m.version}" +:
      s"bounds\t${m.bounds.mkString(",")}" +:
      m.files.map(f =>
        s"file\t${f.bucket}\t${f.sorted}\t${f.srcMin}\t${f.srcMax}\t${f.dstMin}\t${f.dstMax}\t${f.path}")
    Files.write(manifestPath(root, m.version), lines.mkString("\n").getBytes,
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
  }

  private def readManifest(root: String, v: Int): Manifest = {
    val lines = new String(Files.readAllBytes(manifestPath(root, v))).split("\n")
    val bounds = lines.collectFirst { case l if l.startsWith("bounds\t") =>
      l.split("\t")(1).split(",").map(_.toLong).toSeq }.get
    val files = lines.toSeq.filter(_.startsWith("file\t")).map { l =>
      val p = l.split("\t")
      StoreFile(p(1).toInt, p(7), p(3).toLong, p(4).toLong, p(5).toLong, p(6).toLong,
        p(2).toBoolean)
    }
    Manifest(v, bounds, files)
  }

  /** Atomic pointer flip: write aside, rename over. */
  private def setPointer(root: String, v: Int): Unit = {
    val tmp = Paths.get(root, "VERSION.tmp")
    Files.write(tmp, v.toString.getBytes)
    Files.move(tmp, Paths.get(root, "VERSION"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }
}
