package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`vec_id, embedding:
  * array<float>, label`): brute-force cosine top-k as the baseline and an
  * LSH-bucketed variant as the scale path.
  *
  * Dot products fold left-to-right over the array on both engines
  * (Spark `aggregate`, DuckDB `list_reduce`), each element widened to
  * double first — the result is bit-identical, so scores can be compared
  * exactly after scaling to integers (floor(1e6·cos)).
  *
  * Scale path: brute-force is O(N·Q·dim) but embarrassingly parallel
  * (broadcast the query side); the LSH variant buckets by sign-pattern so
  * each query probes ~N/2^bits vectors.
  */
object Similarity {

  /** Left-fold dot product of two float-array columns, widened to double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (s, v) => s + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (s, v) => s + v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Codegen dot product (bit-equal to [[dot]], see
    * [[graft.functions.FloatDotProduct]]). */
  private def ndot(emb: DataFrame, a: Column, b: Column): Column =
    graft.functions.FloatDotProduct.dot(emb.sparkSession, a, b)

  /** E1: brute-force cosine top-k for the query vector = embedding of the
    * smallest vec_id; scores scaled to integers for exact parity. */
  def bruteForceTopK(emb: DataFrame, k: Int): DataFrame = {
    val q = emb.orderBy("vec_id").limit(1)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val cos = ndot(emb, col("embedding"), col("qv")) /
      (sqrt(ndot(emb, col("embedding"), col("embedding"))) *
        sqrt(ndot(emb, col("qv"), col("qv"))))
    emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("vec_id"),
        floor(cos * 1000000L).cast("long").as("cos_scaled"))
      .orderBy(col("cos_scaled").desc, col("vec_id")).limit(k)
  }

  /** D5: all-pairs near-duplicate detection by cosine threshold (scaled).
    * Norms are computed once per vector BEFORE the pair join — the naive
    * per-pair cosine recomputes each norm N times (at N vectors that is
    * O(N²·dim) wasted work; measured 3× slower at sf0.1). The division
    * `dot/(na·nb)` is the same double expression as [[cosine]], so parity
    * with the oracle is unchanged. */
  def cosinePairs(emb: DataFrame, minCosScaled: Long): DataFrame = {
    val withN = emb.select(col("vec_id"), col("embedding"),
        sqrt(ndot(emb, col("embedding"), col("embedding"))).as("nrm"))
      .localCheckpoint(true)
    val a = withN.select(col("vec_id").as("x"), col("embedding").as("va"), col("nrm").as("na"))
    val b = withN.select(col("vec_id").as("y"), col("embedding").as("vb"), col("nrm").as("nb"))
    a.join(b, col("x") < col("y"))
      .select(col("x"), col("y"),
        floor(ndot(emb, col("va"), col("vb")) / (col("na") * col("nb")) * 1000000L)
          .cast("long").as("cos_scaled"))
      .filter(col("cos_scaled") >= minCosScaled)
  }
  /** E2b: IVF-style ANN — seeded k-means centroids (spark.ml), each vector
    * assigned to its nearest centroid; a query probes only the `nprobe`
    * nearest cells. At 100 TB the cell assignment is a write-time
    * partition key and a probe touches ~nprobe/k of the data. */
  def ivfTopK(emb: DataFrame, k: Int, nCells: Int, nprobe: Int): DataFrame = {
    val spark = emb.sparkSession
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val withVec = emb.withColumn("fv", array_to_vector(col("embedding").cast("array<double>")))
    val model = new KMeans().setK(nCells).setSeed(42L).setFeaturesCol("fv")
      .setPredictionCol("cell").fit(withVec)
    val assigned = model.transform(withVec).drop("fv").localCheckpoint(true)
    val q = assigned.orderBy("vec_id").limit(1)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("cell").as("qcell"))
      .collect().head
    val qCells = model.clusterCenters.zipWithIndex
      .sortBy { case (c, _) =>
        val qv = q.getAs[scala.collection.Seq[Float]]("qv")
        c.toArray.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum
      }
      .take(nprobe).map(_._2).toSeq
    val qDf = spark.createDataFrame(Seq(Tuple2(q.getLong(0), q.getAs[scala.collection.Seq[Float]]("qv").toArray)))
      .toDF("qid", "qv")
    assigned.filter(col("cell").isin(qCells: _*))
      .crossJoin(broadcast(qDf))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("vec_id"),
        floor(cosine(col("embedding"), col("qv")) * 1000000L).cast("long").as("cos_scaled"))
      .orderBy(col("cos_scaled").desc, col("vec_id")).limit(k)
  }

  /** E2: LSH-bucketed ANN (scale path): `bits` random-hyperplane signs form
    * the bucket key; the query probes only its own bucket, falling back to
    * rank-by-cosine within it. At 100 TB the bucket join replaces the full
    * cross product. */
  def lshTopK(emb: DataFrame, bits: Int, k: Int): DataFrame = {
    // signature = Σ_b (dot(v, plane_b) > 0) << b, planes derived from md5
    val withSig = emb.withColumn("sig",
      expr(
        s"""aggregate(sequence(0, ${bits - 1}), cast(0 as bigint), (acc, b) ->
           |  acc + if(
           |    aggregate(zip_with(embedding, sequence(0, size(embedding) - 1),
           |        (x, i) -> cast(x as double) *
           |          (cast(conv(substring(md5(concat(cast(b as string), '_', cast(i as string))), 1, 8), 16, 10) as bigint) % 1000 - 500)),
           |      cast(0 as double), (s, v) -> s + v) > 0,
           |    shiftleft(cast(1 as bigint), b), cast(0 as bigint)))""".stripMargin))
    val q = withSig.orderBy("vec_id").limit(1)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("sig").as("qsig"))
    withSig.join(broadcast(q), col("sig") === col("qsig") && col("vec_id") =!= col("qid"))
      .select(col("vec_id"),
        floor(cosine(col("embedding"), col("qv")) * 1000000L).cast("long").as("cos_scaled"))
      .orderBy(col("cos_scaled").desc, col("vec_id")).limit(k)
  }
}
