package graft.registry

import graft._
import org.apache.spark.sql.SparkSession

/** Similarity-search queries over `embeddings` — see [[graft.Similarity]].
  * e1 is the exact brute-force baseline; e2 (multi-probe hyperplane LSH)
  * and e3 (deterministic sampled-centroid IVF) are the bucketed scale
  * paths. All three are fully oracle-checked: the md5-derived planes and
  * rank-ordered centroids are engine-independent, so DuckDB reproduces the
  * exact candidate sets. e4/e5 pin recall@10 of each ANN variant against
  * the brute-force truth as an oracle-checked count. */
object VectorQueries {

  // cell-partitioned IVF store, written once per (session, fixture dir)
  private val ivfStores =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def ivfStorePath(s: SparkSession, d: String): String =
    ivfStores.computeIfAbsent(s"${s.sparkContext.applicationId}|$d", _ => {
      val path = java.nio.file.Files.createTempDirectory("graft-ivf").toString
      Similarity.ivfStoreWrite(Tables.embeddings(s, d), path, nCells = 16)
      path
    })

  /** Exact scaled cosine between two embedding columns (DuckDB fragment). */
  private[registry] def cosSql(a: String, b: String): String =
    s"""CAST(floor(
       |      list_reduce(list_transform(list_zip($a, $b),
       |        z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), (s, v) -> s + v)
       |      / (sqrt(list_reduce(list_transform($a,
       |           x2 -> CAST(x2 AS DOUBLE) * CAST(x2 AS DOUBLE)), (s, v) -> s + v))
       |       * sqrt(list_reduce(list_transform($b,
       |           x2 -> CAST(x2 AS DOUBLE) * CAST(x2 AS DOUBLE)), (s, v) -> s + v)))
       |      * 1000000) AS BIGINT)""".stripMargin

  /** Query vector = smallest vec_id (shared by e1/e2/e3). */
  private val Q =
    "q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings ORDER BY vec_id LIMIT 1)"

  /** Brute-force top-10 (e1's result as a CTE). */
  private val BRUTE =
    s"""brute AS (
       |  SELECT e.vec_id, ${cosSql("e.embedding", "q.qv")} AS cos_scaled
       |  FROM embeddings e, q WHERE e.vec_id <> q.qid
       |  ORDER BY cos_scaled DESC, e.vec_id LIMIT 10)""".stripMargin

  /** 6-bit hyperplane signature per vector (mirrors Similarity.lshTopK). */
  private val SIG =
    """sg AS (
      |  SELECT vec_id,
      |    list_reduce(list_transform(range(0, 6), b ->
      |      CASE WHEN list_reduce(list_transform(range(1, len(embedding) + 1),
      |        i -> CAST(embedding[i] AS DOUBLE) *
      |             (CAST(('0x' || substr(md5(b || '_' || (i - 1)), 1, 8)) AS BIGINT) % 1000 - 500)),
      |        (s, v) -> s + v) > 0
      |      THEN CAST(1 AS BIGINT) << b ELSE CAST(0 AS BIGINT) END),
      |      (s, v) -> s + v) AS sig
      |  FROM embeddings),
      |qs AS (SELECT sg.sig FROM sg, q WHERE sg.vec_id = q.qid)""".stripMargin

  /** LSH top-10: buckets within Hamming distance 2 of the query signature
    * (6-bit space: 22/64 buckets probed — deeper buckets AND higher recall
    * than 4-bit radius-1). */
  private val LSHTOP =
    s"""lshtop AS (
       |  SELECT e.vec_id, ${cosSql("e.embedding", "q.qv")} AS cos_scaled
       |  FROM embeddings e JOIN sg ON e.vec_id = sg.vec_id, q, qs
       |  WHERE bit_count(xor(sg.sig, qs.sig)) <= 2 AND e.vec_id <> q.qid
       |  ORDER BY cos_scaled DESC, e.vec_id LIMIT 10)""".stripMargin

  /** Deterministic IVF: 16 centroids picked by md5 pseudo-random shuffle
    * (engine-independent; the Spark side computes the same pick with a
    * distributed top-k); vectors assign to the nearest centroid by cosine;
    * the query probes its 4 nearest cells (mirrors Similarity.ivfTopK).
    * `pickWhere` restricts the codebook's training set — empty for e3/e3b
    * (full corpus), a vec_id bound for s16's stream-prefix codebook. */
  private[registry] def ivfSql(pickWhere: String): String =
    s"""cent AS (
      |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS cv
      |  FROM (SELECT vec_id, embedding FROM embeddings
      |        $pickWhere
      |        ORDER BY md5('ivf|' || vec_id), vec_id LIMIT 16) pick),
      |rankd AS (
      |  SELECT e.vec_id, c.cid,
      |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |      list_reduce(list_transform(list_zip(e.embedding, c.cv),
      |        z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), (s, v) -> s + v)
      |      / sqrt(list_reduce(list_transform(c.cv,
      |          x2 -> CAST(x2 AS DOUBLE) * CAST(x2 AS DOUBLE)), (s, v) -> s + v))
      |      DESC, c.cid) AS rk
      |  FROM embeddings e CROSS JOIN cent c),
      |assign AS (SELECT vec_id, cid FROM rankd WHERE rk = 1),
      |qc AS (SELECT r.cid FROM rankd r, q WHERE r.vec_id = q.qid AND r.rk <= 4),
      |candv AS (SELECT a.vec_id FROM assign a JOIN qc ON a.cid = qc.cid)""".stripMargin

  private val IVF = ivfSql("")

  private[registry] val QSQL = Q

  private[registry] val IVFTOP =
    s"""ivftop AS (
       |  SELECT e.vec_id, ${cosSql("e.embedding", "q.qv")} AS cos_scaled
       |  FROM embeddings e JOIN candv ON e.vec_id = candv.vec_id, q
       |  WHERE e.vec_id <> q.qid
       |  ORDER BY cos_scaled DESC, e.vec_id LIMIT 10)""".stripMargin

  // E12 product-quantization shape, shared by the Scala call and the
  // oracle SQL below so a parameter change re-derives both sides
  // pinned from examples.PqProbe's recall sweep (re-run after the r11
  // size-gated pool — full-corpus pick under PqFullPickBelow, 1/8
  // stratum above, ADVICE r10 #4): recall@10 = 7/10 (sf0.001,
  // deliberately-weak planted pairs — tiny-fixture codebook lottery;
  // the r10 stratum happened to draw 10/10 there) and 9/10 (sf0.01,
  // the driver's gate fixture — r10's stratum had dropped it to 7/10)
  private[registry] val PqM = 8
  private[registry] val PqKsub = 32
  private[registry] val PqCand = 100

  /** The full e12 oracle: codebook pick → per-subspace encode (window
    * argmin ORDER BY d2, cid — matches Spark's lexicographic
    * min(struct(d2, cid)) on bit-identical doubles) → flattened ADC table
    * → top-cand by ADC → exact cosine rerank. List indexing is 1-based in
    * DuckDB, hence the `+ 1`s against Spark's 0-based subscripts. */
  private def PQSQL: String = {
    val l2 = (a: String, b: String) =>
      s"""list_reduce(list_transform(list_zip($a, $b),
         |      z -> (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE))
         |         * (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE))), (s, v) -> s + v)""".stripMargin
    s"""WITH $Q,
       |pool AS (SELECT * FROM embeddings
       |         WHERE (SELECT count(*) FROM embeddings) < ${Similarity.PqFullPickBelow}
       |            OR substr(md5('pqs|' || vec_id), 1, 1) < '2'),
       |poolf AS (SELECT * FROM pool
       |          WHERE (SELECT count(*) FROM pool) >= $PqKsub
       |          UNION ALL
       |          SELECT * FROM embeddings
       |          WHERE (SELECT count(*) FROM pool) < $PqKsub),
       |picked AS (SELECT vec_id, embedding,
       |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid
       |  FROM (SELECT * FROM poolf ORDER BY md5('pq|' || vec_id), vec_id LIMIT $PqKsub)),
       |cent AS (SELECT CAST(u.j AS INTEGER) AS j, p.cid,
       |    p.embedding[CAST(u.j AS BIGINT) * (len(p.embedding) // $PqM) + 1 :
       |                (CAST(u.j AS BIGINT) + 1) * (len(p.embedding) // $PqM)] AS cv
       |  FROM picked p, UNNEST(range(0, $PqM)) AS u(j)),
       |sub AS (SELECT e.vec_id, CAST(u.j AS INTEGER) AS j,
       |    e.embedding[CAST(u.j AS BIGINT) * (len(e.embedding) // $PqM) + 1 :
       |                (CAST(u.j AS BIGINT) + 1) * (len(e.embedding) // $PqM)] AS sv
       |  FROM embeddings e, UNNEST(range(0, $PqM)) AS u(j)),
       |encr AS (SELECT s.vec_id, s.j, c.cid,
       |    ${l2("s.sv", "c.cv")} AS d2
       |  FROM sub s JOIN cent c ON s.j = c.j),
       |enc AS (SELECT vec_id, j, cid FROM (
       |    SELECT vec_id, j, cid,
       |      row_number() OVER (PARTITION BY vec_id, j ORDER BY d2 ASC, cid) AS rk
       |    FROM encr) WHERE rk = 1),
       |codes AS (SELECT vec_id, list(cid ORDER BY j) AS codes FROM enc GROUP BY vec_id),
       |qdr AS (SELECT c.j, c.cid,
       |    ${l2(s"q.qv[CAST(c.j AS BIGINT) * (len(q.qv) // $PqM) + 1 : (CAST(c.j AS BIGINT) + 1) * (len(q.qv) // $PqM)]", "c.cv")} AS qd2
       |  FROM cent c, q),
       |qd AS (SELECT list(qd2 ORDER BY j, cid) AS qd FROM qdr),
       |adc AS (SELECT cd.vec_id,
       |    CAST(floor(list_reduce(list_transform(range(0, $PqM),
       |        j -> qd.qd[CAST(j AS BIGINT) * $PqKsub + cd.codes[CAST(j AS BIGINT) + 1] + 1]),
       |      (s, v) -> s + v) * 1000000.0) AS BIGINT) AS adc2_scaled
       |  FROM codes cd, qd, q WHERE cd.vec_id <> q.qid),
       |candt AS (SELECT * FROM adc ORDER BY adc2_scaled ASC, vec_id LIMIT $PqCand)
       |SELECT c.vec_id, c.adc2_scaled, ${cosSql("e.embedding", "q.qv")} AS cos_scaled
       |FROM candt c JOIN embeddings e ON c.vec_id = e.vec_id, q
       |ORDER BY cos_scaled DESC, c.vec_id LIMIT 10""".stripMargin
  }

  /** e13 oracle: the greedy MMR loop unrolled — 50-deep relevance
    * shortlist, pairwise candidate cosines, then 9 MATERIALIZED argmax
    * rounds (each s_i is referenced twice — without MATERIALIZED DuckDB
    * re-inlines the whole chain exponentially, the g3 lesson). Scores use
    * the same cleared-denominator integers as the Scala loop. */
  private def MMRSQL: String = {
    val k = 10
    val sb = new StringBuilder
    sb.append(s"""WITH $Q,
      |cand AS MATERIALIZED (
      |  SELECT e.vec_id, ${cosSql("e.embedding", "q.qv")} AS cq
      |  FROM embeddings e, q WHERE e.vec_id <> q.qid
      |  ORDER BY cq DESC, e.vec_id LIMIT 50),
      |pair AS MATERIALIZED (
      |  SELECT a.vec_id AS ai, b.vec_id AS bi,
      |         ${cosSql("ea.embedding", "eb.embedding")} AS cp
      |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
      |  JOIN embeddings ea ON ea.vec_id = a.vec_id
      |  JOIN embeddings eb ON eb.vec_id = b.vec_id),
      |s1 AS MATERIALIZED (SELECT vec_id, CAST(1 AS BIGINT) AS rk FROM cand
      |  ORDER BY cq DESC, vec_id LIMIT 1)""".stripMargin)
    for (i <- 2 to k) {
      sb.append(s""",
        |r$i AS MATERIALIZED (SELECT c.vec_id, 7 * c.cq - 3 * max(p.cp) AS sc
        |  FROM cand c JOIN pair p ON p.ai = c.vec_id
        |  JOIN s${i - 1} s ON p.bi = s.vec_id
        |  WHERE c.vec_id NOT IN (SELECT vec_id FROM s${i - 1})
        |  GROUP BY c.vec_id, c.cq),
        |s$i AS MATERIALIZED (SELECT vec_id, rk FROM s${i - 1}
        |  UNION ALL SELECT vec_id, CAST($i AS BIGINT) AS rk FROM
        |    (SELECT vec_id FROM r$i ORDER BY sc DESC, vec_id LIMIT 1))""".stripMargin)
    }
    sb.append(s"""
      |SELECT s.rk, s.vec_id, c.cq AS cos_scaled
      |FROM s$k s JOIN cand c ON s.vec_id = c.vec_id
      |ORDER BY s.rk""".stripMargin)
    sb.toString
  }

  val entries: Seq[QueryEntry] = Seq(

    // E13: MMR diversity re-ranking (Carbonell-Goldstein '98) over the
    // e1 shortlist — greedy argmax of 7·cos(q,d) − 3·max_sel cos(d,s) in
    // cleared-denominator integers; everything after the shortlist is
    // cand²-bounded, so serving cost is corpus-size-independent
    ("e13_mmr_rerank",
      (s: SparkSession, d: String) =>
        Similarity.mmrRerank(Tables.embeddings(s, d), k = 10, cand = 50),
      Some(MMRSQL)),

    // E14: per-dimension drift between corpus halves — micro-unit
    // integer sums (scale-then-sum, never sum-then-scale: double sums
    // are accumulation-order-dependent), cross-multiplied mean compare,
    // top-8 drifted dims. One dim-keyed partial-combining aggregate.
    ("e14_embedding_drift",
      (s: SparkSession, d: String) =>
        Similarity.embeddingDrift(Tables.embeddings(s, d), k = 8),
      Some(
        """WITH hx AS (SELECT max(vec_id) // 2 AS h FROM embeddings),
          |vals AS (SELECT CAST(u.i AS BIGINT) AS i,
          |    CASE WHEN e.vec_id <= (SELECT h FROM hx) THEN 1 ELSE 0 END AS a,
          |    CAST(floor(CAST(e.embedding[CAST(u.i AS BIGINT) + 1] AS DOUBLE)
          |               * 1000000) AS BIGINT) AS xs
          |  FROM embeddings e, UNNEST(range(0, len(e.embedding))) AS u(i)),
          |agg AS (SELECT i, CAST(sum(a) AS BIGINT) AS n_a,
          |    CAST(sum(1 - a) AS BIGINT) AS n_b,
          |    CAST(sum(a * xs) AS BIGINT) AS sum_a,
          |    CAST(sum((1 - a) * xs) AS BIGINT) AS sum_b
          |  FROM vals GROUP BY i)
          |SELECT i, n_a, n_b, sum_a, sum_b,
          |  abs(sum_a * n_b - sum_b * n_a) AS drift_x
          |FROM agg ORDER BY drift_x DESC, i LIMIT 8""".stripMargin)),

    ("e1_ann_bruteforce_topk",
      (s: SparkSession, d: String) =>
        Similarity.bruteForceTopK(Tables.embeddings(s, d), k = 10),
      Some(s"WITH $Q, $BRUTE\nSELECT vec_id, cos_scaled FROM brute")),

    // E15: hard-negative mining — band-filtered ranking [50000, 150000)
    // ppm below the positive bar; the band predicate composes with the
    // e2/e3 shortlist paths at scale, exact contract here
    ("e15_hard_negatives",
      (s: SparkSession, d: String) =>
        Similarity.hardNegatives(Tables.embeddings(s, d), k = 10),
      Some(s"""WITH $Q
        |SELECT vec_id, cos_scaled FROM (
        |  SELECT e.vec_id, ${cosSql("e.embedding", "q.qv")} AS cos_scaled
        |  FROM embeddings e, q WHERE e.vec_id <> q.qid)
        |WHERE cos_scaled >= 50000 AND cos_scaled < 150000
        |ORDER BY cos_scaled DESC, vec_id LIMIT 10""".stripMargin)),

    // E16: reciprocal-rank fusion of the cosine and MIPS retrievers —
    // 10^6 div (60 + rank) per list in exact integers, fused top-10
    ("e16_rrf_fusion",
      (s: SparkSession, d: String) =>
        Similarity.rrfFusion(Tables.embeddings(s, d), k = 10, n = 20),
      Some(s"""WITH $Q,
        |la AS (
        |  SELECT vec_id, row_number() OVER (ORDER BY cos_scaled DESC, vec_id) AS rank
        |  FROM (SELECT e.vec_id, ${cosSql("e.embedding", "q.qv")} AS cos_scaled
        |        FROM embeddings e, q WHERE e.vec_id <> q.qid
        |        ORDER BY cos_scaled DESC, e.vec_id LIMIT 20)),
        |lb AS (
        |  SELECT vec_id, row_number() OVER (ORDER BY dot_scaled DESC, vec_id) AS rank
        |  FROM (SELECT e.vec_id,
        |          CAST(floor(list_reduce(list_transform(list_zip(e.embedding, q.qv),
        |            z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), (s, v) -> s + v)
        |            * 1000000) AS BIGINT) AS dot_scaled
        |        FROM embeddings e, q WHERE e.vec_id <> q.qid
        |        ORDER BY dot_scaled DESC, e.vec_id LIMIT 20)),
        |u AS (SELECT vec_id, 1000000 // (60 + rank) AS c FROM la
        |      UNION ALL
        |      SELECT vec_id, 1000000 // (60 + rank) AS c FROM lb)
        |SELECT vec_id, CAST(sum(c) AS BIGINT) AS rrf_scaled,
        |       count(*) AS n_lists
        |FROM u GROUP BY vec_id
        |ORDER BY rrf_scaled DESC, vec_id LIMIT 10""".stripMargin)),

    // E10: exact MIPS top-k — dot-product retrieval (unnormalized
    // two-tower scores); at scale MIPS rides the e2/e3 bucketed paths via
    // the norm augmentation (Bachrach et al. RecSys '14), this is the
    // exact contract they are measured against
    ("e10_mips_topk",
      (s: SparkSession, d: String) =>
        Similarity.mipsTopK(Tables.embeddings(s, d), k = 10),
      Some(s"""WITH $Q
        |SELECT e.vec_id,
        |  CAST(floor(list_reduce(list_transform(list_zip(e.embedding, q.qv),
        |    z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), (s, v) -> s + v)
        |    * 1000000) AS BIGINT) AS dot_scaled
        |FROM embeddings e, q WHERE e.vec_id <> q.qid
        |ORDER BY dot_scaled DESC, e.vec_id LIMIT 10""".stripMargin)),

    // E11: exact L2-nearest top-k — squared distance (same argsort, no
    // sqrt in the hash), one left-fold over the zipped pair in both
    // engines so scores are double-exact
    ("e11_l2_topk",
      (s: SparkSession, d: String) =>
        Similarity.l2TopK(Tables.embeddings(s, d), k = 10),
      Some(s"""WITH $Q
        |SELECT e.vec_id,
        |  CAST(floor(list_reduce(list_transform(list_zip(e.embedding, q.qv),
        |    z -> (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE))
        |       * (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE))), (s, v) -> s + v)
        |    * 1000000) AS BIGINT) AS dist2_scaled
        |FROM embeddings e, q WHERE e.vec_id <> q.qid
        |ORDER BY dist2_scaled ASC, e.vec_id LIMIT 10""".stripMargin)),

    // E12: product quantization (Jégou '11) — m subspace codebooks of
    // ksub md5-picked slices, per-subspace L2-argmin codes (ties low cid),
    // ADC candidate scoring from a broadcast query→centroid table, exact
    // cosine rerank. Codes are m bytes/vector: the candidate scan never
    // touches the float column — the 32× memory/IO cut at 100 TB. The
    // oracle SQL derives from the SAME named constants as the Scala call
    // (PqM/PqKsub/PqCand — the ADVICE-r6 WALKS discipline).
    ("e12_ann_pq_topk",
      (s: SparkSession, d: String) =>
        Similarity.pqTopK(Tables.embeddings(s, d),
          k = 10, cand = PqCand, m = PqM, ksub = PqKsub),
      Some(PQSQL)),

    // E8: scalar-quantized (int8) candidates + exact rerank — per-dim
    // [min,max] grid, asymmetric dequantized-code · full-precision-query
    // scoring for the top-50, exact cosine on the survivors. Identical
    // double expression tree in both engines (fold init 0.0 + x ≡ x, so
    // Spark's aggregate and DuckDB's init-less list_reduce agree).
    ("e8_ann_sq_topk",
      (s: SparkSession, d: String) =>
        Similarity.sqTopK(Tables.embeddings(s, d), k = 10, cand = 50),
      Some(s"""WITH $Q,
        |dimstats AS (
        |  SELECT u.i AS i, min(CAST(e.embedding[CAST(u.i AS BIGINT) + 1] AS DOUBLE)) AS mn,
        |         max(CAST(e.embedding[CAST(u.i AS BIGINT) + 1] AS DOUBLE)) AS mx
        |  FROM embeddings e, UNNEST(range(0, len(e.embedding))) AS u(i)
        |  GROUP BY u.i),
        |st AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs
        |       FROM dimstats),
        |adc AS (
        |  SELECT e.vec_id,
        |    CAST(floor(list_reduce(list_transform(range(0, len(e.embedding)),
        |      i -> (CASE WHEN st.mxs[i + 1] = st.mns[i + 1] THEN st.mns[i + 1] ELSE
        |             st.mns[i + 1] + (floor((CAST(e.embedding[i + 1] AS DOUBLE) - st.mns[i + 1])
        |                             / (st.mxs[i + 1] - st.mns[i + 1]) * 255.0) + 0.5)
        |                         * (st.mxs[i + 1] - st.mns[i + 1]) / 256.0 END)
        |           * CAST(q.qv[i + 1] AS DOUBLE)),
        |      (s, v) -> s + v) * 1000000.0) AS BIGINT) AS adc_scaled
        |  FROM embeddings e, q, st WHERE e.vec_id <> q.qid),
        |candt AS (SELECT * FROM adc ORDER BY adc_scaled DESC, vec_id LIMIT 50)
        |SELECT c.vec_id, c.adc_scaled, ${cosSql("e.embedding", "q.qv")} AS cos_scaled
        |FROM candt c JOIN embeddings e ON c.vec_id = e.vec_id, q
        |ORDER BY cos_scaled DESC, c.vec_id LIMIT 10""".stripMargin)),

    // E6: metadata-filtered ANN — the retrieval composition a corpus
    // pipeline actually runs: the t3 quality gate restricts the vector
    // set BEFORE any distance work (semi-join on doc id = partition/scan
    // pruning at 100 TB, where most vectors never get scored), then the
    // e1 exact top-k runs over the survivors; the query vector is the
    // lowest-id QUALITY doc, so the filter provably reaches the query
    // pick too.
    ("e6_ann_quality_filtered",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.functions._
        val quality = TextOps.qualityScore(Tables.documents(s, d))
          .filter(col("is_quality") === 1).select(col("doc_id").as("vec_id"))
        Similarity.bruteForceTopK(
          Tables.embeddings(s, d).join(quality, Seq("vec_id"), "left_semi"), k = 10)
      },
      Some(Oracle.withSql(TextQueries.TOK,
        s""", q1 AS (SELECT doc_id, len(ts) AS n_tokens,
           |  len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
           |  len(list_filter(ts, t -> t IN ('the','a','of','and','to','is','in'))) AS n_stop
           |  FROM tok),
           |quality AS (SELECT doc_id FROM q1
           |  WHERE n_tokens >= 5 AND n_tokens <= 100000
           |    AND (100 * n_stop) // greatest(n_tokens, 1) >= 1
           |    AND n_punct * 4 <= n_tokens),
           |qemb AS (SELECT e.* FROM embeddings e JOIN quality q ON e.vec_id = q.doc_id),
           |qv AS (SELECT vec_id AS qid, embedding AS qvec FROM qemb ORDER BY vec_id LIMIT 1),
           |qbrute AS (
           |  SELECT e.vec_id, ${cosSql("e.embedding", "qv.qvec")} AS cos_scaled
           |  FROM qemb e, qv WHERE e.vec_id <> qv.qid
           |  ORDER BY cos_scaled DESC, e.vec_id LIMIT 10)
           |SELECT vec_id, cos_scaled FROM qbrute""".stripMargin))),

    ("e2_ann_lsh_topk",
      (s: SparkSession, d: String) =>
        Similarity.lshTopK(Tables.embeddings(s, d), bits = 6, k = 10, probeRadius = 2),
      Some(s"WITH $Q, $SIG, $LSHTOP\nSELECT vec_id, cos_scaled FROM lshtop")),

    ("e3_ann_ivf_topk",
      (s: SparkSession, d: String) =>
        Similarity.ivfTopK(Tables.embeddings(s, d), k = 10, nCells = 16, nprobe = 4),
      Some(s"WITH $Q, $IVF, $IVFTOP\nSELECT vec_id, cos_scaled FROM ivftop")),

    // e3's probe served from the CELL-PARTITIONED store: the probe reads
    // only the nprobe cell directories (PartitionFilters at the scan) —
    // same deterministic centroids/assignment, so the SAME oracle as e3
    ("e3b_ann_ivf_store_topk",
      (s: SparkSession, d: String) =>
        Similarity.ivfStoreTopK(s, ivfStorePath(s, d), k = 10, nprobe = 4),
      Some(s"WITH $Q, $IVF, $IVFTOP\nSELECT vec_id, cos_scaled FROM ivftop")),

    // ---- E7: metadata-filtered probe at the cell-partitioned store —
    //      e6's quality gate composed with e3b's directory pruning:
    //      cells prune first (storage), the id semi-join cuts candidates
    //      before any distance work, survivors rank. The oracle SHADOWS
    //      the shared q CTE with the filtered query pick (lowest-id
    //      QUALITY vector), which the IVF fragment then probes with ----
    ("e7_ann_ivf_filtered",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.functions._
        val quality = TextOps.qualityScore(Tables.documents(s, d))
          .filter(col("is_quality") === 1).select(col("doc_id").as("vec_id"))
        Similarity.ivfStoreFilteredTopK(s, ivfStorePath(s, d),
          keep = Some(quality), k = 10, nprobe = 4)
      },
      Some(
        s"""WITH ${TextQueries.TOK},
           |q1 AS (SELECT doc_id, len(ts) AS n_tokens,
           |  len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
           |  len(list_filter(ts, t -> t IN ('the','a','of','and','to','is','in'))) AS n_stop
           |  FROM tok),
           |quality AS (SELECT doc_id FROM q1
           |  WHERE n_tokens >= 5 AND n_tokens <= 100000
           |    AND (100 * n_stop) // greatest(n_tokens, 1) >= 1
           |    AND n_punct * 4 <= n_tokens),
           |qemb AS (SELECT e.* FROM embeddings e JOIN quality ql ON e.vec_id = ql.doc_id),
           |q AS (SELECT vec_id AS qid, embedding AS qv FROM qemb ORDER BY vec_id LIMIT 1),
           |$IVF,
           |ftop AS (
           |  SELECT e.vec_id, ${cosSql("e.embedding", "q.qv")} AS cos_scaled
           |  FROM qemb e JOIN candv c ON e.vec_id = c.vec_id, q
           |  WHERE e.vec_id <> q.qid
           |  ORDER BY cos_scaled DESC, e.vec_id LIMIT 10)
           |SELECT vec_id, cos_scaled FROM ftop""".stripMargin)),

    // ---- recall@10 gates: |ANN top-10 ∩ brute top-10| as oracle-checked
    //      counts — a recall regression (sign flip, probe bug) goes red ----
    ("e4_ann_lsh_recall",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.functions._
        val emb = Tables.embeddings(s, d)
        val brute = Similarity.bruteForceTopK(emb, k = 10).select("vec_id")
        val lsh = Similarity.lshTopK(emb, bits = 6, k = 10, probeRadius = 2).select("vec_id")
        lsh.agg(count(lit(1)).as("n_ret"))
          .crossJoin(lsh.join(brute, Seq("vec_id"), "left_semi")
            .agg(count(lit(1)).as("hits")))
          .select(lit(10L).as("k"), col("n_ret"), col("hits"))
      },
      Some(s"""WITH $Q, $BRUTE, $SIG, $LSHTOP
              |SELECT CAST(10 AS BIGINT) AS k,
              |       (SELECT count(*) FROM lshtop) AS n_ret,
              |       (SELECT count(*) FROM lshtop
              |        WHERE vec_id IN (SELECT vec_id FROM brute)) AS hits""".stripMargin)),

    // ---- E18: matryoshka truncation sweep — recall@10 of prefix-dim
    //      cosine retrieval (64/32/16/8 dims) vs the full-dim truth: the
    //      MRL-style accuracy/cost table behind dimension-truncated
    //      serving (half the dims = half the scan bytes). Prefix slices
    //      are projections; every row is oracle-exact ----
    ("e18_matryoshka_sweep",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.functions._
        val emb = Tables.embeddings(s, d)
        val brute = Similarity.bruteForceTopK(emb, k = 10)
          .select("vec_id").localCheckpoint(true)
        Seq(64, 32, 16, 8).map { dim =>
          val tr = emb.select(col("vec_id"),
            expr(s"slice(embedding, 1, $dim)").as("embedding"))
          val top = Similarity.bruteForceTopK(tr, k = 10).select("vec_id")
          top.agg(count(lit(1)).as("n_ret"))
            .crossJoin(top.join(brute, Seq("vec_id"), "left_semi")
              .agg(count(lit(1)).as("hits")))
            .select(lit(dim.toLong).as("dim"), col("n_ret"), col("hits"))
        }.reduce(_ unionByName _)
      },
      Some {
        val per = Seq(64, 32, 16, 8).map { dim =>
          s""",
             |tr$dim AS (
             |  SELECT e.vec_id FROM embeddings e, q
             |  WHERE e.vec_id <> q.qid
             |  ORDER BY ${cosSql(s"list_slice(e.embedding, 1, $dim)",
                s"list_slice(q.qv, 1, $dim)")} DESC, e.vec_id LIMIT 10)""".stripMargin
        }.mkString
        val rows = Seq(64, 32, 16, 8).map { dim =>
          s"""SELECT CAST($dim AS BIGINT) AS dim,
             |  (SELECT count(*) FROM tr$dim) AS n_ret,
             |  (SELECT count(*) FROM tr$dim
             |   WHERE vec_id IN (SELECT vec_id FROM brute)) AS hits""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"WITH $Q, $BRUTE$per\n$rows"
      }),

    // ---- E17: IVF tuning sweep — recall@10 vs nprobe (1..4), the
    //      parameter-selection table an ANN deployment derives before
    //      fixing its latency/recall point; each probe level reuses the
    //      same codebook/assignment, so the sweep costs one assignment
    //      plus 4 shortlist scans, and every row is oracle-exact ----
    ("e17_ivf_probe_sweep",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.functions._
        val emb = Tables.embeddings(s, d)
        val brute = Similarity.bruteForceTopK(emb, k = 10)
          .select("vec_id").localCheckpoint(true)
        (1 to 4).map { p =>
          val ivf = Similarity.ivfTopK(emb, k = 10, nCells = 16, nprobe = p)
            .select("vec_id")
          ivf.agg(count(lit(1)).as("n_ret"))
            .crossJoin(ivf.join(brute, Seq("vec_id"), "left_semi")
              .agg(count(lit(1)).as("hits")))
            .select(lit(p.toLong).as("nprobe"), col("n_ret"), col("hits"))
        }.reduce(_ unionByName _)
      },
      Some {
        val per = (1 to 4).map { p =>
          s""",
             |qc$p AS (SELECT r.cid FROM rankd r, q WHERE r.vec_id = q.qid AND r.rk <= $p),
             |cv$p AS (SELECT a.vec_id FROM assign a JOIN qc$p c ON a.cid = c.cid),
             |tp$p AS (
             |  SELECT e.vec_id FROM embeddings e JOIN cv$p ON e.vec_id = cv$p.vec_id, q
             |  WHERE e.vec_id <> q.qid
             |  ORDER BY ${cosSql("e.embedding", "q.qv")} DESC, e.vec_id LIMIT 10)""".stripMargin
        }.mkString
        val rows = (1 to 4).map { p =>
          s"""SELECT CAST($p AS BIGINT) AS nprobe,
             |  (SELECT count(*) FROM tp$p) AS n_ret,
             |  (SELECT count(*) FROM tp$p
             |   WHERE vec_id IN (SELECT vec_id FROM brute)) AS hits""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"WITH $Q, $BRUTE, $IVF$per\n$rows"
      }),

    ("e5_ann_ivf_recall",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.functions._
        val emb = Tables.embeddings(s, d)
        val brute = Similarity.bruteForceTopK(emb, k = 10).select("vec_id")
        val ivf = Similarity.ivfTopK(emb, k = 10, nCells = 16, nprobe = 4).select("vec_id")
        ivf.agg(count(lit(1)).as("n_ret"))
          .crossJoin(ivf.join(brute, Seq("vec_id"), "left_semi")
            .agg(count(lit(1)).as("hits")))
          .select(lit(10L).as("k"), col("n_ret"), col("hits"))
      },
      Some(s"""WITH $Q, $BRUTE, $IVF, $IVFTOP
              |SELECT CAST(10 AS BIGINT) AS k,
              |       (SELECT count(*) FROM ivftop) AS n_ret,
              |       (SELECT count(*) FROM ivftop
              |        WHERE vec_id IN (SELECT vec_id FROM brute)) AS hits""".stripMargin)),

    // ---- C11: seeded Lloyd k-means over quantized embeddings —
    //      clustering as a first-class oracle-checked op (the
    //      cluster-then-balance curation step). Quantized ints, exact
    //      mean sums, identical index-order double distance trees, and
    //      (dist, cluster) struct-argmin make BOTH Lloyd rounds and the
    //      final assignment engine-exact; the oracle unrolls the same
    //      two update rounds + final assignment ----
    ("c11_kmeans_clusters",
      (s: SparkSession, d: String) =>
        Similarity.lloydKmeans(Tables.embeddings(s, d)),
      Some(
        s"""$KM_CTES
           |SELECT c AS cluster, count(*) AS n_members,
           |       CAST(sum(vec_id) AS BIGINT) AS id_sum
           |FROM ka3 GROUP BY c""".stripMargin)),

    // ---- X4: cluster-BALANCED sampling — cap every c11 cluster at 30
    //      md5-ranked members so no dominant semantic mode floods the
    //      training mix (the cluster-level twin of t13's source-mixture
    //      capping, and the step k-means exists for). Shares the whole
    //      unrolled k-means CTE chain with c11 ----
    ("x4_cluster_balanced_sample",
      (s: SparkSession, d: String) =>
        Similarity.clusterBalancedSample(Tables.embeddings(s, d), quota = 30),
      Some(
        s"""$KM_CTES,
           |rk AS (SELECT vec_id, c, row_number() OVER
           |  (PARTITION BY c ORDER BY md5('kms|' || vec_id), vec_id) AS rn
           |  FROM ka3)
           |SELECT c AS cluster, count(*) AS n_kept,
           |       CAST(sum(vec_id) AS BIGINT) AS kept_id_sum
           |FROM rk WHERE rn <= 30 GROUP BY c""".stripMargin)),
  )

  /** The unrolled 2-round Lloyd k-means CTE chain (qkm → km0 → ka3),
    * shared VERBATIM by the c11 and x4 oracles so the clustering spec
    * cannot desynchronize between them (the LPA3 discipline). */
  private def KM_CTES: String = {
    val dist = (x: String, m: String) =>
      s"""list_reduce(list_transform(list_zip($x, $m),
         |  z -> (CAST(z[1] AS DOUBLE) - z[2]) * (CAST(z[1] AS DOUBLE) - z[2])),
         |  (s, v) -> s + v)""".stripMargin
    val assign = (a: String, cents: String) =>
      s"""$a AS (SELECT q.vec_id, (min({'d': ${dist("q.x", s"$cents.m")}, 'c': $cents.c})).c AS c
         |  FROM qkm q CROSS JOIN $cents GROUP BY q.vec_id)""".stripMargin
    val update = (m: String, a: String) =>
      s"""$m AS (SELECT t.c, list(CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE) ORDER BY t.i) AS m
         |  FROM (SELECT $a.c, u.i, sum(q.x[u.i + 1]) AS s, count(*) AS n
         |        FROM $a JOIN qkm q USING (vec_id), UNNEST(range(0, len(q.x))) AS u(i)
         |        GROUP BY $a.c, u.i) t
         |  GROUP BY t.c)""".stripMargin
    s"""WITH qkm AS (SELECT vec_id,
       |    list_transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1000) AS BIGINT)) AS x
       |  FROM embeddings),
       |km0 AS (SELECT row_number() OVER (ORDER BY md5('km|' || vec_id), vec_id) - 1 AS c,
       |               list_transform(x, v -> CAST(v AS DOUBLE)) AS m
       |        FROM qkm ORDER BY md5('km|' || vec_id), vec_id LIMIT 8),
       |${assign("ka1", "km0")},
       |${update("km1", "ka1")},
       |${assign("ka2", "km1")},
       |${update("km2", "ka2")},
       |${assign("ka3", "km2")}""".stripMargin
  }
}
