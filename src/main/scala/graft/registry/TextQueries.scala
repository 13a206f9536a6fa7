package graft.registry

import graft._
import org.apache.spark.sql.SparkSession

/** Text-analysis pipeline queries over `documents` (language-ID, quality,
  * token stats, fingerprint) — see [[graft.TextOps]]. All-integer /
  * md5-string outputs for exact cross-engine parity. */
object TextQueries {

  /** Shared DuckDB fragment: filtered token lists per document. */
  val TOK: String =
    """tok AS (
      |  SELECT doc_id, text,
      |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS ts
      |  FROM documents)""".stripMargin

  private val enList = "('the','a','of','and','to','is','in')"

  /** The x8 oracle chain (chunk → hash-embedding → cosine top-k),
    * shared verbatim by x8 (batch build) and s19 (streamed store). */
  private[registry] val X8SQL: String = Oracle.withSql(TOK,
    """, ch AS (
          |  SELECT doc_id, ci AS chunk_idx,
          |    md5(array_to_string(list_slice(ts, CAST(ci * 8 + 1 AS BIGINT),
          |      CAST(least(ci * 8 + 16, len(ts)) AS BIGINT)), ' ')) AS chunk_fp
          |  FROM tok, UNNEST(range(0, ((len(ts) - 1) // 8) + 1)) AS u(ci)
          |  WHERE len(ts) > 0),
          |emb AS (
          |  SELECT doc_id, chunk_idx,
          |    list_transform(range(0, 8), j -> CAST(
          |      CAST(('0x' || substr(md5('x8|' || chunk_fp || '|' || j), 1, 15)) AS BIGINT)
          |      % 2001 - 1000 AS DOUBLE)) AS v
          |  FROM ch),
          |q AS (SELECT doc_id AS qd, chunk_idx AS qc, v AS qv
          |      FROM emb ORDER BY doc_id, chunk_idx LIMIT 1)
          |SELECT e.doc_id, CAST(e.chunk_idx AS BIGINT) AS chunk_idx,
          |  CAST(floor(
          |    list_reduce(list_transform(list_zip(e.v, q.qv),
          |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), (s, v) -> s + v)
          |    / (sqrt(list_reduce(list_transform(e.v,
          |         x2 -> CAST(x2 AS DOUBLE) * CAST(x2 AS DOUBLE)), (s, v) -> s + v))
          |     * sqrt(list_reduce(list_transform(q.qv,
          |         x2 -> CAST(x2 AS DOUBLE) * CAST(x2 AS DOUBLE)), (s, v) -> s + v)))
          |    * 1000000) AS BIGINT) AS cos_scaled
          |FROM emb e, q
          |WHERE NOT (e.doc_id = q.qd AND e.chunk_idx = q.qc)
          |ORDER BY cos_scaled DESC, e.doc_id, e.chunk_idx LIMIT 10""".stripMargin)

  /** The t2 language-ID chain (per-doc stopword votes + tie-break CASE),
    * shared by the t2 oracle and t25's confusion matrix so the stopword
    * lists and tie-break order cannot diverge between them. Ends at CTE
    * `lp(doc_id, s_en, s_es, s_de, s_fr, pred_lang)`. */
  private[registry] val LANGPRED: String =
    s""", lp AS (SELECT doc_id, s_en, s_es, s_de, s_fr,
       |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
       |       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
       |       WHEN s_de >= s_fr THEN 'de'
       |       ELSE 'fr' END AS pred_lang
       |  FROM (SELECT doc_id,
       |    len(list_filter(ts, t -> t IN $enList)) AS s_en,
       |    len(list_filter(ts, t -> t IN ('el','la','de','y','que','los'))) AS s_es,
       |    len(list_filter(ts, t -> t IN ('der','die','das','und','ist'))) AS s_de,
       |    len(list_filter(ts, t -> t IN ('le','les','et','est','une'))) AS s_fr
       |    FROM tok))""".stripMargin

  val entries: Seq[QueryEntry] = Seq(

    ("t1_token_stats",
      (s: SparkSession, d: String) => TextOps.tokenStats(Tables.documents(s, d)),
      Some(Oracle.withSql(TOK,
        """SELECT doc_id, length(text) AS len, len(ts) AS n_tokens,
          |       length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS n_alnum
          |FROM tok""".stripMargin))),

    ("t2_lang_id",
      (s: SparkSession, d: String) => TextOps.langId(Tables.documents(s, d)),
      Some(Oracle.withSql(TOK + LANGPRED,
        "SELECT doc_id, s_en, s_es, s_de, s_fr, pred_lang FROM lp"))),

    ("t3_quality_score",
      (s: SparkSession, d: String) => TextOps.qualityScore(Tables.documents(s, d)),
      Some(Oracle.withSql(TOK,
        s""", q1 AS (SELECT doc_id, length(text) AS len, len(ts) AS n_tokens,
           |  len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
           |  len(regexp_extract_all(text, '[0-9]')) AS n_digit,
           |  len(list_filter(ts, t -> t IN $enList)) AS n_stop
           |  FROM tok),
           |q2 AS (SELECT *, (100 * n_stop) // greatest(n_tokens, 1) AS stop_pct FROM q1)
           |SELECT doc_id, len, n_tokens, n_punct, n_digit, n_stop, stop_pct,
           |  CASE WHEN n_tokens >= 5 AND n_tokens <= 100000 AND stop_pct >= 1
           |            AND n_punct * 4 <= n_tokens THEN 1 ELSE 0 END AS is_quality
           |FROM q2""".stripMargin))),

    ("t4_fingerprint",
      (s: SparkSession, d: String) => TextOps.fingerprint(Tables.documents(s, d)),
      Some(
        """SELECT doc_id, md5(trim(regexp_replace(lower(text), '[\t\n\x0B\f\r ]+', ' ', 'g'))) AS fp
          |FROM documents""".stripMargin)),

    // ---- multimodal metadata pipeline (typed mapPartitions + stub codec) ----
    ("m1_multimodal_meta",
      (s: SparkSession, d: String) => Multimodal.metaPipeline(s, d),
      Some(
        """SELECT doc_id,
          |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
          |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS fake_width,
          |  CAST(octet_length(encode(text)) // 640 AS BIGINT) AS fake_height,
          |  md5(text) AS fp
          |FROM documents""".stripMargin)),

    // ---- m2: frame sampling — 1→N fan-out of byte-slice "frames" with
    //      typed output, every 2nd 16-byte frame (fixture text is ASCII,
    //      so char slicing == byte slicing in the oracle) ----
    ("m2_multimodal_framesample",
      (s: SparkSession, d: String) => Multimodal.framePipeline(s, d),
      Some(
        """SELECT d.doc_id, CAST(u.f AS BIGINT) AS frame_idx,
          |  CAST(CASE WHEN (u.f + 1) * 16 <= strlen(d.text) THEN 16
          |            ELSE strlen(d.text) - u.f * 16 END AS BIGINT) AS frame_len,
          |  md5(substr(d.text, CAST(u.f * 16 + 1 AS BIGINT), 16)) AS frame_fp
          |FROM documents d,
          |  UNNEST(range(0, CAST(ceil(strlen(d.text) / 16.0) AS BIGINT))) AS u(f)
          |WHERE u.f % 2 = 0""".stripMargin)),

    // ---- M3: audio-shaped OVERLAPPING window features (hop < window,
    //      the STFT access pattern) — per-window byte-sum "energy" keeps
    //      the DSP slot deterministic and oracle-expressible ----
    ("m3_multimodal_audio_windows",
      (s: SparkSession, d: String) => Multimodal.windowPipeline(s, d),
      Some(
        """SELECT d.doc_id, CAST(u.s // 16 AS BIGINT) AS win_idx,
          |  CAST(least(32, strlen(d.text) - u.s) AS BIGINT) AS win_len,
          |  CAST(list_sum(list_transform(
          |    range(1, CAST(least(32, strlen(d.text) - u.s) AS BIGINT) + 1),
          |    j -> ord(substr(d.text, CAST(u.s + j AS BIGINT), 1)))) AS BIGINT) AS energy
          |FROM documents d, UNNEST(range(0, strlen(d.text), 16)) AS u(s)""".stripMargin)),

    // ---- m4: resize/re-encode — binary-in/binary-out transform (every
    //      4th byte kept), verified through the downstream metadata
    //      extraction; fixture text is ASCII so the oracle reconstructs
    //      the strided payload with char arithmetic ----
    ("m4_multimodal_resize",
      (s: SparkSession, d: String) => {
        implicit val sp: SparkSession = s
        Multimodal.extractMeta(
          Multimodal.resizeStub(
            Multimodal.asMedia(Tables.documents(s, d)), ratio = 4)).toDF()
      },
      Some(
        """WITH r AS (
          |  SELECT doc_id,
          |    list_aggregate(list_transform(range(0, strlen(text), 4),
          |      i -> substr(text, CAST(i + 1 AS BIGINT), 1)), 'string_agg', '') AS rt
          |  FROM documents)
          |SELECT doc_id, CAST(strlen(rt) AS BIGINT) AS byte_len,
          |  CAST(strlen(rt) % 640 AS BIGINT) AS fake_width,
          |  CAST(strlen(rt) // 640 AS BIGINT) AS fake_height,
          |  md5(rt) AS fp
          |FROM r""".stripMargin)),

    // ---- X8: RAG indexing composite — chunk → hash-embedding →
    //      cosine top-k as ONE declarative plan; integer-valued double
    //      embeddings keep the score floor-exact cross-engine. The
    //      oracle SQL is shared verbatim with s19's streamed store
    //      (streaming == batch == oracle for the chunk index) ----
    ("x8_rag_index_topk",
      (s: SparkSession, d: String) =>
        TextOps.ragIndexTopK(Tables.documents(s, d)),
      Some(X8SQL)),

    // ---- M5: perceptual media dedup — blockhash (60 byte-blocks, bit =
    //      block above the payload mean) computed in the typed codec
    //      slot, then the e9 banded Hamming join; a payload edit flips
    //      only the touched blocks' bits, so near-identical media pair
    //      up. Exact integers end-to-end. Oracle counts characters
    //      (strlen/ord) against Spark's UTF-8 bytes — identical on the
    //      ASCII fixture, the SAME documented assumption as the m2/m3/m4
    //      oracles (m2's comment: "fixture text is ASCII, so char
    //      slicing == byte slicing") ----
    ("m5_media_phash_neardup",
      (s: SparkSession, d: String) =>
        Multimodal.phashNearDup(s, d, radius = 3, nBands = 4),
      Some(
        """WITH bs AS (
          |  SELECT doc_id, strlen(text) AS n,
          |    coalesce(list_sum(list_transform(range(0, strlen(text)),
          |      i -> ord(substr(text, CAST(i + 1 AS BIGINT), 1)))), 0) AS total,
          |    list_transform(range(0, 60), blk -> coalesce(list_sum(
          |      list_transform(range(blk * strlen(text) // 60,
          |                          (blk + 1) * strlen(text) // 60),
          |        i -> ord(substr(text, CAST(i + 1 AS BIGINT), 1)))), 0)) AS sums
          |  FROM documents),
          |sh AS (
          |  SELECT doc_id, CAST(list_sum(list_transform(range(0, 60),
          |    blk -> CASE WHEN 60 * sums[CAST(blk + 1 AS BIGINT)] > total
          |                THEN CAST(1 AS BIGINT) << blk ELSE CAST(0 AS BIGINT) END))
          |    AS BIGINT) AS simhash
          |  FROM bs),
          |hbd AS (SELECT doc_id, simhash, band, (simhash >> (band * 15)) & 32767 AS key
          |        FROM sh, (SELECT unnest(range(0, 4)) AS band) bands),
          |hcand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
          |                 x.simhash AS ha, y.simhash AS hb
          |          FROM hbd x JOIN hbd y
          |          ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id)
          |SELECT a, b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS ham
          |FROM hcand WHERE bit_count(xor(ha, hb)) <= 3""".stripMargin)),

    // ---- X5: cross-modal retrieval composite — the CLIP-shaped serving
    //      join: the QUERY is chosen on the media side (largest payload
    //      by m1's metadata, ties to the low id), candidates are gated by
    //      a media predicate (byte_len >= 200 — a storage-prunable
    //      semi-join, like e6's quality gate but driven by the binary
    //      column's metadata), and the embedding side ranks by exact
    //      cosine. At 100 TB the media gate prunes before any distance
    //      work and the query row is a 1-row broadcast ----
    ("x5_crossmodal_retrieval",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.functions._
        val meta = Multimodal.metaPipeline(s, d)
          .select(col("doc_id"), col("byte_len")).localCheckpoint(true)
        val emb = Tables.embeddings(s, d)
        val big = meta.orderBy(col("byte_len").desc, col("doc_id")).limit(1)
          .select(col("doc_id").as("qid"))
        val q = emb.join(broadcast(big), emb("vec_id") === col("qid"))
          .select(col("qid"), col("embedding").as("qv"))
        val keep = meta.filter(col("byte_len") >= 200)
          .select(col("doc_id").as("vec_id"))
        emb.join(keep, Seq("vec_id"), "left_semi")
          .crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("vec_id"),
            floor(Similarity.cosine(col("embedding"), col("qv")) * 1000000L)
              .cast("long").as("cos_scaled"))
          .orderBy(col("cos_scaled").desc, col("vec_id")).limit(10)
      },
      Some(s"""WITH meta AS (SELECT doc_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS bl FROM documents),
        |q AS (SELECT e.vec_id AS qid, e.embedding AS qv
        |  FROM embeddings e JOIN meta m ON e.vec_id = m.doc_id
        |  ORDER BY m.bl DESC, m.doc_id LIMIT 1),
        |keep AS (SELECT doc_id FROM meta WHERE bl >= 200)
        |SELECT e.vec_id,
        |  ${VectorQueries.cosSql("e.embedding", "q.qv")} AS cos_scaled
        |FROM embeddings e JOIN keep k ON e.vec_id = k.doc_id, q
        |WHERE e.vec_id <> q.qid
        |ORDER BY cos_scaled DESC, e.vec_id LIMIT 10""".stripMargin)),

    // ---- t6: BPE-ish pretokenization (GPT-2-style regex) — the count AND
    //      a boundary-exact fingerprint of the token list; the SQL reuses
    //      the SAME pattern constant so the engines cannot drift ----
    ("t6_bpe_pretokenize",
      (s: SparkSession, d: String) => TextOps.bpeTokenStats(Tables.documents(s, d)),
      Some {
        val p = TextOps.BpePattern.replace("'", "''")
        s"""SELECT doc_id, len(regexp_extract_all(text, '$p')) AS n_bpe,
           |  md5(array_to_string(regexp_extract_all(text, '$p'), chr(1))) AS tok_fp
           |FROM documents""".stripMargin
      }),

    // ---- t7: winnowing fingerprints (MOSS, SIGMOD'03) — min k-gram-hash
    //      per sliding window; digest is order-canonical so any
    //      selected-set difference fails the hash. range() is
    //      end-EXCLUSIVE in DuckDB vs sequence() inclusive in Spark:
    //      both floor to exactly one window on short texts ----
    ("t7_winnow_fingerprints",
      (s: SparkSession, d: String) => TextOps.winnowFingerprints(Tables.documents(s, d)),
      Some(
        """WITH kh AS (
          |  SELECT doc_id,
          |    list_transform(range(1, greatest(length(text) - 6, 2)),
          |      i -> md5(substr(text, CAST(i AS BIGINT), 8))) AS hs
          |  FROM documents),
          |win AS (
          |  SELECT doc_id,
          |    list_sort(list_distinct(list_transform(range(1, greatest(len(hs) - 2, 2)),
          |      j -> list_aggregate(hs[CAST(j AS BIGINT):CAST(j AS BIGINT)+3], 'min')))) AS fps
          |  FROM kh)
          |SELECT doc_id, len(fps) AS n_fp, md5(array_to_string(fps, chr(1))) AS fp_digest
          |FROM win""".stripMargin)),

    // ---- t5: deterministic stratified sampling — md5-threshold membership
    //      per language stratum; the id-sum witnesses the SAME documents
    //      were chosen by both engines, not merely the same count ----
    ("t5_stratified_sample",
      (s: SparkSession, d: String) => TextOps.stratifiedSample(Tables.documents(s, d)),
      Some(
        """SELECT lang, count(*) AS n_total,
          |  count(*) FILTER (substr(md5('t5|' || doc_id), 1, 1) < '4') AS n_sampled,
          |  CAST(sum(doc_id) FILTER (substr(md5('t5|' || doc_id), 1, 1) < '4') AS BIGINT) AS sampled_id_sum
          |FROM documents GROUP BY lang""".stripMargin)),

    // ---- t13: temperature-scaled domain mixture — count^(1/2) source
    //      weights, integer-division targets, md5-rank selection; the
    //      id-sum witnesses the SAME documents were chosen. floor(sqrt)
    //      is engine-exact (IEEE sqrt is correctly rounded), every other
    //      derived column is pure integer arithmetic ----
    // ---- T14: unigram-LM negative-log-likelihood quality score (the
    //      CCNet-style perplexity filter; self-contained corpus LM).
    //      Milli-nat integers only: floor(ln(N/cnt)·1000) per token —
    //      both engines evaluate ln on identical doubles ----
    ("t14_perplexity_score",
      (s: SparkSession, d: String) => TextOps.perplexityScore(Tables.documents(s, d)),
      Some(Oracle.withSql(TOK,
        """, tokd AS (SELECT doc_id, unnest(ts) AS tok FROM tok),
          |vocab AS (SELECT tok, count(*) AS cnt FROM tokd GROUP BY tok),
          |tot AS (SELECT count(*) AS n FROM tokd),
          |nlls AS (SELECT doc_id,
          |    CAST(floor(ln(CAST(n AS DOUBLE) / CAST(cnt AS DOUBLE)) * 1000) AS BIGINT) AS nll
          |  FROM tokd JOIN vocab USING (tok) CROSS JOIN tot)
          |SELECT doc_id, count(*) AS n_tokens,
          |       CAST(sum(nll) AS BIGINT) AS sum_nll_milli,
          |       CAST(sum(nll) // count(*) AS BIGINT) AS avg_nll_milli
          |FROM nlls GROUP BY doc_id""".stripMargin))),

    // ---- T16: TF-IDF top-3 salient terms per document (Salton &
    //      Buckley '88) — idf in the t14 milli-nat integer discipline,
    //      score tf·idf pure integer, ties broken on token asc so the
    //      window top-k is total-order deterministic ----
    ("t16_tfidf_topterms",
      (s: SparkSession, d: String) => TextOps.tfidfTopTerms(Tables.documents(s, d)),
      Some(Oracle.withSql(TOK,
        """, tokd AS (SELECT doc_id, unnest(ts) AS tok FROM tok),
          |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tokd GROUP BY doc_id, tok),
          |dfq AS (SELECT tok, count(*) AS dfreq FROM tf GROUP BY tok),
          |nd AS (SELECT count(*) AS nd FROM documents),
          |sc AS (SELECT t.doc_id, t.tok, t.tf, d.dfreq,
          |    CAST(t.tf * CAST(floor(ln(CAST(nd.nd AS DOUBLE) / CAST(d.dfreq AS DOUBLE)) * 1000) AS BIGINT) AS BIGINT) AS tfidf_milli
          |  FROM tf t JOIN dfq d USING (tok) CROSS JOIN nd),
          |rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id
          |         ORDER BY tfidf_milli DESC, tok) AS rnk FROM sc)
          |SELECT doc_id, tok, tf, dfreq, tfidf_milli, rnk
          |FROM rk WHERE rnk <= 3""".stripMargin))),

    // ---- T17: bigram-LM NLL score with add-one smoothing (the KenLM-
    //      shaped step up from t14's unigram model): bigram extraction is
    //      a projection (array zip, no positional shuffle), counts are
    //      two partial-combining shuffles, all-integer output ----
    ("t17_bigram_lm",
      (s: SparkSession, d: String) => TextOps.bigramLmScore(Tables.documents(s, d)),
      Some(Oracle.withSql(TOK,
        """, bt AS (SELECT doc_id, ts FROM tok WHERE len(ts) >= 2),
          |bgs AS (SELECT doc_id, p['h'] AS h, p['w'] AS w FROM (
          |  SELECT doc_id, unnest(list_transform(range(2, len(ts) + 1),
          |           i -> {'h': ts[i-1], 'w': ts[i]})) AS p FROM bt)),
          |bc AS (SELECT h, w, count(*) AS chw FROM bgs GROUP BY h, w),
          |hc AS (SELECT h, count(*) AS ch FROM bgs GROUP BY h),
          |vv AS (SELECT count(DISTINCT tok) AS v FROM
          |  (SELECT unnest(ts) AS tok FROM tok)),
          |nlls AS (SELECT doc_id,
          |    CAST(floor(ln(CAST(ch + v AS DOUBLE) / CAST(chw + 1 AS DOUBLE)) * 1000) AS BIGINT) AS nll
          |  FROM bgs JOIN bc USING (h, w) JOIN hc USING (h) CROSS JOIN vv)
          |SELECT doc_id, count(*) AS n_bigrams,
          |       CAST(sum(nll) AS BIGINT) AS sum_nll_milli,
          |       CAST(sum(nll) // count(*) AS BIGINT) AS avg_nll_milli
          |FROM nlls GROUP BY doc_id""".stripMargin))),

    // ---- T18: the BPE merge-step statistic — adjacent-char pair counts
    //      over all token instances, top-20 merge candidates; pair
    //      extraction is a projection, the count key space is the
    //      bounded symbol-pair alphabet (pure map-side combine) ----
    ("t18_bpe_merge_pairs",
      (s: SparkSession, d: String) => TextOps.bpeMergePairs(Tables.documents(s, d)),
      Some(Oracle.withSql(TOK,
        """, wd AS (SELECT unnest(ts) AS w FROM tok),
          |prs AS (SELECT unnest(list_transform(range(1, length(w)),
          |          i -> substr(w, i, 2))) AS pair
          |        FROM wd WHERE length(w) >= 2)
          |SELECT pair, count(*) AS cnt FROM prs
          |GROUP BY pair ORDER BY cnt DESC, pair LIMIT 20""".stripMargin))),

    ("t13_mixture_sample",
      (s: SparkSession, d: String) => TextOps.mixtureSample(Tables.documents(s, d)),
      Some(
        """WITH st AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
          |w AS (SELECT source, n_docs, CAST(floor(sqrt(n_docs)) AS BIGINT) AS w FROM st),
          |t AS (SELECT source, n_docs, w,
          |        CAST((100 * w) // (SELECT sum(w) FROM w) AS BIGINT) AS target_n FROM w),
          |r AS (SELECT source, doc_id,
          |        row_number() OVER (PARTITION BY source
          |          ORDER BY md5('t13|' || doc_id), doc_id) AS rk
          |      FROM documents),
          |sel AS (SELECT t.source, CAST(sum(r.doc_id) AS BIGINT) AS sel_id_sum
          |        FROM t JOIN r ON t.source = r.source AND r.rk <= t.target_n
          |        GROUP BY t.source)
          |SELECT t.source, t.n_docs, t.w, t.target_n,
          |       COALESCE(sel.sel_id_sum, 0) AS sel_id_sum
          |FROM t LEFT JOIN sel ON t.source = sel.source""".stripMargin)),

    // ---- T15: deterministic shard assignment — md5-mod routing of every
    //      document to one of 8 training shards; id-sum witnesses the
    //      SAME routing in both engines. One partial-combined 8-row
    //      aggregate; the write path at scale is the same single
    //      repartition(shard) exchange ----
    ("t15_shard_assign",
      (s: SparkSession, d: String) => TextOps.shardAssign(Tables.documents(s, d)),
      Some(Oracle.withSql(TOK,
        """, sh AS (SELECT doc_id, len(ts) AS n_tokens,
          |    CAST(('0x' || substr(md5('t15|' || doc_id), 1, 15)) AS BIGINT) % 8 AS shard
          |  FROM tok)
          |SELECT shard, count(*) AS n_docs,
          |       CAST(sum(n_tokens) AS BIGINT) AS tok_sum,
          |       CAST(sum(doc_id) AS BIGINT) AS id_sum
          |FROM sh GROUP BY shard""".stripMargin))),

    // ---- T20: hashing-trick featurization (Weinberger '09, the VW
    //      featurizer) — bucket + independent ±1 sign hash, NO vocabulary
    //      pass; per-doc nnz / l1 / order-canonical sparse-vector md5 pin
    //      the exact 64-dim vector cross-engine ----
    // ---- t25: language-ID confusion matrix — per (declared, predicted)
    //      document counts; the calibration read before trusting t2's
    //      pred_lang for routing ----
    ("t25_langid_confusion",
      (s: SparkSession, d: String) =>
        TextOps.langIdConfusion(Tables.documents(s, d)),
      Some(Oracle.withSql(TOK + LANGPRED,
        """SELECT d.lang, lp.pred_lang, count(*) AS n,
          |  CASE WHEN d.lang = lp.pred_lang THEN CAST(1 AS BIGINT)
          |       ELSE CAST(0 AS BIGINT) END AS is_diag
          |FROM lp JOIN documents d ON lp.doc_id = d.doc_id
          |GROUP BY d.lang, lp.pred_lang""".stripMargin))),

    // ---- x9: dataset datasheet — the release-note corpus summary
    //      (docs/tokens/chars/langs/dup rate/quality rate) computed in
    //      ONE pass, exact ppm integers ----
    ("x9_dataset_datasheet",
      (s: SparkSession, d: String) =>
        TextOps.datasetDatasheet(Tables.documents(s, d)),
      Some(Oracle.withSql(TOK,
        s""", pd AS (SELECT tok.doc_id, d.lang, md5(tok.text) AS h,
           |  length(tok.text) AS chars, len(ts) AS toks,
           |  CASE WHEN len(ts) >= 5 AND len(ts) <= 100000
           |        AND 100 * len(list_filter(ts, t -> t IN $enList)) >= greatest(len(ts), 1)
           |        AND len(regexp_extract_all(tok.text, '[.,!?;:]')) * 4 <= len(ts)
           |       THEN 1 ELSE 0 END AS q
           |  FROM tok JOIN documents d ON tok.doc_id = d.doc_id)
           |SELECT count(*) AS n_docs,
           |  CAST(sum(toks) AS BIGINT) AS n_tokens,
           |  CAST(sum(chars) AS BIGINT) AS n_chars,
           |  count(DISTINCT lang) AS n_langs,
           |  count(DISTINCT h) AS n_distinct_texts,
           |  CAST(sum(q) AS BIGINT) AS n_quality,
           |  1000000 * (count(*) - count(DISTINCT h)) // count(*) AS dup_ppm,
           |  1000000 * CAST(sum(q) AS BIGINT) // count(*) AS quality_ppm
           |FROM pd""".stripMargin))),

    // ---- x7: curriculum phase assignment — rare-share difficulty in
    //      exact milli units, value-coherent quartile buckets computed on
    //      the difficulty HISTOGRAM (no global ntile sort) ----
    ("x7_curriculum_buckets",
      (s: SparkSession, d: String) =>
        TextOps.curriculumBuckets(Tables.documents(s, d)),
      Some(Oracle.withSql(TOK,
        """, tokd AS (SELECT doc_id, unnest(ts) AS t FROM tok),
          |freq AS (SELECT t, count(*) AS c FROM tokd GROUP BY t),
          |nrare AS (SELECT doc_id,
          |    CAST(sum(CASE WHEN c <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS nr
          |  FROM tokd JOIN freq USING (t) GROUP BY doc_id),
          |diff AS (SELECT tok.doc_id, CAST(len(ts) AS BIGINT) AS n_tok,
          |    CASE WHEN len(ts) > 0
          |         THEN 1000 * coalesce(nr, 0) // len(ts) ELSE 0 END AS difficulty_milli
          |  FROM tok LEFT JOIN nrare ON tok.doc_id = nrare.doc_id),
          |hist AS (SELECT difficulty_milli, count(*) AS c FROM diff GROUP BY 1),
          |ph AS (SELECT difficulty_milli,
          |    least(3, 4 * coalesce(sum(c) OVER (ORDER BY difficulty_milli
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |      // (SELECT count(*) FROM diff)) AS phase
          |  FROM hist)
          |SELECT d.doc_id, d.n_tok, d.difficulty_milli, CAST(ph.phase AS BIGINT) AS phase
          |FROM diff d JOIN ph USING (difficulty_milli)""".stripMargin))),

    // ---- t24: k-anonymity audit over quasi-identifiers (lang, source,
    //      length bucket) — classes smaller than k fail the release
    //      gate; one partial-combining keyed aggregate ----
    ("t24_k_anonymity",
      (s: SparkSession, d: String) =>
        TextOps.kAnonymity(Tables.documents(s, d), k = 5),
      Some(
        """SELECT lang, source,
          |  CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
          |    t -> t <> '')) // 32 AS BIGINT) AS len_bucket,
          |  count(*) AS n,
          |  CASE WHEN count(*) >= 5 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS is_anon
          |FROM documents GROUP BY 1, 2, 3""".stripMargin)),

    // ---- t22: sliding-window chunking — overlapping 16-token windows
    //      every 8; chunk bodies pinned by md5 of the token slice ----
    ("t22_chunking",
      (s: SparkSession, d: String) =>
        TextOps.chunkDocs(Tables.documents(s, d), window = 16, stride = 8),
      Some(Oracle.withSql(TOK,
        """SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
          |  CAST(len(ch) AS BIGINT) AS n_tok,
          |  md5(array_to_string(ch, ' ')) AS chunk_fp
          |FROM (
          |  SELECT doc_id, u.ci,
          |    list_slice(ts, CAST(u.ci * 8 + 1 AS BIGINT),
          |               CAST(least(u.ci * 8 + 16, len(ts)) AS BIGINT)) AS ch
          |  FROM tok, UNNEST(range(0, ((len(ts) - 1) // 8) + 1)) AS u(ci)
          |  WHERE len(ts) > 0) t(doc_id, ci, ch)""".stripMargin))),

    // ---- t23: linear quality classifier over hashed features — the
    //      deployment half of t20: score = Σ w[h(tok) mod 64] with an
    //      md5-derived integer weight table, pass = score ≥ 0. Zero
    //      shuffle: the whole model application folds inside one
    //      projection ----
    ("t23_quality_classifier",
      (s: SparkSession, d: String) =>
        TextOps.linearQualityScore(Tables.documents(s, d), buckets = 64),
      Some(Oracle.withSql(TOK,
        """SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tok,
          |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(ts, t ->
          |    CAST(('0x' || substr(md5('lqw|' ||
          |      CAST(CAST(('0x' || substr(md5('lq|' || t), 1, 15)) AS BIGINT) % 64 AS VARCHAR)
          |    ), 1, 15)) AS BIGINT) % 2001 - 1000)),
          |    (s, v) -> s + v) AS BIGINT) AS score,
          |  CASE WHEN score >= 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS pass
          |FROM tok""".stripMargin))),

    ("t20_feature_hashing",
      (s: SparkSession, d: String) => TextOps.featureHash(Tables.documents(s, d)),
      Some(Oracle.withSql(TOK,
        """, occ AS (SELECT doc_id, u.tok AS tok FROM tok, UNNEST(ts) AS u(tok)),
          |hb AS (SELECT doc_id,
          |    CAST(('0x' || substr(md5('fh|' || tok), 1, 15)) AS BIGINT) % 64 AS bucket,
          |    CASE WHEN CAST(('0x' || substr(md5('fhs|' || tok), 1, 15)) AS BIGINT) % 2 = 0
          |         THEN 1 ELSE -1 END AS sg
          |  FROM occ),
          |wv AS (SELECT doc_id, bucket, CAST(sum(sg) AS BIGINT) AS w
          |  FROM hb GROUP BY doc_id, bucket),
          |nz AS (SELECT * FROM wv WHERE w <> 0)
          |SELECT doc_id, count(*) AS nnz, CAST(sum(abs(w)) AS BIGINT) AS l1,
          |  md5(string_agg(bucket || ':' || w, ',' ORDER BY bucket)) AS fp
          |FROM nz GROUP BY doc_id""".stripMargin))),

    // ---- T21: Heaps-law vocabulary growth at 4 doc-id checkpoints —
    //      cumulative distinct vocab via the first-occurrence trick
    //      (min(doc_id) per token, ONE token shuffle for ALL checkpoints
    //      vs one COUNT(DISTINCT) corpus re-shuffle per checkpoint) ----
    ("t21_vocab_growth",
      (s: SparkSession, d: String) => TextOps.vocabGrowth(Tables.documents(s, d)),
      Some(Oracle.withSql(TOK,
        """, occ AS (SELECT doc_id, u.tok AS tok FROM tok, UNNEST(ts) AS u(tok)),
          |fo AS (SELECT tok, min(doc_id) AS fd FROM occ GROUP BY tok),
          |mx AS (SELECT max(doc_id) AS m FROM documents),
          |cps AS (SELECT CAST(u.i AS BIGINT) AS cp_idx,
          |          (SELECT m FROM mx) * CAST(u.i AS BIGINT) // 4 AS cp_doc
          |        FROM UNNEST([1, 2, 3, 4]) AS u(i))
          |SELECT c.cp_idx, c.cp_doc,
          |  (SELECT CAST(count(*) AS BIGINT) FROM occ o WHERE o.doc_id <= c.cp_doc) AS n_occ,
          |  (SELECT CAST(count(*) AS BIGINT) FROM fo f WHERE f.fd <= c.cp_doc) AS n_vocab
          |FROM cps c""".stripMargin))),

    // ---- X1: the composite corpus-build pipeline — quality filter (t3's
    //      rule) → exact dedup (d1's keeper rule on t4's fingerprint) →
    //      per-language doc/token budget, as ONE declarative plan ----
    // ---- T8: sequence packing — contiguous fill-then-overflow
    //      assignment of docs to fixed-token-budget training sequences,
    //      windowed per language stream (the honest unit of sequential
    //      work; cross-shard order carries no meaning). Note the oracle's
    //      window sum is HUGEINT in DuckDB — every derived output column
    //      is CAST (the r11 lesson, now guarded by check.py) ----
    ("t8_sequence_pack",
      (s: SparkSession, d: String) => TextOps.sequencePack(Tables.documents(s, d)),
      Some(Oracle.withSql(TOK.replace("SELECT doc_id, text,", "SELECT doc_id, lang, text,"),
        """, s1 AS (SELECT doc_id, lang, len(ts) AS n_tokens FROM tok),
          |s2 AS (SELECT *, COALESCE(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
          |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_cum
          |       FROM s1),
          |s3 AS (SELECT *, CAST(prev_cum // 512 AS BIGINT) AS seq_id FROM s2)
          |SELECT lang, seq_id, count(*) AS n_docs,
          |       CAST(sum(n_tokens) AS BIGINT) AS tok_sum,
          |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
          |FROM s3 GROUP BY lang, seq_id""".stripMargin))),

    // ---- T9: corpus-relative rarity — the share of a document's token
    //      occurrences whose GLOBAL frequency is ≤ 2 (OCR noise / junk
    //      vocabulary signal). Integer counts only: a log-prob perplexity
    //      would be accumulation-order float ----
    ("t9_rarity_score",
      (s: SparkSession, d: String) => TextOps.rarityScore(Tables.documents(s, d)),
      Some(Oracle.withSql(TOK,
        """, tokd AS (SELECT doc_id, unnest(ts) AS t FROM tok),
          |freq AS (SELECT t, count(*) AS c FROM tokd GROUP BY t)
          |SELECT doc_id, count(*) AS n_tokens,
          |       CAST(sum(CASE WHEN c <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
          |       (100 * CAST(sum(CASE WHEN c <= 2 THEN 1 ELSE 0 END) AS BIGINT)) // count(*) AS rare_pct
          |FROM tokd JOIN freq USING (t)
          |GROUP BY doc_id""".stripMargin))),

    // ---- T10: Gopher repetition filters — top-bigram char share and
    //      duplicate-5-gram occurrence share, exact ppm integers; the
    //      bigram mode is the codegen TopBigramRun (per-row, no shuffle;
    //      the oracle computes the same mode relationally) ----
    ("t10_repetition",
      (s: SparkSession, d: String) => TextOps.repetitionScore(Tables.documents(s, d)),
      Some(Oracle.withSql(TOK,
        """, bg AS (SELECT doc_id,
          |    unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])) AS g
          |  FROM tok WHERE len(ts) >= 2),
          |btop AS (SELECT doc_id, g, c FROM (
          |  SELECT doc_id, g, count(*) AS c,
          |         row_number() OVER (PARTITION BY doc_id ORDER BY count(*) DESC, g) AS rn
          |  FROM bg GROUP BY doc_id, g) WHERE rn = 1),
          |g5 AS (SELECT doc_id,
          |    CASE WHEN len(ts) >= 5
          |         THEN list_transform(range(1, len(ts) - 3),
          |                i -> md5(array_to_string(ts[i:i+4], ' ')))
          |         ELSE [] END AS gs
          |  FROM tok),
          |ppm AS (SELECT t.doc_id, len(t.ts) AS n_tokens,
          |    COALESCE(b.c, 0) AS top_bigram_n,
          |    COALESCE(b.g, '') AS top_bigram,
          |    CAST((COALESCE(b.c, 0) * length(COALESCE(b.g, '')) * 1000000)
          |         // greatest(length(t.text), 1) AS BIGINT) AS top_bigram_char_ppm,
          |    CAST(((len(g.gs) - len(list_distinct(g.gs))) * 1000000)
          |         // greatest(len(g.gs), 1) AS BIGINT) AS dup_5gram_ppm
          |  FROM tok t JOIN g5 g ON t.doc_id = g.doc_id
          |  LEFT JOIN btop b ON t.doc_id = b.doc_id)
          |SELECT *, CASE WHEN top_bigram_char_ppm > 200000 OR dup_5gram_ppm > 150000
          |               THEN 1 ELSE 0 END AS is_repetitive
          |FROM ppm""".stripMargin))),

    // ---- T11: PII detection + redaction — counts per class BEFORE
    //      redaction, then fixed-order replace (email → IPv4 → phone);
    //      patterns are shared constants from TextOps so the engines
    //      cannot drift, and use only the Java∩RE2 regex subset. The
    //      fixture text has no PII, so both engines append the SAME
    //      doc_id-derived email/IP/phone (every row has true positives,
    //      not just the zero case). Map-only: no shuffle ----
    ("t11_pii_redact",
      (s: SparkSession, d: String) => TextOps.piiRedact(Tables.documents(s, d)),
      Some {
        s"""WITH a AS (
           |  SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR) ||
           |    '@mail' || CAST(doc_id % 10 AS VARCHAR) || '.org ip 10.' ||
           |    CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR) ||
           |    ' tel 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS aug
           |  FROM documents),
           |r AS (SELECT doc_id, aug,
           |  regexp_replace(regexp_replace(regexp_replace(aug,
           |    '${TextOps.EmailPat}', '<EMAIL>', 'g'),
           |    '${TextOps.Ipv4Pat}', '<IP>', 'g'),
           |    '${TextOps.PhonePat}', '<PHONE>', 'g') AS red
           |  FROM a)
           |SELECT doc_id,
           |  len(regexp_extract_all(aug, '${TextOps.EmailPat}')) AS n_email,
           |  len(regexp_extract_all(aug, '${TextOps.Ipv4Pat}')) AS n_ip,
           |  len(regexp_extract_all(aug, '${TextOps.PhonePat}')) AS n_phone,
           |  length(red) AS red_len, md5(red) AS red_fp
           |FROM r""".stripMargin
      }),

    // ---- T12: DSIR-style importance weighting (Xie et al. '23) — the
    //      target-vs-raw n-gram likelihood ratio recast as exact integer
    //      cross-multiplication (tc·Na > ac·Nt per bigram occurrence):
    //      the same "looks like the quality subset" ranking signal with
    //      none of the float accumulation-order hazard. Every DuckDB sum
    //      is CAST to BIGINT (the r11 HUGEINT lesson) ----
    ("t12_dsir_weighting",
      (s: SparkSession, d: String) => TextOps.dsirWeighting(Tables.documents(s, d)),
      Some(Oracle.withSql(TOK,
        s""", q AS (SELECT doc_id, ts,
           |    CASE WHEN len(ts) >= 5 AND len(ts) <= 100000
           |          AND 100 * len(list_filter(ts, t -> t IN $enList)) >= greatest(len(ts), 1)
           |          AND len(regexp_extract_all(text, '[.,!?;:]')) * 4 <= len(ts)
           |         THEN 1 ELSE 0 END AS is_t
           |  FROM tok),
           |gd AS (SELECT doc_id, is_t,
           |    unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])) AS gm
           |  FROM q WHERE len(ts) >= 2),
           |freq AS (SELECT gm, count(*) AS ac, CAST(sum(is_t) AS BIGINT) AS tc
           |  FROM gd GROUP BY gm),
           |tot AS (SELECT count(*) AS na, CAST(sum(is_t) AS BIGINT) AS nt FROM gd)
           |SELECT gd.doc_id, count(*) AS n_grams,
           |  CAST(sum(CASE WHEN f.tc * t.na > f.ac * t.nt THEN 1 ELSE 0 END) AS BIGINT) AS n_target_like,
           |  (100 * CAST(sum(CASE WHEN f.tc * t.na > f.ac * t.nt THEN 1 ELSE 0 END) AS BIGINT))
           |    // greatest(count(*), 1) AS dsir_pct
           |FROM gd JOIN freq f USING (gm) CROSS JOIN tot t
           |GROUP BY gd.doc_id""".stripMargin))),

    // ---- T19: count-min sketch token counting — a d×w counter grid
    //      (constant-width shuffle regardless of vocabulary) graded on 20
    //      md5-probed tokens against their exact counts; min-over-rows
    //      estimate ≥ exact always, engine-exact via the shared md5
    //      bucket hashing ----
    ("t19_countmin_sketch",
      (s: SparkSession, d: String) =>
        TextOps.countMinHeavyHitters(Tables.documents(s, d)),
      Some(
        """WITH tokr AS (SELECT unnest(list_filter(
          |    string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS t
          |  FROM documents),
          |inst AS (SELECT t, r FROM tokr, UNNEST([0, 1, 2, 3]) AS u(r)),
          |cms AS (SELECT r,
          |    CAST(('0x' || substr(md5('cms' || r || '|' || t), 1, 15)) AS BIGINT) % 256 AS b,
          |    count(*) AS c
          |  FROM inst GROUP BY 1, 2),
          |probes AS (SELECT t FROM (SELECT DISTINCT t FROM tokr)
          |  ORDER BY md5('cmsq|' || t), t LIMIT 20),
          |ex AS (SELECT t, count(*) AS exact_n FROM tokr
          |  WHERE t IN (SELECT t FROM probes) GROUP BY t),
          |est AS (SELECT p.t, min(c.c) AS cms_est
          |  FROM probes p, UNNEST([0, 1, 2, 3]) AS u(r) JOIN cms c
          |    ON c.r = u.r
          |   AND c.b = CAST(('0x' || substr(md5('cms' || u.r || '|' || p.t), 1, 15)) AS BIGINT) % 256
          |  GROUP BY p.t)
          |SELECT ex.t, ex.exact_n, est.cms_est FROM ex JOIN est USING (t)""".stripMargin)),

    ("x1_training_data_prep",
      (s: SparkSession, d: String) => TextOps.trainingDataPrep(Tables.documents(s, d)),
      Some(Oracle.withSql(TOK.replace("SELECT doc_id, text,", "SELECT doc_id, lang, text,"),
        s""", q1 AS (SELECT doc_id, lang, text, len(ts) AS n_tokens,
           |  len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
           |  len(list_filter(ts, t -> t IN $enList)) AS n_stop
           |  FROM tok),
           |quality AS (SELECT * FROM q1
           |  WHERE n_tokens >= 5 AND n_tokens <= 100000
           |    AND (100 * n_stop) // greatest(n_tokens, 1) >= 1
           |    AND n_punct * 4 <= n_tokens),
           |keepers AS (
           |  SELECT min(doc_id) AS doc_id FROM quality
           |  GROUP BY md5(trim(regexp_replace(lower(text), '[\\t\\n\\x0B\\f\\r ]+', ' ', 'g')))),
           |kept AS (SELECT q.* FROM quality q JOIN keepers USING (doc_id))
           |SELECT lang, count(*) AS n_docs,
           |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           |       CAST(sum(doc_id) AS BIGINT) AS id_sum
           |FROM kept GROUP BY lang""".stripMargin))),
  )
}
