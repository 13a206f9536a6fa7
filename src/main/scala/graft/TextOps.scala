package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline surface
  * (builder prompt: language-ID, quality scoring, token counting,
  * fingerprinting) over the `documents` table.
  *
  * Every derived quantity is integer or md5-string valued so the DuckDB
  * oracle matches bit-for-bit; ratios are scaled-integer percentages.
  */
object TextOps {

  /** Lower-cased alphanumeric tokens, empty strings dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Tiny per-language stopword lists for the n-gram/stopword-voting
    * language-ID heuristic. Kept identical in [[Oracle]] SQL. */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in"),
    "es" -> Seq("el", "la", "de", "y", "que", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "les", "et", "est", "une"))

  private def stopScore(ts: Column, words: Seq[String]): Column =
    size(filter(ts, t => t.isInCollection(words)))

  /** Token statistics per document (token counting operator). */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text")).as("len"),
      size(tokens(col("text"))).as("n_tokens"),
      length(regexp_replace(lower(col("text")), "[^a-z0-9]", "")).as("n_alnum"))

  /** Stopword-voting language ID: per-language hit counts + argmax with a
    * fixed priority order (en > es > de > fr) on ties. */
  def langId(docs: DataFrame): DataFrame = {
    val ts = tokens(col("text"))
    val scored = docs.select(
      (Seq(col("doc_id")) ++
        Stopwords.map { case (l, ws) => stopScore(ts, ws).as(s"s_$l") }): _*)
    scored.withColumn("pred_lang",
      when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de") && col("s_en") >= col("s_fr"), "en")
        .when(col("s_es") >= col("s_de") && col("s_es") >= col("s_fr"), "es")
        .when(col("s_de") >= col("s_fr"), "de")
        .otherwise("fr"))
  }

  /** The t3 quality rule as ONE reusable predicate — the single place the
    * thresholds live. qualityScore (t3), trainingDataPrep (x1), and the
    * streaming corpusIngest gate all apply this condition; a threshold
    * change here moves all three together. The stop-ratio clause uses the
    * division-free equivalent: (100·nStop) div max(nTokens,1) >= 1 ⟺
    * 100·nStop >= max(nTokens,1) for non-negative integers. */
  def qualityCond(nTokens: Column, nPunct: Column, nStop: Column): Column =
    nTokens >= 5 && nTokens <= 100000 &&
      nStop * 100 >= greatest(nTokens, lit(1)) &&
      nPunct * 4 <= nTokens

  /** Quality scoring: length/punctuation/digit/stopword-ratio heuristics;
    * the composite flag uses only integer comparisons. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val ts = tokens(col("text"))
    val enStop = Stopwords.head._2
    docs.select(
        col("doc_id"),
        length(col("text")).as("len"),
        size(ts).as("n_tokens"),
        expr("regexp_count(text, '[.,!?;:]')").as("n_punct"),
        expr("regexp_count(text, '[0-9]')").as("n_digit"),
        stopScore(ts, enStop).as("n_stop"))
      .withColumn("stop_pct", expr("(100 * n_stop) div greatest(n_tokens, 1)"))
      .withColumn("is_quality",
        qualityCond(col("n_tokens"), col("n_punct"), col("n_stop")).cast("int"))
  }

  /** Whitespace run as an EXPLICIT class, not \s: Java's \s includes
    * U+000B (vertical tab) while DuckDB/RE2's does not, so a bare \s in
    * a normalization that feeds a cross-engine hash (t4/x1/corpusIngest)
    * is a latent parity break on texts containing \x0B — the same trap
    * [[BpePattern]] documents for tokenization. Both the Spark
    * expressions and the DuckDB oracles must use this exact class. */
  val WsRun: String = "[\\t\\n\\x0B\\f\\r ]+"

  /** Document fingerprint: md5 over the whitespace-normalized lower-cased
    * text (the deterministic stand-in for a rolling hash). */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      md5(trim(regexp_replace(lower(col("text")), WsRun, " "))).as("fp"))

  /** GPT-2-style pretokenizer regex (contraction suffixes, space-prefixed
    * letter runs, digit runs, punctuation runs, whitespace) — the
    * "BPE-ish" token counting surface. The alternation uses no
    * constructs that differ between Java regex (Spark) and RE2 (DuckDB),
    * so both engines produce identical boundaries; t6's per-document
    * fingerprint of the joined token list pins that, not just the count.
    * Whitespace is the EXPLICIT class [\t\n\x0B\f\r ] rather than \s:
    * Java's \s includes U+000B vertical tab but RE2's does not, so a
    * bare \s would tokenize a vertical tab differently per engine. */
  val BpePattern: String =
    "'[sdmt]|'ll|'ve|'re| ?\\p{L}+| ?\\p{N}+| ?[^\\t\\n\\x0B\\f\\r \\p{L}\\p{N}]+|[\\t\\n\\x0B\\f\\r ]+"

  /** T6: BPE-ish pretokenization stats — token count plus an md5 over the
    * U+0001-joined token list (boundary-exact cross-engine witness). */
  def bpeTokenStats(docs: DataFrame): DataFrame = {
    val toks = regexp_extract_all(col("text"), lit(BpePattern), lit(0))
    docs.select(col("doc_id"),
      size(toks).as("n_bpe"),
      md5(concat_ws("\u0001", toks)).as("tok_fp"))
  }

  /** T7: winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    * SIGMOD'03 — the MOSS algorithm; the reference's rolling-hash
    * fingerprint slot done properly): hash every char `k`-gram, then
    * keep the MINIMUM hash of each sliding window of `w` consecutive
    * k-gram hashes. Guarantees: any shared substring of length ≥ k+w-1
    * yields a shared fingerprint (shift-resistant, unlike fixed-stride
    * sampling), and ~1/w of positions are selected. Emits the distinct
    * fingerprint count plus an order-canonical digest of the selected
    * set — the boundary-exact cross-engine witness.
    *
    * Plan shape: one narrow projection per document (two nested
    * higher-order transforms + distinct/sort inside the row), NO shuffle
    * and no row amplification — the same scale story as SimHash. Texts
    * shorter than k contribute one whole-text window on both engines
    * (the sequence/range bounds are floored to one element identically). */
  private[graft] def winnowSets(docs: DataFrame, k: Int, w: Int): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.WinnowArray.of(docs.sparkSession, col("text"), k, w).as("fps"))

  /** The composed-from-built-ins winnow derivation (mirrors the oracle
    * SQL shape) — spec-pinned value-identical to the codegen
    * [[graft.functions.WinnowArray]] path above, which replaces it
    * because the two nested higher-order transforms here are interpreted
    * per element. */
  private[graft] def winnowSetsComposed(docs: DataFrame, k: Int = 8, w: Int = 4): DataFrame =
    docs.select(col("doc_id"),
        expr(s"transform(sequence(1, greatest(length(text) - ${k - 1}, 1)), " +
          s"i -> md5(substring(text, i, $k)))").as("hs"))
      .select(col("doc_id"),
        expr(s"array_sort(array_distinct(transform(" +
          s"sequence(1, greatest(size(hs) - ${w - 1}, 1)), " +
          s"j -> array_min(slice(hs, j, $w)))))").as("fps"))

  def winnowFingerprints(docs: DataFrame, k: Int = 8, w: Int = 4): DataFrame =
    winnowSets(docs, k, w)
      .select(col("doc_id"), size(col("fps")).as("n_fp"),
        md5(concat_ws("\u0001", col("fps"))).as("fp_digest"))

  /** Exploded (doc_id, fp) winnowing rows — the equi-join shape for
    * MOSS-style overlap detection (same pattern as [[graft.Dedup
    * .contamination]]: fingerprints are the shuffle/broadcast key).
    * The fingerprint SETS are materialized (eager localCheckpoint)
    * because the overlap pipeline consumes them from several plan
    * branches (df cut + both pair-join sides). The codegen
    * [[graft.functions.WinnowArray]] also closed the earlier
    * HOF-inlining trap here: with the composed form, collapsing the
    * fps projection into the Generate re-evaluated the k-gram-hash
    * array per window element — O(len²) md5 calls per document,
    * measured 30× slower at sf0.01. */
  def winnowPrints(docs: DataFrame, k: Int = 8, w: Int = 4): DataFrame =
    winnowSets(docs, k, w).localCheckpoint(true)
      .select(col("doc_id"), explode(col("fps")).as("fp"))

  /** Deterministic hash-sample membership: true for ~hexLt/16 of rows.
    * md5 of a salted key compared as a hex STRING — identical in any
    * engine, stable under reruns and repartitioning (the property that
    * makes hash sampling the only sampling a distributed pipeline should
    * use: no RNG state, no per-partition seeds). */
  def hashSampled(key: Column, salt: String, hexLt: String): Column =
    substring(md5(concat(lit(salt), key.cast("string"))), 1, 1) < lit(hexLt)

  /** Stratified deterministic sample over the `documents` table: per
    * language stratum, the full count, the sampled count, and the id-sum
    * of the sampled members (the order-independent integer witness that
    * the SAME documents were chosen, not merely the same number).
    * One partial-aggregated groupBy — at 100 TB the sample decision is a
    * per-row projection, so the scan parallelizes and nothing shuffles
    * but the 5-row stratum aggregate. */
  def stratifiedSample(docs: DataFrame, salt: String = "t5|",
                       hexLt: String = "4"): DataFrame = {
    val in = hashSampled(col("doc_id"), salt, hexLt)
    docs.groupBy(col("lang")).agg(
      count(lit(1)).as("n_total"),
      count(when(in, 1)).as("n_sampled"),
      sum(when(in, col("doc_id"))).cast("long").as("sampled_id_sum"))
  }

  /** T13: temperature-scaled domain-mixture sampling — the corpus-blend
    * step of a training-data build. Sampling sources proportionally to
    * count^α (α = 1/2 here, the common "temperature" flattening) upweights
    * rare domains relative to their natural share. Per source this emits:
    * the document count, the integer-exact weight floor(sqrt(n)) (IEEE-754
    * sqrt is correctly rounded, so the floor is engine-exact), the
    * integer-division target count (budget·w) div Σw, and the id-sum of
    * the selected documents — selection is the target_n smallest
    * md5(salt‖doc_id) within each source: a deterministic rank, no RNG,
    * stable under reruns and repartitioning.
    *
    * Scale shape: stats and targets are a one-row-per-source aggregate
    * (broadcast back); the rank is a per-source window, so parallelism =
    * #sources — the honest bound for exact-count-per-stratum selection
    * (a web corpus has 10⁴–10⁶ domains, ample). For the few-giant-strata
    * regime use the threshold sampler [[stratifiedSample]] instead: a
    * per-row projection with no window, at the cost of binomial rather
    * than exact per-stratum counts. */
  def mixtureSample(docs: DataFrame, budget: Int = 100,
                    salt: String = "t13|"): DataFrame = {
    val stats = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .withColumn("w", floor(sqrt(col("n_docs"))).cast("long"))
    val tgt = stats.crossJoin(broadcast(stats.agg(sum("w").as("tw"))))
      .withColumn("target_n", expr(s"($budget * w) div tw"))
      .select("source", "n_docs", "w", "target_n")
    val ranked = docs.select(col("source"), col("doc_id"),
        md5(concat(lit(salt), col("doc_id").cast("string"))).as("h"))
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy("h", "doc_id")))
    val sel = ranked.join(broadcast(tgt.select("source", "target_n")), "source")
      .filter(col("rk") <= col("target_n"))
      .groupBy("source").agg(sum("doc_id").cast("long").as("sel_id_sum"))
    tgt.join(sel, Seq("source"), "left").na.fill(0L, Seq("sel_id_sum"))
  }

  /** X1: the composite training-data-prep pipeline — quality filter →
    * exact dedup (keep min doc_id per normalized-text fingerprint) →
    * per-language document/token budget. This is the end-to-end shape a
    * corpus build runs nightly; each stage is one of the already-verified
    * operators (t3 filter, t4 fingerprint, d1 keeper rule) composed as a
    * single declarative plan, so Catalyst pipelines the scan → filter →
    * fingerprint-groupBy → semi-join → stratum aggregate with no
    * materialization between stages. */
  /** T8: sequence packing — assign documents (in doc_id order, within a
    * language stream) to fixed-token-budget training sequences: a doc
    * starts sequence `floor(prev_cum_tokens / budget)`, the contiguous
    * fill-then-overflow packing a training-data builder uses to batch
    * documents into ~budget-token samples. Pure integer window
    * arithmetic — deterministic and engine-exact.
    *
    * Scale contract: the running sum is windowed PER LANGUAGE, so
    * parallelism = #streams; a 100 TB corpus packs within bounded
    * sub-shards (e.g. (lang, input-split)) exactly like this, because
    * packing order across shards carries no meaning — the per-shard
    * window is the honest unit of sequential work, not a global sort. */
  def sequencePack(docs: DataFrame, budget: Int = 512): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs.select(col("doc_id"), col("lang"), size(tokens(col("text"))).as("n_tokens"))
      .withColumn("prev_cum", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("seq_id", expr(s"prev_cum div $budget"))
      .groupBy("lang", "seq_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").cast("long").as("tok_sum"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
  }

  /** T15: deterministic training-shard assignment — the "write the
    * corpus as N shards" step of a training-data build: every document
    * routes to shard md5(salt‖doc_id) mod nShards (content-independent,
    * rerun/repartition-stable, uniform in expectation), and the output
    * reports each shard's document count, token mass and id-sum (the
    * order-independent witness that both engines routed the SAME
    * documents, not merely the same counts). The hash is the same
    * 60-bit md5-prefix integer as every other sampler in the repo.
    *
    * Scale shape: the shard decision is a per-row codegen projection; the
    * only exchange is the nShards-row aggregate, which partial-combines.
    * The real shard WRITE at 100 TB is `repartition(nShards, shard)` +
    * partitioned parquet — the same one keyed exchange. */
  /** T20: hashing-trick featurization (Weinberger et al., "Feature
    * Hashing for Large Scale Multitask Learning", ICML '09 — the
    * Vowpal-Wabbit featurizer): every token occurrence routes to
    * bucket = h(tok) mod `dim`, a second independent hash gives the ±1
    * sign so collisions cancel in expectation, and NO vocabulary pass is
    * needed — the property that makes this the standard text featurizer
    * at corpus scale (stateless, fixed width, map-only until the
    * per-document combine). Output per document: nnz (surviving
    * buckets), l1 = Σ|w|, and an order-canonical md5 fingerprint of the
    * sparse (bucket:weight) list — the fingerprint pins the EXACT vector
    * cross-engine without hauling `dim` columns through the compare.
    * Documents with zero tokens (or full sign cancellation everywhere)
    * have an empty vector and drop out, in both engines.
    *
    * Scale shape: one explode, one (doc, bucket) partial-combining
    * shuffle, one doc-keyed combine — linear in token count,
    * vocabulary-free (no vocab build, no broadcast, unlike t12/t14). */
  def featureHash(docs: DataFrame, dim: Int = 64, salt: String = "fh"): DataFrame = {
    val bucket = expr(s"CAST(conv(substring(md5(concat('$salt|', tok)), 1, 15), 16, 10) AS BIGINT) % $dim")
    val sgn = expr(s"CASE WHEN CAST(conv(substring(md5(concat('${salt}s|', tok)), 1, 15), 16, 10) AS BIGINT) % 2 = 0 THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END")
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"), bucket.as("bucket"), sgn.as("sg"))
      .groupBy("doc_id", "bucket").agg(sum("sg").as("w"))
      .filter(col("w") =!= 0)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nnz"),
        sum(abs(col("w"))).cast("long").as("l1"),
        md5(concat_ws(",", expr(
          """transform(array_sort(collect_list(struct(bucket, w))),
            |  s -> concat(cast(s.bucket as string), ':', cast(s.w as string)))""".stripMargin)))
          .as("fp"))
  }

  /** T21: vocabulary-growth diagnostics (the Heaps-law curve V(n) that
    * corpus reports plot, and the practical "is more data still adding
    * vocabulary?" signal for dedup/curation): at `parts` doc-id
    * checkpoints, the cumulative token occurrences and the cumulative
    * DISTINCT vocabulary. The distinct-per-prefix is computed with the
    * first-occurrence trick — min(doc_id) per token, ONE token-keyed
    * shuffle — so the cost is independent of checkpoint count; a naive
    * per-checkpoint `COUNT(DISTINCT)` re-shuffles the corpus once per
    * checkpoint. Occurrence totals ride per-document token counts
    * (document-sized, not occurrence-sized) against the broadcast
    * checkpoint row set. All integers: engine-exact. */
  def vocabGrowth(docs: DataFrame, parts: Int = 4): DataFrame = {
    val occ = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val first = occ.groupBy("tok").agg(min("doc_id").as("fd"))
    val mx = docs.agg(max("doc_id")).head().getLong(0)
    val cps = broadcast(docs.sparkSession.range(1, parts + 1)
      .select(col("id").as("cp_idx"),
        expr(s"($mx * id) div $parts").as("cp_doc")))
    val perDoc = docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("nt"))
    val nOcc = perDoc.crossJoin(cps).filter(col("doc_id") <= col("cp_doc"))
      .groupBy("cp_idx", "cp_doc").agg(sum("nt").cast("long").as("n_occ"))
    val nVoc = first.crossJoin(cps).filter(col("fd") <= col("cp_doc"))
      .groupBy("cp_idx", "cp_doc").agg(count(lit(1)).as("n_vocab"))
    // A checkpoint whose prefix has zero occurrences (or zero
    // first-occurring vocab) must still emit a row with 0 — the oracle's
    // scalar subqueries do. Anchor on the broadcast checkpoint frame and
    // left-join both aggregates.
    cps.join(nOcc, Seq("cp_idx", "cp_doc"), "left")
      .join(nVoc, Seq("cp_idx", "cp_doc"), "left")
      .select(col("cp_idx"), col("cp_doc"),
        coalesce(col("n_occ"), lit(0L)).as("n_occ"),
        coalesce(col("n_vocab"), lit(0L)).as("n_vocab"))
  }

  /** T22: sliding-window document chunking — the context-window packer's
    * upstream sibling and the RAG indexer's unit of retrieval: each
    * document becomes overlapping token windows of `window` tokens every
    * `stride` (stride < size ⇒ overlap, so no boundary sentence is lost
    * to a split). Chunk identity is (doc_id, chunk_idx); the chunk BODY
    * is pinned cross-engine by an md5 of the space-joined token slice, so
    * the compare certifies the exact token spans, not just counts.
    * Window starts are 0, stride, 2·stride … < n_tokens — every token is
    * covered, the tail chunk may be short, and a doc shorter than one
    * window yields exactly one chunk.
    *
    * Scale shape: pure per-row projection + explode (fan-out bounded by
    * n_tokens/stride per doc) — no shuffle, no join; at 100 TB this is a
    * map-only pass that parallelizes with the scan. */
  def chunkDocs(docs: DataFrame, window: Int = 16, stride: Int = 8): DataFrame =
    docs
      .select(col("doc_id"), tokens(col("text")).as("ts"))
      .filter(size(col("ts")) > 0)
      .select(col("doc_id"), col("ts"),
        explode(expr(s"sequence(0, (size(ts) - 1) div $stride)")).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        expr(s"slice(ts, chunk_idx * $stride + 1, $window)").as("chunk"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("chunk")).cast("long").as("n_tok"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_fp"))

  /** T23: linear quality classifier over hashed features — APPLYING a
    * trained fastText/logistic-style filter at corpus scale (the
    * deployment half of [[featureHash]]'s training-side featurizer):
    * score(doc) = Σ_tokens w[h(tok) mod B]. The weight table is
    * bucket-indexed and deterministic here (w[b] = md5-derived integer in
    * [-1000, 1000], standing in for trained weights — same contract, no
    * model file), so both engines score identically in exact integers;
    * `pass` is the score ≥ 0 gate a curation pipeline would branch on.
    *
    * Scale shape: ZERO shuffle — the whole classifier folds inside one
    * codegen'd projection per document (`aggregate` over the token
    * array); a real deployment broadcasts the B-entry weight array and
    * keeps the same map-only shape. This is the cheapest possible
    * classifier application: no explode, no vocab join, no UDF. */
  def linearQualityScore(docs: DataFrame, buckets: Int = 64,
                         salt: String = "lq"): DataFrame = {
    val wExpr =
      s"""aggregate(ts, CAST(0 AS BIGINT), (s, t) -> s +
         |  CAST(conv(substring(md5(concat('${salt}w|',
         |    CAST(CAST(conv(substring(md5(concat('$salt|', t)), 1, 15), 16, 10) AS BIGINT) % $buckets AS STRING)
         |  )), 1, 15), 16, 10) AS BIGINT) % 2001 - 1000)""".stripMargin
    docs.select(col("doc_id"), tokens(col("text")).as("ts"))
      .select(col("doc_id"),
        size(col("ts")).cast("long").as("n_tok"),
        expr(wExpr).as("score"))
      .withColumn("pass", (col("score") >= 0).cast("long"))
  }

  def shardAssign(docs: DataFrame, nShards: Int = 8,
                  salt: String = "t15"): DataFrame = {
    val h = expr(s"CAST(conv(substring(md5(concat('$salt|', " +
      "CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)")
    docs.select(col("doc_id"), (h % nShards).as("shard"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").cast("long").as("tok_sum"),
        sum("doc_id").cast("long").as("id_sum"))
  }

  /** T9: corpus-relative rarity score — per document, how many of its
    * token OCCURRENCES are corpus-rare (global frequency ≤ maxFreq).
    * A high rare-occurrence share flags OCR noise, boilerplate IDs and
    * junk vocabularies; integer counts only, so engine-exact (a log-prob
    * perplexity would be accumulation-order float). Two keyed shuffles
    * (corpus frequency, per-doc re-aggregation) + one vocab-sized join —
    * every stage partial-aggregates. Token-less documents emit no row
    * (same as the oracle's join semantics). */
  /** X7: curriculum phase assignment — order-by-difficulty scheduling for
    * curriculum learning (Bengio et al. '09 applied to corpus curation:
    * easy-first phases): difficulty = the t9 rare-occurrence share in
    * exact milli units, and the corpus splits into `phases` quartile-ish
    * buckets that training consumes in order. The bucketing is
    * VALUE-COHERENT: every doc with the same difficulty value lands in
    * the same phase (phase boundary = rank of the value's first doc), so
    * no intra-value tiebreak is needed and the assignment is engine-exact.
    *
    * Scale shape: a global `ntile` would sort the corpus through ONE
    * window partition — the classic non-scalable move. Instead the
    * difficulty HISTOGRAM (≤1001 integer values, data-size-independent)
    * is aggregated (partial-combining), the phase per value is computed
    * on that tiny table, and phases broadcast-join back onto the docs:
    * corpus-sized work stays map-side, the global-order statistic costs
    * a histogram. */
  def curriculumBuckets(docs: DataFrame, maxFreq: Long = 2L,
                        phases: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tokd = docs.select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .localCheckpoint(true)
    val freq = tokd.groupBy("t").agg(count(lit(1)).as("c"))
    val nRare = tokd.join(freq, "t")
      .groupBy("doc_id")
      .agg(sum(when(col("c") <= maxFreq, 1L).otherwise(0L)).as("nr"))
    val diff = docs.select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tok"))
      .join(nRare, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"),
        when(col("n_tok") > 0,
          expr("1000 * coalesce(nr, 0) div n_tok")).otherwise(0L)
          .as("difficulty_milli"))
      .localCheckpoint(true)
    val wv = Window.orderBy("difficulty_milli")
      .rowsBetween(Window.unboundedPreceding, -1)
    val hist = diff.groupBy("difficulty_milli").agg(count(lit(1)).as("c"))
      .withColumn("cb", coalesce(sum("c").over(wv), lit(0L)))
      .crossJoin(broadcast(diff.agg(count(lit(1)).as("n"))))
      .select(col("difficulty_milli"),
        least(lit(phases - 1L), expr(s"$phases * cb div n")).as("phase"))
    diff.join(broadcast(hist), "difficulty_milli")
      .select(col("doc_id"), col("n_tok"), col("difficulty_milli"), col("phase"))
  }

  /** T25: language-ID confusion matrix — the calibration table that
    * decides whether the t2 heuristic is trustworthy per language: count
    * of documents per (declared lang, predicted lang) cell plus the
    * diagonal flag. A curation pipeline reads the off-diagonal mass
    * before trusting pred_lang for routing. One |langs|²-keyed
    * partial-combining aggregate over the t2 projection — scan-bound. */
  def langIdConfusion(docs: DataFrame): DataFrame =
    langId(docs)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .withColumn("is_diag", (col("lang") === col("pred_lang")).cast("long"))

  /** X9: dataset datasheet — the one-row corpus summary a release ships
    * (the "datasheets for datasets" numbers, Gebru et al. '21, computed
    * not hand-written): document/token/char mass, language count,
    * exact-dup rate and quality-pass rate in exact ppm. ONE pass over
    * the corpus feeds every statistic: per-doc projections aggregate
    * partial-combining; the dup rate rides the d1 hash count-distinct.
    * All integers, so the datasheet is engine-exact. */
  def datasetDatasheet(docs: DataFrame): DataFrame = {
    val ts = tokens(col("text"))
    val enStop = Stopwords.head._2
    val perDoc = docs.select(
      col("doc_id"), col("lang"), md5(col("text")).as("h"),
      length(col("text")).cast("long").as("chars"),
      size(ts).cast("long").as("toks"),
      qualityCond(size(ts), expr("regexp_count(text, '[.,!?;:]')"),
        stopScore(ts, enStop)).cast("long").as("q"))
    perDoc.agg(
      count(lit(1)).as("n_docs"),
      sum("toks").cast("long").as("n_tokens"),
      sum("chars").cast("long").as("n_chars"),
      countDistinct("lang").as("n_langs"),
      countDistinct("h").as("n_distinct_texts"),
      sum("q").cast("long").as("n_quality"))
      .select(col("n_docs"), col("n_tokens"), col("n_chars"), col("n_langs"),
        col("n_distinct_texts"), col("n_quality"),
        expr("1000000 * (n_docs - n_distinct_texts) div n_docs").as("dup_ppm"),
        expr("1000000 * n_quality div n_docs").as("quality_ppm"))
  }

  /** X8: RAG indexing composite — the retrieval-corpus build chained as
    * ONE declarative plan: [[chunkDocs]] splits the corpus into
    * overlapping windows, each chunk gets an embedding, and retrieval is
    * cosine top-k against a query chunk. The embedder here is the
    * deterministic stand-in the multimodal suite uses for codecs — an
    * md5-derived integer-valued vector per chunk fingerprint (a real
    * deployment swaps in a model server at exactly this projection; the
    * plumbing — chunk identity, embedding column shape, scoring — is the
    * real contract). Integer-valued doubles make the cosine floor-exact
    * cross-engine (the e1 discipline).
    *
    * Scale shape: chunk + embed are map-only projections riding the
    * scan; the exact top-k scan here is the contract the e2/e3/e12
    * bucketed paths serve at 100 TB (index the chunk embeddings with the
    * same IVF store the s16 maintenance path feeds). */
  def ragIndexTopK(docs: DataFrame, window: Int = 16, stride: Int = 8,
                   dim: Int = 8, k: Int = 10): DataFrame =
    ragTopKFrom(
      chunkEmbed(docs, window, stride, dim).localCheckpoint(true), k)

  /** The chunk→embedding half of [[ragIndexTopK]] — a STATELESS map-only
    * projection, which is what makes it the s19 streaming-ingest body:
    * each micro-batch chunks and embeds independently, so a streamed
    * chunk store equals the batch build. */
  def chunkEmbed(docs: DataFrame, window: Int = 16, stride: Int = 8,
                 dim: Int = 8): DataFrame = {
    val embCols = (0 until dim).map { j =>
      expr(s"CAST(CAST(conv(substring(md5(concat('x8|', chunk_fp, '|$j')), 1, 15), 16, 10) AS BIGINT) % 2001 - 1000 AS DOUBLE)")
    }
    chunkDocs(docs, window, stride)
      .select(col("doc_id"), col("chunk_idx"), array(embCols: _*).as("v"))
  }

  /** The retrieval half of [[ragIndexTopK]] over any (doc_id, chunk_idx,
    * v) chunk-embedding frame — batch-built (x8) or streamed (s19). */
  def ragTopKFrom(emb: DataFrame, k: Int = 10): DataFrame = {
    val q = emb.orderBy("doc_id", "chunk_idx").limit(1)
      .select(col("doc_id").as("qd"), col("chunk_idx").as("qc"),
        col("v").as("qv"))
    emb.crossJoin(broadcast(q))
      .filter(!(col("doc_id") === col("qd") && col("chunk_idx") === col("qc")))
      .select(col("doc_id"), col("chunk_idx"),
        floor(Similarity.cosine(col("v"), col("qv")) * 1000000L)
          .cast("long").as("cos_scaled"))
      .orderBy(col("cos_scaled").desc, col("doc_id"), col("chunk_idx"))
      .limit(k)
  }

  /** T24: k-anonymity audit — the governance gate a training-data release
    * runs over quasi-identifiers (Sweeney '02): group the corpus by the
    * quasi-id tuple (lang, source, token-length bucket) and flag every
    * equivalence class smaller than `k` — rows whose combination is rare
    * enough to re-identify. Output per class: size and the pass flag; a
    * release pipeline suppresses or generalizes the failing classes.
    *
    * Scale shape: ONE partial-combining keyed aggregation over the
    * quasi-id tuple — d1's shape; the class count is bounded by the
    * quasi-id domain, not the corpus. */
  def kAnonymity(docs: DataFrame, k: Long = 5L): DataFrame =
    docs.select(col("lang"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tok"))
      .select(col("lang"), col("source"),
        expr("n_tok div 32").as("len_bucket"))
      .groupBy("lang", "source", "len_bucket")
      .agg(count(lit(1)).as("n"))
      .withColumn("is_anon", (col("n") >= k).cast("long"))

  def rarityScore(docs: DataFrame, maxFreq: Long = 2L): DataFrame = {
    val tokd = docs.select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .localCheckpoint(true) // feeds BOTH the frequency table and the re-join
    val freq = tokd.groupBy("t").agg(count(lit(1)).as("c"))
    tokd.join(freq, "t")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("c") <= maxFreq, 1L).otherwise(0L)).as("n_rare"))
      .withColumn("rare_pct", expr("(100 * n_rare) div n_tokens"))
  }

  /** T10: Gopher-style repetition filters (Rae et al. '21 §A1.1): per
    * document, the "top n-gram character fraction" (share of characters
    * covered by the most frequent word bigram) and the "duplicate n-gram
    * fraction" (share of word 5-gram occurrences that are repeats of an
    * earlier 5-gram in the same document) — the two signals that catch
    * looping boilerplate and template spam. Both as exact ppm integers;
    * `is_repetitive` applies Gopher's published 0.20 / 0.15 thresholds.
    *
    * Scale shape: ONE narrow projection per row — the bigram mode is the
    * codegen [[graft.functions.TopBigramRun]] (a groupBy-per-gram +
    * window would shuffle every bigram of the corpus twice), and the
    * 5-gram dup share is `size − size(array_distinct)` over the already
    * verified [[Dedup.ngramHashes]] array. No shuffle, no explode — the
    * d4 SimHash / t7 winnow story. */
  def repetitionScore(docs: DataFrame): DataFrame = {
    val toked = docs.select(col("doc_id"),
      length(col("text")).as("len"), tokens(col("text")).as("ts"))
    toked.select(col("doc_id"),
        col("len"), size(col("ts")).as("n_tokens"),
        graft.functions.TopBigramRun.of(docs.sparkSession, col("ts")).as("tb"),
        Dedup.ngramHashes(col("ts"), 5).as("g5"))
      .select(col("doc_id"), col("n_tokens"),
        col("tb.cnt").as("top_bigram_n"),
        col("tb.gram").as("top_bigram"),
        expr("(tb.cnt * length(tb.gram) * 1000000) div greatest(len, 1)")
          .as("top_bigram_char_ppm"),
        expr("((size(g5) - size(array_distinct(g5))) * 1000000L) div greatest(size(g5), 1)")
          .as("dup_5gram_ppm"))
      .withColumn("is_repetitive",
        (col("top_bigram_char_ppm") > 200000 || col("dup_5gram_ppm") > 150000).cast("int"))
  }

  def trainingDataPrep(docs: DataFrame): DataFrame = {
    val ts = tokens(col("text"))
    val scored = docs.select(
        col("doc_id"), col("lang"), col("text"),
        size(ts).as("n_tokens"),
        expr("regexp_count(text, '[.,!?;:]')").as("n_punct"),
        stopScore(ts, Stopwords.head._2).as("n_stop"))
      .filter(qualityCond(col("n_tokens"), col("n_punct"), col("n_stop")))
    val keepers = scored
      .groupBy(md5(trim(regexp_replace(lower(col("text")), WsRun, " "))).as("fp"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    scored.join(keepers, Seq("doc_id"), "left_semi")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").cast("long").as("total_tokens"),
        sum("doc_id").cast("long").as("id_sum"))
  }

  // --------------------------------------------------------------------
  // T11: PII detection + redaction (the scrubbing pass every released
  // training corpus runs before anything else). Patterns use ONLY the
  // Java-regex ∩ RE2 common subset — explicit [0-9]/[a-zA-Z] classes,
  // no \d/\w/\b — so Spark and the DuckDB oracle match identical spans.
  // --------------------------------------------------------------------

  /** Email address (conservative: ASCII local part @ dotted domain). */
  val EmailPat: String = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  /** Dotted-quad IPv4 (syntactic — no octet range check, like most
    * corpus scrubbers; redaction cares about recall, not validity). */
  val Ipv4Pat: String = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  /** NANP-style phone number NNN-NNN-NNNN. */
  val PhonePat: String = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Deterministic PII fixture augmentation: the synthetic `documents`
    * text contains no PII, so the entry would otherwise verify only the
    * zero case. Both engines append the SAME doc_id-derived email, IP and
    * phone, giving every row at least one true positive of each class. */
  private[graft] def piiAugment(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), concat(
      col("text"), lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail"), (col("doc_id") % 10).cast("string"), lit(".org ip 10."),
      (col("doc_id") % 256).cast("string"), lit(".0."),
      (col("doc_id") % 100).cast("string"), lit(" tel 415-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("aug"))

  /** The redaction chain itself, exposed for composition and spec
    * pinning: fixed order email → IPv4 → phone (placeholders contain no
    * digits or '@', so later patterns cannot match inside earlier
    * replacements). */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, lit(EmailPat), lit("<EMAIL>")),
        lit(Ipv4Pat), lit("<IP>")),
      lit(PhonePat), lit("<PHONE>"))

  /** T11: count each PII class, then redact. Counts are taken BEFORE
    * redaction. One narrow projection per row — no shuffle, no row
    * amplification; at 100 TB this is a map-only pass. */
  def piiRedact(docs: DataFrame): DataFrame = {
    val a = piiAugment(docs)
    val red = redactPii(col("aug"))
    a.select(col("doc_id"),
      regexp_count(col("aug"), lit(EmailPat)).as("n_email"),
      regexp_count(col("aug"), lit(Ipv4Pat)).as("n_ip"),
      regexp_count(col("aug"), lit(PhonePat)).as("n_phone"),
      length(red).as("red_len"),
      md5(red).as("red_fp"))
  }

  // --------------------------------------------------------------------
  // T12: DSIR-style importance weighting (Xie et al. 2023, "Data
  // Selection for Language Models via Importance Resampling"): score each
  // document by how much its n-gram distribution looks like a TARGET
  // (high-quality) subset vs the raw corpus. The published method uses
  // log-probability ratios of hashed n-grams; floats are accumulation-
  // order-dependent, so this keeps the same signal as exact integers: a
  // bigram occurrence is "target-like" iff its relative frequency in the
  // target subset exceeds its relative frequency overall, tested by
  // cross-multiplication  tc·Na > ac·Nt  (no division, no float).
  // --------------------------------------------------------------------

  /** T12: per-document target-like bigram share. Target = the t3 quality
    * rule (one shared predicate, [[qualityCond]]). Plan: one explode of
    * bigram occurrences, ONE shuffle on the gram key to build the
    * frequency table (partial-aggregated; corpus-wide totals ride the
    * same pass and broadcast back), then a gram-keyed join and a doc-
    * keyed partial agg — linear in corpus size, no quadratic stage. */
  def dsirWeighting(docs: DataFrame): DataFrame = {
    val ts = tokens(col("text"))
    val flagged = docs.select(
      col("doc_id"), ts.as("ts"),
      qualityCond(size(ts),
        expr("regexp_count(text, '[.,!?;:]')"),
        stopScore(ts, Stopwords.head._2)).cast("long").as("is_t"))
    // docs with <2 tokens have no bigrams: the size guard (not a
    // when/otherwise) keeps sequence() ascending-only — Spark's
    // sequence(1, 0) would generate a DESCENDING ramp, not an empty array
    val gramd = flagged.filter(size(col("ts")) >= 2)
      .select(col("doc_id"), col("is_t"),
        explode(expr("transform(sequence(1, size(ts) - 1), i -> concat(ts[i-1], ' ', ts[i]))")).as("g"))
      .localCheckpoint(true) // shared by the freq build and the join back
    val freq = gramd.groupBy("g")
      .agg(count(lit(1)).as("ac"), sum("is_t").as("tc"))
    val totals = broadcast(
      gramd.agg(count(lit(1)).as("na"), sum("is_t").as("nt")))
    gramd.join(freq, "g").crossJoin(totals)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum((col("tc") * col("na") > col("ac") * col("nt")).cast("long"))
          .as("n_target_like"))
      .withColumn("dsir_pct", expr("(100 * n_target_like) div greatest(n_grams, 1)"))
  }

  /** T14: unigram-LM negative-log-likelihood scoring — the CCNet-style
    * perplexity quality filter (Wenzek et al. '19 filter CommonCrawl by LM
    * perplexity; here the LM is the corpus's own unigram model, so the
    * score is self-contained): P(tok) = cnt(tok)/N over the whole corpus,
    * score = per-doc mean of −ln P(tok) in floor-scaled milli-nats
    * (integer columns only, so the cross-engine hash is exact; ln is
    * evaluated on identical doubles in both engines). An exact landing of
    * ln(N/cnt)·1000 on an integer boundary is impossible for N≠cnt
    * (e^(k/1000) is transcendental, Lindemann–Weierstrass), so the only
    * cross-engine risk is the true value falling within ~1 ulp of a
    * boundary where Math.log and libm log may round differently —
    * probability ~1e-9 per distinct (cnt, N) pair; tools/check.py's
    * perplexity_boundary_guard flags any corpus where a pair comes that
    * close, so a risky fixture fails loudly in the local check (ADVICE
    * r6) rather than flaking in the driver's hash compare.
    *
    * Scale shape: one token-count shuffle builds the vocab (vocabulary
    * sized, partial-combining), the vocab broadcasts back onto the token
    * stream (no second corpus shuffle), and the per-doc aggregation
    * partial-combines — the same gram-shuffle + broadcast-totals shape as
    * [[dsirWeighting]]. */
  def perplexityScore(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .localCheckpoint(true) // shared by the vocab build and the join back
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = broadcast(toks.agg(count(lit(1)).as("n")))
    toks.join(broadcast(vocab), "tok").crossJoin(total)
      .select(col("doc_id"),
        floor(log(col("n").cast("double") / col("cnt").cast("double")) * lit(1000))
          .cast("long").as("nll"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("nll").as("sum_nll_milli"))
      .withColumn("avg_nll_milli", expr("sum_nll_milli div n_tokens"))
  }

  /** T18: the BPE merge-step statistic (Sennrich et al. '16) — the
    * frequency table a byte-pair-encoding trainer consults each round:
    * count every adjacent character pair inside every corpus token
    * instance and return the top-`k` merge candidates by (count desc,
    * pair asc). One training round merges the argmax; this operator is
    * that round's corpus-wide scan, the distributed step a tokenizer
    * build repeats ~50k times (with merged symbols fed back in).
    *
    * Scale shape: pair extraction is a projection (substring windows, no
    * join); the count shuffles a key space bounded by the symbol-pair
    * alphabet (≤1296 for [a-z0-9]²), so map-side combine collapses the
    * corpus to one tiny row set per partition. */
  def bpeMergePairs(docs: DataFrame, k: Int = 20): DataFrame =
    docs.select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(
        expr("transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))")).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair")).limit(k)

  /** T16: TF-IDF top-`k` terms per document — the classic keyword /
    * salient-term extractor (Salton & Buckley '88), the projection step
    * behind sparse retrieval indexes and topic labeling in a corpus
    * pipeline. idf is corpus-level: idf_milli = floor(ln(N_docs / df)·1000)
    * in the same milli-nat integer discipline as [[perplexityScore]]
    * (exact boundary landing impossible for df≠N, Lindemann–Weierstrass);
    * score = tf · idf_milli, pure integer. Ties break on token asc, so
    * the top-k is total-order deterministic.
    *
    * Scale shape: one (doc, tok) count shuffle (partial-combining), the
    * vocabulary-sized df table broadcasts back onto it (no second corpus
    * shuffle), and the per-doc top-k is a window over rows already
    * grouped by doc_id — at 100 TB the only corpus-sized exchange is the
    * first tf aggregation. */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true) // shared by the df build and the score join
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("dfreq"))
    val nDocs = broadcast(docs.agg(count(lit(1)).as("nd")))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf_milli").desc, col("tok"))
    tf.join(broadcast(dfreq), "tok").crossJoin(nDocs)
      .withColumn("idf_milli",
        floor(log(col("nd").cast("double") / col("dfreq").cast("double")) * lit(1000))
          .cast("long"))
      .withColumn("tfidf_milli", col("tf") * col("idf_milli"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("doc_id", "tok", "tf", "dfreq", "tfidf_milli", "rnk")
  }

  /** T17: bigram-LM negative-log-likelihood score with add-one smoothing —
    * the KenLM-shaped step up from [[perplexityScore]]'s unigram model:
    * P(w | h) = (c(h,w) + 1) / (c(h) + V) over the whole corpus, score =
    * per-doc mean of −ln P in floor-scaled milli-nats (integer columns
    * only; same transcendence argument as t14 — the ratio is rational, so
    * a boundary landing is impossible).
    *
    * Scale shape: bigram extraction is a PROJECTION (array zip on the
    * already-tokenized row — no self-join, no positional shuffle); the
    * corpus then pays one bigram-count shuffle and one history-count
    * shuffle (both partial-combining, both vocabulary-sized outputs), and
    * the scoring join is keyed on (h, w) — the standard distributed
    * n-gram-LM build shape. Docs with <2 tokens score no bigrams and are
    * absent, mirroring the oracle. */
  def bigramLmScore(docs: DataFrame): DataFrame = {
    val toked = docs
      .select(col("doc_id"), tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= 2)
    val bigrams = toked
      .select(col("doc_id"), explode(
        expr("transform(sequence(2, size(ts)), i -> struct(ts[i-2] as h, ts[i-1] as w))"))
        .as("bg"))
      .select(col("doc_id"), col("bg.h").as("h"), col("bg.w").as("w"))
      .localCheckpoint(true) // shared by both count builds and the score join
    val bigCnt = bigrams.groupBy("h", "w").agg(count(lit(1)).as("chw"))
    val histCnt = bigrams.groupBy("h").agg(count(lit(1)).as("ch"))
    val vocab = broadcast(
      docs.select(explode(tokens(col("text"))).as("t"))
        .agg(countDistinct("t").as("v")))
    bigrams
      .join(bigCnt, Seq("h", "w")).join(histCnt, Seq("h")).crossJoin(vocab)
      .select(col("doc_id"),
        floor(log((col("ch") + col("v")).cast("double") /
          (col("chw") + lit(1)).cast("double")) * lit(1000))
          .cast("long").as("nll"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("nll").as("sum_nll_milli"))
      .withColumn("avg_nll_milli", expr("sum_nll_milli div n_bigrams"))
  }

  /** T19: count-min sketch token frequencies (Cormode & Muthukrishnan '05)
    * — the heavy-hitter counting primitive that pairs with the repo's HLL
    * cardinality sketches (r9, g18b). The sketch is a d×w counter grid;
    * every token instance increments one bucket per hash row, and a
    * token's estimate is the MIN over its d buckets — always ≥ the true
    * count, within εN with high probability.
    *
    * Scale shape — the reason a 100 TB corpus sketches instead of
    * counting: the aggregation key space is d·w (4×256 here) REGARDLESS
    * of vocabulary size, so map-side partial combine keeps every shuffle
    * constant- or vocab-width. The corpus is touched exactly ONCE — a
    * partial-combining `groupBy(token).count()` whose output is
    * vocab-sized — and that tiny table (checkpointed) feeds all three
    * consumers: the grid (cell (r,b) = Σc over tokens hashing there ≡
    * the per-instance increment count, bit-identical), the md5-chosen
    * probe set, and the probes' exact counts (a row lookup, not a
    * corpus shuffle). Nothing corpus-sized is ever materialized.
    * Hashing is the repo's md5 integer discipline, replicated verbatim
    * in the oracle, so (t, exact_n, cms_est) is engine-exact. */
  def countMinHeavyHitters(docs: DataFrame, d: Int = 4, w: Int = 256,
                           k: Int = 20, salt: String = "cms"): DataFrame = {
    val vocab = docs.select(explode(tokens(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // vocab-sized; feeds grid, probes and exact counts
    def bucket(t: Column, r: Column): Column =
      conv(substring(md5(concat(lit(salt), r.cast("string"), lit("|"), t)), 1, 15),
        16, 10).cast("long") % w
    val rows = explode(sequence(lit(0), lit(d - 1)))
    val cms = vocab.select(col("t"), col("c"), rows.as("r"))
      .select(col("r"), bucket(col("t"), col("r")).as("b"), col("c"))
      .groupBy("r", "b").agg(sum("c").as("c"))
    val probes = vocab.select("t")
      .orderBy(md5(concat(lit(salt + "q|"), col("t"))), col("t")).limit(k)
    val exact = vocab.join(broadcast(probes), "t")
      .select(col("t"), col("c").as("exact_n"))
    val est = probes.select(col("t"), rows.as("r"))
      .select(col("t"), col("r"), bucket(col("t"), col("r")).as("b"))
      .join(cms, Seq("r", "b"))
      .groupBy("t").agg(min("c").as("cms_est"))
    exact.join(est, "t")
  }
}
