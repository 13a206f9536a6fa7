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
        (col("n_tokens") >= 5 && col("n_tokens") <= 100000 &&
          col("stop_pct") >= 1 && col("n_punct") * 4 <= col("n_tokens")).cast("int"))
  }

  /** Document fingerprint: md5 over the whitespace-normalized lower-cased
    * text (the deterministic stand-in for a rolling hash). */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("fp"))
}
