package graft.registry

import graft._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Event-stream surface (SURVEY.md §2.8 streaming slice): the batch
  * equivalents of the streaming pipeline in [[graft.streaming.OnlineIngest]]
  * — tumbling-window aggregation and text-dump parsing (S2). Window starts
  * are output as epoch millis: timestamp objects canonicalize differently
  * across engines, epoch integers do not. */
object EventQueries {
  val entries: Seq[QueryEntry] = Seq(

    // ---- tumbling 1h window counts per event type (Structured Streaming's
    //      groupBy(window(...)) shape, run on the batch table) ----
    ("s1_event_window",
      (s: SparkSession, d: String) =>
        // ts is read as raw nanos (spark.sql.legacy.parquet.nanosAsLong):
        // the tumbling window is integer floor-division — engine-exact.
        Tables.events(s, d)
          .groupBy(
            expr("(ts div 3600000000000L) * 3600000L").as("hour_ms"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), min("value").as("vmin"), max("value").as("vmax")),
      Some(
        """SELECT (epoch_ns(ts) // 3600000000000) * 3600000 AS hour_ms,
          |       event_type, count(*) AS n, min(value) AS vmin, max(value) AS vmax
          |FROM events GROUP BY 1, 2""".stripMargin)),

    // ---- S2: bulk text parse ingest (reference WikipediaParsers.scala:40-140
    //      parses SQL dumps with regexes; here: the JSON-ish props column) ----
    ("s2_parse_ingest",
      (s: SparkSession, d: String) =>
        Tables.events(s, d)
          .select(regexp_extract(col("props"), "[0-9]+", 0).cast("long").as("k"))
          .groupBy("k").agg(count(lit(1)).as("n")),
      Some(
        """SELECT CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS k, count(*) AS n
          |FROM events GROUP BY 1""".stripMargin)),
  )
}
