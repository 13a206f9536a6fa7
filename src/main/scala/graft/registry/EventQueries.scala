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

    // ---- S2b: the reference's real parser shape (WikipediaParsers.scala:
    //      40-140): multi-field SQL-dump tuples `(id,uid,'type')` parsed
    //      with a multi-group regex, MALFORMED LINES TOLERATED (skipped
    //      and counted, not fatal — the reference's chunk parser bails to
    //      the next '(' the same way). The dump lines are synthesized
    //      deterministically from event columns (a corrupt line every
    //      event_id % 17), so both engines parse the identical corpus. ----
    ("s2b_parse_tuples",
      (s: SparkSession, d: String) => {
        val P = "^\\(([0-9]+),([0-9]+),'([a-z_]+)'\\)$"
        val lines = Tables.events(s, d)
          .select(col("event_id"),
            concat(lit("("), col("event_id"), lit(","), col("user_id"),
              lit(",'"), col("event_type"), lit("')")).as("line0"))
          .select(when(col("event_id") % 17 === 0,
              expr("substring(line0, 1, length(line0)-2)"))
            .otherwise(col("line0")).as("line"))
        val ex = lines.select(
          regexp_extract(col("line"), P, 2).as("uid_s"),
          regexp_extract(col("line"), P, 3).as("et"))
        val good = ex.filter(col("et") =!= "").groupBy("et")
          .agg(count(lit(1)).as("n"), sum(col("uid_s").cast("long")).as("uid_sum"))
        val bad = ex.filter(col("et") === "").agg(count(lit(1)).as("n"))
          .select(lit("__rejected").as("et"), col("n"), lit(0L).as("uid_sum"))
        good.unionByName(bad)
      },
      Some(
        """WITH lines AS (
          |  SELECT event_id,
          |    '(' || event_id || ',' || user_id || ',''' || event_type || ''')' AS line0
          |  FROM events),
          |corrupted AS (
          |  SELECT CASE WHEN event_id % 17 = 0
          |         THEN substring(line0, 1, length(line0)-2) ELSE line0 END AS line
          |  FROM lines),
          |ex AS (
          |  SELECT regexp_extract(line, '^\(([0-9]+),([0-9]+),''([a-z_]+)''\)$', 2) AS uid_s,
          |         regexp_extract(line, '^\(([0-9]+),([0-9]+),''([a-z_]+)''\)$', 3) AS et
          |  FROM corrupted)
          |SELECT et, count(*) AS n, CAST(sum(CAST(uid_s AS BIGINT)) AS BIGINT) AS uid_sum
          |FROM ex WHERE et <> '' GROUP BY et
          |UNION ALL
          |SELECT '__rejected' AS et, count(*) AS n, 0 AS uid_sum
          |FROM ex WHERE et = ''""".stripMargin)),
  )
}
