import org.apache.spark.sql.{DataFrame, SparkSession}

package object graft {
  /** A driver-contract query: (session, sfDir) → result. */
  type QueryFn = (SparkSession, String) => DataFrame
  /** Registry row: (name, spark query, optional DuckDB oracle SQL). */
  type QueryEntry = (String, QueryFn, Option[String])
}
