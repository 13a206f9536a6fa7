import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType

package object graft {
  /** A driver-contract query: (session, sfDir) → result. */
  type QueryFn = (SparkSession, String) => DataFrame
  /** Registry row: (name, spark query, optional DuckDB oracle SQL). */
  type QueryEntry = (String, QueryFn, Option[String])

  /** Money as exact BIGINT cents: the repo's determinism rule for oracle
    * parity. DECIMAL(38,2) sums with trailing zeros ('458723.00') are
    * hashed differently by DuckDB-via-pandas (float '458723.0') vs Spark
    * parquet (Decimal), so every money aggregate is summed as scaled
    * integer cents instead. Per-row: exact cast to DECIMAL(18,2), scale by
    * 100 (whole-valued), truncate-cast to long — bit-identical in Spark
    * and DuckDB (`CAST(CAST(x AS DECIMAL(18,2)) * 100 AS BIGINT)`). */
  def cents(c: Column): Column =
    (c.cast(DecimalType(18, 2)) * 100).cast("long")
}
