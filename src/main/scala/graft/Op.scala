package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One engine operator: a Spark implementation plus (when ANSI-SQL
  * expressible) a DuckDB oracle equivalent the driver cross-checks.
  */
final case class Op(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** Oracle-parity helpers (SURVEY.md §4).
  *
  * Double sums are order-dependent, so Spark's partial aggregation and
  * DuckDB's single-threaded fold would differ in the last ulp. We cast
  * each row to a DECIMAL first: decimal addition is exact and
  * associative, so the partial-agg order stops mattering, and the final
  * decimal->double cast is correctly rounded in both engines.
  * Double->decimal casts round half-away-from-zero in both engines.
  */
object par {
  /** Exact (order-independent) sum of a double column via decimal. */
  def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** SQL mirror of [[dsum]] for the DuckDB oracle. */
  def dsumSql(e: String, scale: Int): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(18,$scale))) AS DOUBLE)"
}
