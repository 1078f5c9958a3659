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
  * associative, so the partial-agg order stops mattering.
  * Double->decimal casts round half-away-from-zero in both engines.
  */
object par {
  /** Exact (order-independent) sum of a double column via decimal,
    * delivered as the correctly-rounded double of the exact decimal
    * total — the exact-SUM contract at the output type's precision,
    * at any magnitude.
    *
    * DECIMAL(38,·) headroom keeps the accumulation exact to ~1e31
    * at scale 6 — far past a 100 TB corpus. The delicate step is the
    * final decimal->double conversion once the total crosses 2^53
    * scaled units (sf1's q01 sum_charge already does): Spark's cast
    * is correctly rounded (JDK BigDecimal.doubleValue falls back to
    * Double.parseDouble past the fast path), but DuckDB's direct
    * decimal->double cast is NOT — measured 26% of random 14-digit
    * 6-decimal values come back 1-2 ulp off. The oracle therefore
    * round-trips the decimal total through VARCHAR: decimal->text is
    * exact and text->double (strtod) is correctly rounded, so both
    * engines deliver the identical bit pattern (0 mismatches on the
    * same 2000-value probe that showed 523 for the direct cast).
    */
  def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(38, scale))).cast("double")

  /** SQL mirror of [[dsum]] for the DuckDB oracle. */
  def dsumSql(e: String, scale: Int): String =
    s"CAST(CAST(SUM(CAST(($e) AS DECIMAL(38,$scale))) AS VARCHAR) AS DOUBLE)"
}
