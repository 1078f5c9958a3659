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

  /** [[dsum]] quantized to multiples of 1/64 BEFORE the double cast
    * (non-negative sums).
    *
    * Needed when the sum's magnitude at `scale` decimals can cross
    * 2^53 scaled units: the decimal total is still exact, but a
    * >53-bit integer no longer converts to double identically in
    * every engine's conversion pipeline (measured at sf1: q01's
    * sum_charge, 2.0e10 at 6 decimals = 2.0e16 micro-units, came back
    * one ulp apart from DuckDB). A DECIMAL quantum (cents) does not
    * help — the engines' decimal-rescale tie conventions differ
    * (Spark half-up vs DuckDB, observed on an exact x.xx5000 sum).
    * A POWER-OF-TWO quantum sidesteps both problems at once:
    *  - floor(T·64) needs no tie convention at all (and ties cannot
    *    even occur: 64·m ≡ 5·10^5 (mod 10^6) has no integer
    *    solution for 6-decimal inputs);
    *  - every multiple of 1/64 below 2^47 IS a double, so the final
    *    cast is exact in any engine.
    * Both sides compute floor(T·64) with exact integer arithmetic
    * (Spark: decimal floor; DuckDB: HUGEINT floor-division) and
    * divide by 64.0 — an exact binary operation. The delivered
    * contract: totals exact to 1/64 ≈ 0.016 currency units,
    * engine-portable at any magnitude up to 2^47 ≈ 1.4e14.
    */
  def dsumq(c: Column, scale: Int): Column =
    (floor(sum(c.cast(DecimalType(18, scale))) * lit(64)).cast("double") / lit(64.0))

  /** SQL mirror of [[dsumq]] for the DuckDB oracle. */
  def dsumqSql(e: String, scale: Int): String = {
    val unit = "1" + "0" * scale
    s"(CAST(CAST(SUM(CAST(($e) AS DECIMAL(18,$scale))) * $unit AS HUGEINT) * 64 // $unit AS DOUBLE) / 64.0)"
  }
}
