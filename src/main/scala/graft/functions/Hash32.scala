package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared 32-bit uniform key hash both engines compute identically:
  * the first 8 hex chars of md5(salt ‖ key), folded to a bigint in
  * [0, 2³²) — the cross-engine primitive under the sketch family
  * (q18 KMV distinct, q19 bottom-k sample, e11/e12 rolling distinct).
  * xxhash64 would be cheaper per row but has no DuckDB twin; md5 is
  * the determinism anchor, the same trade d01/t04 already make. The
  * fold is a codegen'd higher-order function — no UDF in the path.
  */
object Hash32 {
  /** Adds `h32` (the folded bigint) — the ONE reserved column name: a
    * pre-existing `h32` on the caller's frame is replaced. The md5 hex
    * prefix the fold reads is a scratch column (reserved `__graft_`
    * prefix) dropped before returning, so nothing else leaks into the
    * caller's schema.
    */
  def withH32(df: DataFrame, salt: String, key: Column): DataFrame =
    df.withColumn("__graft_h8",
        substring(md5(concat(lit(salt), key).cast("binary")), 1, 8))
      .withColumn("h32", expr(
        """aggregate(sequence(1, 8), cast(0 as bigint),
             (acc, i) -> acc * 16 + cast(instr('0123456789abcdef', substring(__graft_h8, i, 1)) - 1 as bigint))"""))
      .drop("__graft_h8")

  /** DuckDB twin of [[withH32]]'s `h32`. */
  def h32Duck(saltedKeySql: String): String = s"""
    list_reduce([CAST(0 AS BIGINT)] || list_transform(range(1, 9),
        i -> CAST(strpos('0123456789abcdef', substr(md5($saltedKeySql), i, 1)) - 1 AS BIGINT)),
      (acc, c) -> acc * 16 + c)"""
}
