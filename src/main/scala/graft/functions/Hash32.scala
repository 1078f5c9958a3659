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
  /** Adds `h32` (the hex prefix parsed to bigint) — the ONE reserved
    * column name: a pre-existing `h32` on the caller's frame is
    * replaced. r15: the 8-nibble fold moved from an interpreted
    * `aggregate` HOF (HOFs never enter codegen — 8 substring/instr
    * evaluations PER ROW, the dominant cost of every sketch operator
    * once the bench timed real plans) to the codegen'd `conv(hex, 16,
    * 10)` — bit-identical values (both parse the same lowercase md5
    * prefix), measured 5.5 s → sub-second on q18's sf0.1 scan. The
    * DuckDB twin keeps its list_reduce fold: the CONTRACT is the
    * value, and the oracle side is not the hot path.
    */
  def withH32(df: DataFrame, salt: String, key: Column): DataFrame =
    df.withColumn("h32",
      conv(substring(md5(concat(lit(salt), key).cast("binary")), 1, 8),
        16, 10).cast("bigint"))

  /** DuckDB twin of [[withH32]]'s `h32`. */
  def h32Duck(saltedKeySql: String): String = s"""
    list_reduce([CAST(0 AS BIGINT)] || list_transform(range(1, 9),
        i -> CAST(strpos('0123456789abcdef', substr(md5($saltedKeySql), i, 1)) - 1 AS BIGINT)),
      (acc, c) -> acc * 16 + c)"""
}
