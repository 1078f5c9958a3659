package graft.sim

/** Shared cosine-similarity expression builders.
  *
  * Bit-parity contract: dot products and norms are LEFT FOLDS IN INDEX
  * ORDER with per-element double casts — Spark's `aggregate` and
  * DuckDB's `list_reduce` both fold left, so the float accumulation
  * order (the only nondeterminism in a dot product) is pinned down and
  * the two engines produce identical bits. The DuckDB fold is seeded
  * with an explicit 0.0 to match Spark's zero accumulator.
  *
  * These are codegen'd higher-order functions over the array column —
  * no UDF, no serialization boundary; at 100 TB the dot product stays
  * inside whole-stage codegen.
  */
object Cosine {
  /** Spark SQL: L2 norm of an Array[Float] column. */
  def normSpark(c: String): String =
    s"""sqrt(aggregate(sequence(1, size($c)), cast(0.0 as double),
       (acc, i) -> acc + cast(element_at($c, i) as double) * cast(element_at($c, i) as double)))"""

  /** Spark SQL: dot product of two Array[Float] columns. */
  def dotSpark(a: String, b: String): String =
    s"""aggregate(sequence(1, least(size($a), size($b))), cast(0.0 as double),
       (acc, i) -> acc + cast(element_at($a, i) as double) * cast(element_at($b, i) as double))"""

  /** DuckDB: L2 norm of a list column. */
  def normDuck(c: String): String =
    s"""sqrt(list_reduce([CAST(0 AS DOUBLE)] || list_transform(range(1, len($c) + 1),
       i -> CAST($c[i] AS DOUBLE) * CAST($c[i] AS DOUBLE)), (x, y) -> x + y))"""

  /** DuckDB: dot product of two list columns. */
  def dotDuck(a: String, b: String): String =
    s"""list_reduce([CAST(0 AS DOUBLE)] || list_transform(range(1, least(len($a), len($b)) + 1),
       i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"""
}
