package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL corpus source/sink — the interchange format training corpora
  * actually arrive in (one JSON document per line, splittable, append-
  * friendly).
  *
  * Reads are SCHEMA-PINNED: at 100 TB an inferred read costs a full
  * extra pass over the data just to guess types, and a malformed
  * stray line can silently widen a column to string. Callers pass the
  * expected schema; `columnNameOfCorruptRecord` + PERMISSIVE mode park
  * malformed lines in `_corrupt` instead of failing the job, so a
  * dirty crawl shard degrades to a filterable column, not a retry
  * storm.
  */
object JsonlIO {

  /** Write a DataFrame as JSONL (one object per line, gzip-friendly). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read JSONL with a pinned schema; malformed lines land in
    * `_corrupt` (null elsewhere) rather than failing the read.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
}
