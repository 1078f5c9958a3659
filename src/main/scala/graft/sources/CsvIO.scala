package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source/sink — the other interchange format bulk data arrives
  * in. Same contract as [[JsonlIO]]:
  *
  * Reads are SCHEMA-PINNED — CSV inference costs a full extra pass at
  * 100 TB and guesses types from whatever shard it samples — and
  * malformed rows (wrong arity, unparseable numerics) are parked in
  * `_corrupt` by PERMISSIVE mode instead of failing the job, so a
  * dirty shard degrades to a filterable column.
  */
object CsvIO {

  /** Write a DataFrame as headered CSV (splittable, append-friendly). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Read CSV with a pinned schema; malformed rows land in `_corrupt`
    * (null elsewhere) rather than failing the read.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read
      .schema(schema.add("_corrupt", "string"))
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)
}
