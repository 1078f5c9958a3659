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

  /** Sentinel distinguishing SQL NULL from the empty string — CSV has
    * no native encoding for the difference (both default to an empty
    * field), so the writer emits `\N` for null (the classic
    * mysqldump/Hive convention) and the reader maps it back. Pinned on
    * BOTH sides or a roundtrip silently turns nulls into "".
    */
  private val NullToken = "\\N"

  /** Write a DataFrame as headered CSV. The default writer quotes
    * fields containing separators, quotes, or newlines (RFC 4180), so
    * arbitrary text survives — provided the reader is multiLine-aware
    * (see [[read]]).
    */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("nullValue", NullToken)
      // the CSV WRITER defaults these to true (the reader to false) and
      // silently trims field edges — "text ends in \n" must survive
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)

  /** Read CSV with a pinned schema; malformed rows land in `_corrupt`
    * (null elsewhere) rather than failing the read.
    *
    * `multiLine=true` because the writer quotes embedded newlines — a
    * line-split reader would break such records mid-field into garbage
    * + `_corrupt` rows. The cost is real and documented: multiLine CSV
    * parses each FILE as one unit (no intra-file split points exist
    * when any newline may be quoted), so parallelism comes from file
    * count — which the partitioned writer provides naturally. A corpus
    * guaranteed newline-free can pass `multiLine = false` to restore
    * intra-file splitting; 100 TB text corpora should prefer
    * [[JsonlIO]], whose escaping keeps records one-per-line and files
    * splittable unconditionally.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, multiLine: Boolean = true): DataFrame =
    spark.read
      .schema(schema.add("_corrupt", "string"))
      .option("header", header.toString)
      .option("multiLine", multiLine.toString)
      .option("nullValue", NullToken)
      .option("emptyValue", "")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)
}
