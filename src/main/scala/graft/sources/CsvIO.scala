package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, regexp_replace}
import org.apache.spark.sql.types.{StringType, StructType}

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
    *
    * Sentinel collision: a field whose literal string CONTENT is `\N`
    * would otherwise be written unquoted and read back as SQL NULL
    * (quoting does not help — Spark's reader compares `nullValue`
    * AFTER unquoting). The writer therefore escapes the whole `\+N`
    * family by one extra backslash (`\N` → `\\N`, `\\N` → `\\\N`, …)
    * and the reader strips one back — a total bijection, so null and
    * every literal backslash-run-then-N string roundtrip exactly.
    * Applied only to exact `\+N` matches; all other content unchanged.
    */
  private val NullToken = "\\N"

  // matches a string that is entirely backslashes followed by N
  private val SentinelFamily = "^(\\\\+N)$"

  private def escapeSentinel(c: Column): Column =
    regexp_replace(c, SentinelFamily, "\\\\$1")

  // strips one backslash from a two-or-more-backslash `\\+N` value;
  // plain `\N` never reaches the reader as content (nullValue eats it
  // first, and the writer never emits it for non-null content)
  private def unescapeSentinel(c: Column): Column =
    regexp_replace(c, "^\\\\(\\\\+N)$", "$1")

  /** Write a DataFrame as headered CSV. The default writer quotes
    * fields containing separators, quotes, or newlines (RFC 4180), so
    * arbitrary text survives — provided the reader is multiLine-aware
    * (see [[read]]).
    */
  def write(df: DataFrame, path: String): Unit = {
    val escaped = df.select(df.schema.fields.map { f =>
      if (f.dataType == StringType) escapeSentinel(col(f.name)).as(f.name)
      else col(f.name)
    }.toSeq: _*)
    escaped.write.mode("overwrite")
      .option("header", "true")
      .option("nullValue", NullToken)
      // the CSV WRITER defaults these to true (the reader to false) and
      // silently trims field edges — "text ends in \n" must survive
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)
  }

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
    *
    * `decodeSentinel` pairs the reader with [[write]]'s sentinel-family
    * escape. A CSV produced by any OTHER tool never had that escape
    * applied, so a field legitimately containing `\\N` would be
    * silently mutated to `\N` on ingest — pass `decodeSentinel = false`
    * for foreign files to take their bytes literally (nullValue still
    * maps an unquoted `\N` field to SQL NULL, the shared convention).
    */
  def read(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, multiLine: Boolean = true,
      decodeSentinel: Boolean = true): DataFrame = {
    val raw = spark.read
      .schema(schema.add("_corrupt", "string"))
      .option("header", header.toString)
      .option("multiLine", multiLine.toString)
      .option("nullValue", NullToken)
      .option("emptyValue", "")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)
    // invert the writer's sentinel-family escape; `_corrupt` carries
    // the raw line and stays untouched
    if (!decodeSentinel) raw
    else raw.select(raw.schema.fields.map { f =>
      if (f.dataType == StringType && f.name != "_corrupt")
        unescapeSentinel(col(f.name)).as(f.name)
      else col(f.name)
    }.toSeq: _*)
  }
}
