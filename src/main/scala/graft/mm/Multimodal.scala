package graft.mm

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata extracted from an opaque media payload. */
final case class MediaMeta(width: Int, height: Int, format: String)

/** A media row: opaque binary payload + typed metadata. */
final case class MediaRow(id: Long, media: Array[Byte], meta: MediaMeta)

/** A sampled frame: per-media frame index + fingerprint. */
final case class Frame(id: Long, frame_idx: Int, frame_md5: String)

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The decode step is STUBBED (this container has no image/audio
  * codecs): [[StubCodec]] derives deterministic metadata from the
  * bytes. The Spark-side plumbing — binary columns, case-class
  * Encoders, `mapPartitions` batch shape, partition-local batching —
  * is real and is what matters at 100 TB: payloads never pass through
  * the driver, decode parallelism = partition count, and the iterator
  * contract keeps memory at one batch per task.
  */
object Multimodal {

  /** Deterministic stand-in for a real media codec. */
  object StubCodec {
    /** "Decode" a payload: metadata derived from size + first bytes. */
    def decode(payload: Array[Byte]): MediaMeta = {
      val n = payload.length
      val first = if (n > 0) payload(0) & 0xff else 0
      MediaMeta(64 + n % 577, 64 + (n * 31) % 417, if (first % 2 == 0) "img" else "vid")
    }

    /** "Resize": new metadata, payload untouched (stub). */
    def resize(meta: MediaMeta, maxDim: Int): MediaMeta = {
      val scale = math.max(meta.width, meta.height).toDouble / maxDim
      if (scale <= 1.0) meta
      else MediaMeta((meta.width / scale).toInt, (meta.height / scale).toInt, meta.format)
    }

    /** "Frame-sample": k deterministic fingerprints from the payload. */
    def frames(id: Long, payload: Array[Byte], k: Int): Seq[Frame] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until k).map { i =>
        md.reset()
        md.update(payload)
        md.update(i.toByte)
        val hex = md.digest().map("%02x".format(_)).mkString
        Frame(id, i, hex)
      }
    }
  }

  /** documents.text reinterpreted as an opaque media payload — the
    * plumbing contract is identical for real image bytes.
    */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select(col("doc_id").as("id"), col("text").cast("binary").as("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        MediaRow(id, payload, StubCodec.decode(payload))
      })
  }

  /** Batch decode+resize over partitions: the iterator-in/iterator-out
    * shape a Pandas-UDF / mapInPandas pipeline would use, here with
    * typed Encoders.
    */
  def decodeAndResize(media: Dataset[MediaRow], maxDim: Int): Dataset[MediaRow] =
    media.mapPartitions(_.map(r => r.copy(meta = StubCodec.resize(r.meta, maxDim))))(media.encoder)

  /** Frame sampling: one media row fans out to k frame rows. */
  def sampleFrames(media: Dataset[MediaRow], k: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(r => StubCodec.frames(r.id, r.media, k)))
  }

  /** m01: binary payload + typed metadata projection (SQL-oracled on
    * the size/hash part; stub width/height mirrored as integer math).
    */
  private def m01(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .withColumn("media", col("text").cast("binary"))
      .select(col("doc_id"),
        length(col("media")).cast("long").as("n_bytes"),
        md5(col("media")).as("content_md5"),
        (lit(64) + length(col("media")) % 577).as("stub_width"),
        (lit(64) + (length(col("media")) * 31) % 417).as("stub_height"))
      .orderBy(col("doc_id"))

  private val m01Sql = """
    SELECT doc_id,
      CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      md5(text) AS content_md5,
      CAST(64 + octet_length(encode(text)) % 577 AS INTEGER) AS stub_width,
      CAST(64 + (octet_length(encode(text)) * 31) % 417 AS INTEGER) AS stub_height
    FROM documents ORDER BY doc_id"""

  /** m02: corpus-level media statistics by (stub) format — the
    * metadata rollup a multimodal ingest pipeline runs before deciding
    * decode budgets. All integer math, mirrored in the oracle.
    */
  private def m02(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        when(ascii(substring(col("text"), 1, 1)) % 2 === 0, "img")
          .otherwise("vid").as("format"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"))
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("n_bytes")).as("min_bytes"),
        max(col("n_bytes")).as("max_bytes"))
      .orderBy(col("format"))

  private val m02Sql = """
    WITH m AS (
      SELECT doc_id,
        CASE WHEN ascii(substr(text, 1, 1)) % 2 = 0 THEN 'img' ELSE 'vid' END AS format,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents)
    SELECT format, count(*) AS n_media,
      CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
      MIN(n_bytes) AS min_bytes, MAX(n_bytes) AS max_bytes
    FROM m GROUP BY format ORDER BY format"""

  /** m03: frame sampling as a relational query — each payload fans out
    * to k fingerprinted frame rows. The SQL-expressible analog of
    * [[sampleFrames]] (which keys frames off raw payload bytes and is
    * spec-tested); here the fingerprint derives from payload ||
    * frame-index text so DuckDB can mirror it exactly.
    */
  private def m03(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(array((0 until 3).map(i =>
          md5(concat(col("text"), lit(i.toString)).cast("binary"))): _*))
          .as(Seq("frame_idx", "frame_md5")))
      .orderBy(col("doc_id"), col("frame_idx"))

  private val m03Sql = """
    SELECT doc_id, i AS frame_idx, md5(text || CAST(i AS VARCHAR)) AS frame_md5
    FROM documents, UNNEST([0, 1, 2]) AS t(i)
    ORDER BY doc_id, frame_idx"""

  val ops: Seq[Op] = Seq(
    Op("m01_binary_meta", m01, Some(m01Sql)),
    Op("m02_media_stats", m02, Some(m02Sql)),
    Op("m03_frame_sample", m03, Some(m03Sql)))
}
