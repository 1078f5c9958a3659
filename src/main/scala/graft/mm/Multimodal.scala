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

  /** m04: perceptual near-dup detection over the binary payload — the
    * dedup operator the m-tier was missing: exact dedup (d01) catches
    * byte-identical media only, while re-encoded / resized copies need
    * a DECODED-DOMAIN fingerprint. The operator is difference-hash
    * (dHash): decode + downscale the payload to an 8×9 luminance grid,
    * set bit (i,j) iff grid(i,j) < grid(i,j+1) — a 64-bit fingerprint
    * stable under re-encoding, then find fingerprints within Hamming
    * distance ≤ 3 by pigeonhole blocking: two 64-bit codes within
    * distance 3 agree on at least one of their four 16-bit quarters
    * (4 blocks > 3 flipped bits), so the equi-join on (quarter index,
    * quarter value) finds EVERY such pair while touching only
    * same-quarter buckets — d07's nibble scheme scaled to 64 bits.
    * The n² cross join is the oracle, never the plan.
    *
    * The DECODE is the container's stub (no codecs here): the 72-cell
    * grid stands in for the resized 8×9 luminance plane. Crucially the
    * stub must preserve dHash's LOCALITY, or the operator is
    * vacuously all-zeros: cell i is the first md5 nibble of the i-th
    * of 72 equal-width payload REGIONS (width ⌈len/72⌉ — the payload
    * is stretched over the full grid exactly as a resize stretches a
    * small image), so a local edit — a suffix tag, a substituted span
    * — perturbs only the 1–2 cells whose region it touches, flipping
    * ≤3 of the 64 bits, while unrelated payloads differ in ~half.
    * (A whole-payload hash per cell would give near-dups independent
    * fingerprints; a mid-payload INSERTION shifts every later region
    * and does diverge — real dHash breaks under translation the same
    * way.) Everything is integer/hex arithmetic computable in DuckDB,
    * so fingerprint, blocking join, and Hamming verify are
    * oracle-exact end to end; swapping the stub grid for a real
    * decoder's pixels changes no Spark-side plumbing (same 72-value
    * grid contract).
    *
    * Scale shape: fingerprinting is one per-row codegen'd projection
    * (the d03 simhash family, 64 comparators instead of 16 votes);
    * the blocking join shuffles narrow (quarter, fp, id) rows on
    * md5-uniform quarter values — Σ|block|² with near-singleton
    * blocks — and only verified pairs aggregate. No driver state,
    * no quadratic stage at any corpus size.
    */
  /** The 72-cell stub grid cell expression (Spark SQL syntax): first
    * md5 nibble of payload region i, regions of width ⌈len/72⌉.
    */
  private def cellExpr(i: Int): String =
    s"(instr('0123456789abcdef', substr(md5(cast(substring(text, $i * w + 1, w) AS BINARY)), 1, 1)) - 1)"

  /** The 64 dHash comparator bits over a 72-cell `grid` column
    * (8 rows x 9 cols; bit b set iff cell (b/8, b%8) < its right
    * neighbor) — shared by the SQL-stub path and the decoder path.
    */
  private val fpBitsExpr: String = (0 until 64).map { b =>
    val (i, j) = (b / 8, b % 8)
    s"""CASE WHEN element_at(grid, ${9 * i + j + 1}) < element_at(grid, ${9 * i + j + 2})
        THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"""
  }.mkString(" + ")

  private def withFingerprint(docs: DataFrame): DataFrame =
    docs
      .withColumn("w", expr("greatest((length(text) + 71) div 72, 1)"))
      .withColumn("grid", array((0 until 72).map(i => expr(cellExpr(i))): _*))
      .withColumn("fp", expr(fpBitsExpr))
      .select(col("doc_id"), col("fp"))

  /** Decoder boundary for the dHash pipeline: one opaque payload in,
    * the 72-cell (8 rows x 9 cols, row-major) luminance grid out. The
    * fingerprint, blocking join, and census above consume only this
    * contract, so swapping the stub for a real codec is a one-object
    * change with no plumbing edits (MmDecoderSpec pins that claim:
    * [[StubGridDecoder]] through [[fingerprintWith]] is bit-equal to
    * the registered SQL-stub path, and [[PgmGridDecoder]] produces
    * true box-averaged luminance for the one raster format that needs
    * no codec libraries).
    */
  trait GridDecoder extends Serializable {
    /** 72 cells, row-major 8x9; deterministic in the payload bytes. */
    def grid(payload: Array[Byte]): Array[Int]
  }

  /** The SQL stub's exact JVM twin: cell i = first md5 nibble of the
    * i-th of 72 equal-width CHARACTER regions of the payload decoded
    * as UTF-8 (width ceil(chars/72), min 1) — mirrors [[cellExpr]]'s
    * substring/md5 semantics so the spec can pin bit-equality.
    */
  object StubGridDecoder extends GridDecoder {
    def grid(payload: Array[Byte]): Array[Int] = {
      val text = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
      val w = math.max((text.length + 71) / 72, 1)
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until 72).map { i =>
        val from = math.min(i * w, text.length)
        val until = math.min(from + w, text.length)
        md.reset()
        md.update(text.substring(from, until)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        (md.digest()(0) >> 4) & 0xf
      }.toArray
    }
  }

  /** Real decoder for binary PGM (P5) — the raster format that needs
    * no codec libraries: parse the header (magic, width, height,
    * maxval <= 255, whitespace + #-comment separators), then
    * box-average the WxH gray plane down to 8x9: cell (r,c) = floor
    * mean of pixels y in [rH/8,(r+1)H/8), x in [cW/9,(c+1)W/9) —
    * deterministic integer math, so the same image re-encoded at
    * another resolution lands on the same grid and dHash flags it as
    * a near-dup. Non-PGM payloads fall back to the stub grid (a real
    * pipeline routes by sniffed format).
    */
  object PgmGridDecoder extends GridDecoder {
    def grid(payload: Array[Byte]): Array[Int] =
      parse(payload).map { case (w, h, px) =>
        val out = new Array[Int](72)
        var r = 0
        while (r < 8) {
          var c = 0
          while (c < 9) {
            val y0 = r * h / 8; val y1 = math.min(math.max((r + 1) * h / 8, y0 + 1), h)
            val x0 = c * w / 9; val x1 = math.min(math.max((c + 1) * w / 9, x0 + 1), w)
            var sum = 0L; var n = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) { sum += px(y * w + x) & 0xff; n += 1; x += 1 }
              y += 1
            }
            out(r * 9 + c) = if (n == 0) 0 else (sum / n).toInt
            c += 1
          }
          r += 1
        }
        out
      }.getOrElse(StubGridDecoder.grid(payload))

    private[graft] def parse(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      if (payload.length < 2 || payload(0) != 'P' || payload(1) != '5') return None
      var p = 2
      def ws(): Unit = {
        var go = true
        while (go && p < payload.length) {
          val b = payload(p)
          if (b == '#') { while (p < payload.length && payload(p) != '\n') p += 1 }
          else if (b == ' ' || b == '\n' || b == '\r' || b == '\t') p += 1
          else go = false
        }
      }
      def int(): Int = {
        var v = -1
        while (p < payload.length && payload(p) >= '0' && payload(p) <= '9') {
          v = (if (v < 0) 0 else v) * 10 + (payload(p) - '0'); p += 1
        }
        v
      }
      ws(); val w = int(); ws(); val h = int(); ws(); val mx = int()
      p += 1 // exactly one whitespace byte between maxval and raster
      if (w <= 0 || h <= 0 || mx <= 0 || mx > 255 ||
          w.toLong * h > Int.MaxValue || payload.length - p < w * h) None
      else Some((w, h, java.util.Arrays.copyOfRange(payload, p, p + w * h)))
    }
  }

  /** [[withFingerprint]]'s decoder-parameterized form: identical fp
    * contract and comparators, but the grid comes from a
    * [[GridDecoder]] running partition-parallel (payloads never visit
    * the driver; decode parallelism = partition count — the
    * [[mediaTable]] batch shape).
    */
  def fingerprintWith(media: Dataset[(Long, Array[Byte])],
      dec: GridDecoder): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.mapPartitions(_.map { case (id, payload) => (id, dec.grid(payload)) })
      .toDF("doc_id", "grid")
      .withColumn("fp", expr(fpBitsExpr))
      .select(col("doc_id"), col("fp"))
  }

  /** The materialized (doc_id, fp) fingerprint table per (session,
    * corpus) — the m04 plan consumes it three times (both blocking
    * sides + the final census), and 72 md5s/row × 3 is exactly the
    * recompute d07's memoized simhash table already avoids; same
    * MatStore lifecycle.
    */
  def fingerprintTable(s: SparkSession, dir: String): DataFrame =
    graft.util.MatStore.table(s, s"dhash:$dir", "graft_dhash")(
      withFingerprint(Tables(s, dir, "documents")))

  /** dHash near-dup census over any (doc_id, fp) table — m04's
    * banding pipeline factored for reuse by m05: 16-bit quadrant
    * blocking (4 bands — a ≤3-bit hamming pair must agree exactly on
    * some band, pigeonhole), hamming ≤ 3 confirm, per-doc neighbor
    * count.
    */
  private def neardupCensus(fp: DataFrame): DataFrame = {
    val keyed = fp.select(col("doc_id"), col("fp"),
      posexplode(array((0 until 4).map(i =>
        expr(s"shiftright(fp, ${16 * i}) & 65535")): _*)).as(Seq("qidx", "qval")))
    val a = keyed.toDF("doc_a", "fpa", "qidx", "qval")
    val b = keyed.toDF("doc_b", "fpb", "qidx_b", "qval_b")
    val pairs = a.join(b, col("qidx") === col("qidx_b") && col("qval") === col("qval_b") &&
        col("doc_a") < col("doc_b"))
      .filter(expr("bit_count(fpa ^ fpb) <= 3"))
      .select(col("doc_a"), col("doc_b")).distinct()
    val sym = pairs.select(col("doc_a").as("doc_id"))
      .unionAll(pairs.select(col("doc_b").as("doc_id")))
    fp.join(sym.groupBy(col("doc_id")).agg(count(lit(1)).as("n_near")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("fp"),
        coalesce(col("n_near"), lit(0L)).as("n_near"))
      .orderBy(col("doc_id"))
  }

  private def m04(s: SparkSession, dir: String): DataFrame =
    neardupCensus(fingerprintTable(s, dir))

  private val m04Sql: String = {
    def cellDuck(i: Int): String =
      s"(instr('0123456789abcdef', substr(md5(substr(text, $i * w + 1, w)), 1, 1)) - 1)"
    val fpBits = (0 until 64).map { b =>
      val (i, j) = (b / 8, b % 8)
      s"CASE WHEN g[${9 * i + j + 1}] < g[${9 * i + j + 2}] THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    }.mkString(" + ")
    val gridList = (0 until 72).map(cellDuck).mkString(", ")
    s"""
    WITH widths AS (
      SELECT doc_id, text, greatest((len(text) + 71) // 72, 1) AS w
      FROM documents),
    grids AS (SELECT doc_id, [$gridList] AS g FROM widths),
    fps AS MATERIALIZED (
      SELECT doc_id, CAST($fpBits AS BIGINT) AS fp FROM grids),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM fps a JOIN fps b
        ON a.doc_id < b.doc_id AND bit_count(xor(a.fp, b.fp)) <= 3),
    sym AS (SELECT doc_a AS doc_id FROM pairs UNION ALL SELECT doc_b FROM pairs)
    SELECT f.doc_id, f.fp, count(s.doc_id) AS n_near
    FROM fps f LEFT JOIN sym s ON s.doc_id = f.doc_id
    GROUP BY f.doc_id, f.fp ORDER BY f.doc_id"""
  }

  // ---- m05: near-dup census over REAL PGM payloads --------------------
  /** Deterministic synthetic PGM (P5) image per document — the corpus
    * that makes [[PgmGridDecoder]] a first-class QUERY input rather
    * than spec-only plumbing. Every group of 4 doc_ids shares one
    * underlying random image (pixel (y, x) = first md5 byte of
    * "pgm:<group>:<y>:<x>"); within the group, doc k (k = id mod 4)
    * perturbs its first k row-major pixels (noise keyed by doc_id) —
    * so groups are dHash near-dup families with small, deterministic
    * fingerprint distances. EVEN ids render at the 18x16 base
    * resolution, ODD ids at 36x32 via 2x2 pixel replication — the
    * box-averaged grid is resolution-invariant by construction, so
    * the decoder's integer downscale is exercised on two genuinely
    * different byte layouts per group while the oracle recomputes ONE
    * canonical grid from the base pixel formula in SQL.
    */
  private[graft] def pgmPayload(docId: Long): Array[Byte] = {
    val scale = if (docId % 2 == 0) 1 else 2
    val (w, h) = (18 * scale, 16 * scale)
    val md = java.security.MessageDigest.getInstance("MD5")
    def px(y: Int, x: Int): Int = {
      val s = if (y * 18 + x < docId % 4) s"pgm:noise:$docId:$y:$x"
        else s"pgm:${docId / 4}:$y:$x"
      md.reset()
      md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))(0) & 0xff
    }
    val header = s"P5\n$w $h\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val raster = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster(y * w + x) = px(y / scale, x / scale).toByte
        x += 1
      }
      y += 1
    }
    header ++ raster
  }

  /** The (doc_id, fp) table of the PGM corpus, decoded by the REAL
    * [[PgmGridDecoder]] through [[fingerprintWith]] (partition-
    * parallel JVM decode — payloads never visit the driver), memoized
    * like [[fingerprintTable]] (three consumers in the m05 plan).
    */
  def pgmFingerprintTable(s: SparkSession, dir: String): DataFrame =
    graft.util.MatStore.table(s, s"pgmfp:$dir", "graft_pgmfp") {
      import s.implicits._
      fingerprintWith(
        Tables(s, dir, "documents").select(col("doc_id")).as[Long]
          .map(id => (id, pgmPayload(id))),
        PgmGridDecoder)
    }

  /** m05: m04's near-dup census with the fingerprints coming from the
    * real PGM decode path (P5 header parse + box-averaged integer
    * downscale) instead of the SQL stub — closing the loop the r14
    * GridDecoder boundary opened: the decoder output is now
    * oracle-checked per document, with the oracle recomputing the
    * 8x9 grid from the deterministic pixel formula in SQL (the fixed
    * 2x2 integer box means) and every group's two byte layouts
    * (base vs 2x-replicated raster) landing on the same grid.
    */
  private def m05(s: SparkSession, dir: String): DataFrame =
    neardupCensus(pgmFingerprintTable(s, dir))

  private val m05Sql: String = {
    def nib(h: String, i: Int): String =
      s"(instr('0123456789abcdef', substr($h, $i, 1)) - 1)"
    val fpBits = (0 until 64).map { b =>
      val (i, j) = (b / 8, b % 8)
      s"CASE WHEN g[${9 * i + j + 1}] < g[${9 * i + j + 2}] THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    }.mkString(" + ")
    s"""
    WITH pxs AS MATERIALIZED (
      SELECT d.doc_id, t.p AS p,
        CASE WHEN t.p < d.doc_id % 4
          THEN md5('pgm:noise:' || CAST(d.doc_id AS VARCHAR) || ':' ||
            CAST(t.p // 18 AS VARCHAR) || ':' || CAST(t.p % 18 AS VARCHAR))
          ELSE md5('pgm:' || CAST(d.doc_id // 4 AS VARCHAR) || ':' ||
            CAST(t.p // 18 AS VARCHAR) || ':' || CAST(t.p % 18 AS VARCHAR))
        END AS h
      FROM (SELECT doc_id FROM documents) d, UNNEST(range(0, 288)) AS t(p)),
    vals AS (
      SELECT doc_id, p, ${nib("h", 1)} * 16 + ${nib("h", 2)} AS v FROM pxs),
    cells AS (
      SELECT doc_id, ((p // 18) // 2) * 9 + ((p % 18) // 2) AS ci,
        CAST(SUM(v) // 4 AS INTEGER) AS c
      FROM vals GROUP BY 1, 2),
    grids AS (SELECT doc_id, list(c ORDER BY ci) AS g FROM cells GROUP BY doc_id),
    fps AS MATERIALIZED (
      SELECT doc_id, CAST($fpBits AS BIGINT) AS fp FROM grids),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM fps a JOIN fps b
        ON a.doc_id < b.doc_id AND bit_count(xor(a.fp, b.fp)) <= 3),
    sym AS (SELECT doc_a AS doc_id FROM pairs UNION ALL SELECT doc_b FROM pairs)
    SELECT f.doc_id, f.fp, count(s.doc_id) AS n_near
    FROM fps f LEFT JOIN sym s ON s.doc_id = f.doc_id
    GROUP BY f.doc_id, f.fp ORDER BY f.doc_id"""
  }

  // ---- m06: audio energy segmentation --------------------------------
  /** The audio-shaped member of the family: the opaque payload read as
    * 8-bit PCM samples (a WAV body's contract — here the document
    * bytes stand in, the same payload-reinterpretation m01-m05 use for
    * images), framed into fixed [[AudioStub.WIN]]-sample windows, and
    * segmented by short-time ENERGY — the voice-activity-detection
    * shape every audio curation pipeline runs before transcription
    * (silence stripping / speech-segment extraction). Per window,
    * energy = Σ (s−128)²; a window is ACTIVE iff its energy ≥ the
    * doc's integer mean window energy (a relative threshold — no
    * magic absolute constant), and maximal runs of active windows are
    * the segments. Output per doc: window/active/segment counts, peak
    * window energy, active ratio.
    *
    * Determinism (§4): samples, energies, totals, and the threshold
    * are exact BIGINT math (the mean uses integer division — Spark
    * `div` == DuckDB `//` on non-negative operands); the one double,
    * active_ratio, is a single fixed-order division. Samples index by
    * CHARACTER position via ascii(substring) — the t04/t08 contract
    * both engines share on this corpus. Each HOF stage binds as its
    * own column (the t08 inlining lesson; HofInliningSpec gates the
    * plan). Scale shape: per-row projection, zero exchange but the
    * output ORDER BY — t01's scan-bound envelope; a real codec swap
    * replaces the sample expression only (the m04/m05 decoder-boundary
    * story, [[AudioStub]] is its JVM twin for the spec recount).
    */
  object AudioStub {
    /** Window width in samples; 16 gives 3-35 windows per corpus doc. */
    val WIN = 16

    /** JVM twin of the registered SQL expressions, for spec recounts:
      * (n_windows, n_active, n_segments, peak_energy, active_ratio).
      */
    def segment(text: String): (Long, Long, Long, Long, Double) = {
      val n = text.length
      val nw = (n + WIN - 1) / WIN
      if (nw == 0) return (0L, 0L, 0L, 0L, 0.0)
      val en = (0 until nw).map { w =>
        val until = math.min((w + 1) * WIN, n)
        (w * WIN until until).map { i =>
          val v = text.charAt(i).toLong - 128L; v * v
        }.sum
      }
      val mean = en.sum / nw
      val act = en.map(e => if (e >= mean) 1 else 0)
      val nseg = act.indices.count(i => act(i) == 1 && (i == 0 || act(i - 1) == 0))
      (nw.toLong, act.sum.toLong, nseg.toLong, en.max,
        act.sum.toDouble / nw.toDouble)
    }
  }

  private def m06(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      // one codegen'd linear pass — the HOF form of this
      // (ascii(substring(text, i, 1)) inside aggregate) re-seeks the
      // string per character and is O(n²) per doc (measured 66 s warm
      // at sf1 vs 2.5 s for the kernel); see AudioEnergy's scaladoc
      .withColumn("en", graft.functions.AudioFunctions
        .audioEnergies(col("text"), AudioStub.WIN))
      .withColumn("n_windows", size(col("en")).cast("long"))
      .withColumn("mean_e", expr(
        "CASE WHEN n_windows = 0 THEN cast(0 as bigint) ELSE " +
          "aggregate(en, cast(0 as bigint), (a, e) -> a + e) div n_windows END"))
      .withColumn("act", expr("transform(en, e -> IF(e >= mean_e, 1, 0))"))
      .select(col("doc_id"), col("n_windows"),
        expr("aggregate(act, cast(0 as bigint), (a, x) -> a + x)").as("n_active"),
        // a run starts at position 1 (if active) or wherever an active
        // window follows an inactive one; i >= 2 below keeps element_at
        // off index 0 (an ANSI error) and sequence() ascending
        expr("""CASE WHEN size(act) = 0 THEN cast(0 as bigint)
          ELSE cast(element_at(act, 1) as bigint) +
            (CASE WHEN size(act) < 2 THEN cast(0 as bigint)
             ELSE aggregate(transform(sequence(2, size(act), 1), i ->
                 IF(element_at(act, i) = 1 AND element_at(act, i - 1) = 0, 1, 0)),
               cast(0 as bigint), (a, x) -> a + x) END) END""").as("n_segments"),
        expr("coalesce(array_max(en), cast(0 as bigint))").as("peak_energy"),
        expr("""CASE WHEN n_windows = 0 THEN 0.0 ELSE
          cast(aggregate(act, cast(0 as bigint), (a, x) -> a + x) as double)
            / cast(n_windows as double) END""").as("active_ratio"))
      .orderBy(col("doc_id"))

  private val m06Sql = s"""
    WITH en0 AS (
      SELECT doc_id,
        CASE WHEN len(text) = 0 THEN []
        ELSE list_transform(range(0, (len(text) + ${AudioStub.WIN - 1}) // ${AudioStub.WIN}),
          w -> list_reduce([CAST(0 AS BIGINT)] ||
            list_transform(range(w * ${AudioStub.WIN} + 1, least((w + 1) * ${AudioStub.WIN}, len(text)) + 1),
              i -> CAST(ascii(substr(text, i, 1)) - 128 AS BIGINT)
                * CAST(ascii(substr(text, i, 1)) - 128 AS BIGINT)),
            (a, v) -> a + v)) END AS en
      FROM documents),
    st AS (
      SELECT doc_id, en, CAST(len(en) AS BIGINT) AS n_windows,
        CASE WHEN len(en) = 0 THEN CAST(0 AS BIGINT)
          ELSE list_reduce([CAST(0 AS BIGINT)] || en, (a, e) -> a + e)
            // CAST(len(en) AS BIGINT) END AS mean_e
      FROM en0),
    ac AS (
      SELECT doc_id, en, n_windows,
        list_transform(en, e -> CASE WHEN e >= mean_e THEN 1 ELSE 0 END) AS act
      FROM st)
    SELECT doc_id, n_windows,
      CAST(list_reduce([CAST(0 AS BIGINT)] || act, (a, x) -> a + x) AS BIGINT)
        AS n_active,
      CASE WHEN len(act) = 0 THEN CAST(0 AS BIGINT)
        ELSE CAST(act[1] AS BIGINT) + CAST(list_reduce([CAST(0 AS BIGINT)] ||
          list_transform(range(2, len(act) + 1), i ->
            CASE WHEN act[i] = 1 AND act[i - 1] = 0 THEN 1 ELSE 0 END),
          (a, x) -> a + x) AS BIGINT) END AS n_segments,
      CAST(COALESCE(list_max(en), 0) AS BIGINT) AS peak_energy,
      CASE WHEN n_windows = 0 THEN 0.0 ELSE
        CAST(list_reduce([CAST(0 AS BIGINT)] || act, (a, x) -> a + x) AS DOUBLE)
          / CAST(n_windows AS DOUBLE) END AS active_ratio
    FROM ac ORDER BY doc_id"""

  val ops: Seq[Op] = Seq(
    Op("m01_binary_meta", m01, Some(m01Sql)),
    Op("m02_media_stats", m02, Some(m02Sql)),
    Op("m03_frame_sample", m03, Some(m03Sql)),
    Op("m04_media_neardup", m04, Some(m04Sql)),
    Op("m05_pgm_neardup", m05, Some(m05Sql)),
    Op("m06_audio_segments", m06, Some(m06Sql)))
}
