package graft

import graft.mm.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The m04 decode boundary: the registered SQL-stub path and the
  * [[Multimodal.GridDecoder]] JVM path must agree bit-for-bit under
  * the stub decoder (so swapping in a real codec is plumbing-
  * unchanged), and the PGM decoder must produce true box-averaged
  * luminance with the dHash invariances a real pipeline relies on.
  */
class MmDecoderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  private def fpOf(payloads: Seq[(Long, Array[Byte])],
      dec: Multimodal.GridDecoder): Map[Long, Long] = {
    import spark.implicits._
    Multimodal.fingerprintWith(spark.createDataset(payloads), dec)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("stub decoder through fingerprintWith is bit-equal to the registered SQL-stub path") {
    import spark.implicits._
    val media = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary"))
      .as[(Long, Array[Byte])]
    val viaDecoder = Multimodal.fingerprintWith(media, Multimodal.StubGridDecoder)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaSql = Multimodal.fingerprintTable(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDecoder == viaSql, "decoder path diverged from the SQL stub path")
    assert(viaSql.size == 500)
  }

  // a P5 image whose pixel value is constant inside each of the 72
  // dHash boxes: pixel(y, x) = pat(y*8/h, x*9/w)
  private def pgm(w: Int, h: Int, pat: (Int, Int) => Int): Array[Byte] = {
    val header = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
    val px = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w)
      px(y * w + x) = pat(y * 8 / h, x * 9 / w).toByte
    header ++ px
  }

  test("PGM decoder: true box-averaged luminance, resolution-invariant dHash") {
    val base = (r: Int, c: Int) => (r * 9 + c) * 3 % 251
    val small = pgm(18, 16, base)
    val big = pgm(90, 80, base)
    // one box brightened: flips only the <=2 comparator bits that
    // touch box (3, 4)
    val edited = pgm(90, 80, (r, c) => if (r == 3 && c == 4) 250 else base(r, c))
    // exact grid check on the small image
    val grid = Multimodal.PgmGridDecoder.grid(small)
    assert(grid.toSeq == (for (r <- 0 until 8; c <- 0 until 9) yield base(r, c)).toSeq)
    val fps = fpOf(Seq((1L, small), (2L, big), (3L, edited)), Multimodal.PgmGridDecoder)
    assert(fps(1L) == fps(2L), "same image at 2 resolutions must share the fingerprint")
    val dEdit = java.lang.Long.bitCount(fps(2L) ^ fps(3L))
    assert(dEdit >= 1 && dEdit <= 3, s"local edit flipped $dEdit bits — expected 1..3")
    // unrelated content lands far away (alternating bright/dark, so
    // its comparators invert half the base's monotone-row bits —
    // monotone-vs-monotone patterns share most dHash bits by design)
    val other = pgm(90, 80, (r, c) => if ((r + c) % 2 == 0) 200 else 10)
    val fo = fpOf(Seq((4L, other), (2L, big)), Multimodal.PgmGridDecoder)
    assert(java.lang.Long.bitCount(fo(4L) ^ fo(2L)) > 3, "unrelated images too close")
  }

  test("PGM parser rejects non-P5 payloads and falls back to the stub grid") {
    val junk = "definitely not a pgm".getBytes("UTF-8")
    assert(Multimodal.PgmGridDecoder.parse(junk).isEmpty)
    assert(Multimodal.PgmGridDecoder.grid(junk).toSeq ==
      Multimodal.StubGridDecoder.grid(junk).toSeq)
    // truncated raster is rejected too
    val short = "P5\n10 10\n255\n".getBytes("US-ASCII") ++ Array.fill(5)(1.toByte)
    assert(Multimodal.PgmGridDecoder.parse(short).isEmpty)
    // comments in the header parse fine
    val commented = ("P5\n# a comment\n9 8\n255\n".getBytes("US-ASCII")
      ++ Array.tabulate(72)(i => (i * 2).toByte))
    val p = Multimodal.PgmGridDecoder.parse(commented)
    assert(p.exists { case (w, h, px) => w == 9 && h == 8 && px.length == 72 })
  }
}
