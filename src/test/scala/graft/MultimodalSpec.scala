package graft

import graft.mm._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  test("mediaTable decodes opaque payloads into typed metadata") {
    val rows = Multimodal.mediaTable(spark, dir).limit(10).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.media.nonEmpty)
      assert(r.meta.width == 64 + r.media.length % 577)
      assert(Set("img", "vid").contains(r.meta.format))
    }
  }

  test("decodeAndResize caps dimensions while preserving payloads") {
    val resized = Multimodal.decodeAndResize(Multimodal.mediaTable(spark, dir), maxDim = 128)
      .collect()
    resized.foreach { r =>
      assert(r.meta.width <= 128 && r.meta.height <= 128)
      assert(r.media.nonEmpty) // payload rides along untouched
    }
  }

  test("m04 perceptual near-dup counts match a brute-force driver recount") {
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    // independent fingerprint: 72 region cells -> 64 dHash bits
    def fp(text: String): Long = {
      val w = math.max((text.length + 71) / 72, 1)
      val grid = (0 until 72).map { i =>
        val from = math.min(i * w, text.length)
        val until = math.min(i * w + w, text.length)
        val region = if (from >= text.length) "" else text.substring(from, until)
        Integer.parseInt(md5hex(region).take(1), 16)
      }
      (0 until 64).map { b =>
        val (i, j) = (b / 8, b % 8)
        if (grid(9 * i + j) < grid(9 * i + j + 1)) 1L << b else 0L
      }.foldLeft(0L)(_ | _)
    }
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val fps = docs.map { case (id, t) => id -> fp(t) }
    val expected = fps.map { case (id, f) =>
      id -> (f, fps.count { case (oid, of) =>
        oid != id && java.lang.Long.bitCount(f ^ of) <= 3
      }.toLong)
    }.toMap
    val got = SparkEntry.queries("m04_media_neardup")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, v) => assert(got(id) == v, s"doc $id") }
    // the corpus' suffix near-dups must actually surface
    assert(got.values.map(_._2).sum > 0, "degenerate: no near pair found")
  }

  test("sampleFrames fans out k deterministic fingerprints per payload") {
    val media = Multimodal.mediaTable(spark, dir).limit(5)
    val frames = Multimodal.sampleFrames(media, k = 3).collect()
    assert(frames.length == 15)
    assert(frames.map(f => (f.id, f.frame_idx)).distinct.length == 15)
    // determinism: same payload + index -> same fingerprint
    val again = Multimodal.sampleFrames(media, k = 3).collect()
    assert(frames.sortBy(f => (f.id, f.frame_idx)).toSeq ==
      again.sortBy(f => (f.id, f.frame_idx)).toSeq)
  }

  test("m06 audio segmentation equals the AudioStub JVM recount and " +
      "finds real segment structure") {
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, t) =>
      val (nw, na, ns, pk, ar) = Multimodal.AudioStub.segment(t)
      (id, nw, na, ns, pk, ar)
    }.toSet
    val got = SparkEntry.queries("m06_audio_segments")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    assert(got == expected,
      s"diff sample=${(got.diff(expected) ++ expected.diff(got)).take(2)}")
    // non-degenerate: activity varies and multi-segment docs exist
    assert(got.exists(_._4 >= 2), "no doc has >= 2 segments")
    assert(got.exists(r => r._3 < r._2), "every window active everywhere")
    got.foreach { r =>
      assert(r._3 <= r._2 && r._4 <= r._3,
        s"segment bounds violated: $r")
    }
  }
}
