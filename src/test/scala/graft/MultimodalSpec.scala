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
}
