package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** The incremental decontamination index ([[graft.dedup.GramIndex]]):
  * chained O(batch) appends must serve exactly the gram set a full
  * rebuild on the union corpus would — and the bloom sidecars must
  * actually short-circuit segment reads, not just exist.
  */
class GramIndexSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def docs(batch: Int, ids: Range): DataFrame = {
    import spark.implicits._
    // 12 unique tokens per doc => 5 distinct 8-grams per doc, vocab
    // disjoint across batches (and docs) by construction
    ids.map(id => (id.toLong,
        (0 until 12).map(t => s"b${batch}d${id}t$t").mkString(" ")))
      .toDF("doc_id", "text")
  }

  private def gramSet(df: DataFrame): Set[String] =
    df.collect().map(_.getString(0)).toSet

  test("chained appends equal a full rebuild; replays and overlaps are idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gramidx_spec").toString
    val idx = new dedup.GramIndex(spark, dir)
    val b1 = docs(1, 0 until 10)
    val b2 = docs(2, 10 until 18)
    val b3 = docs(3, 18 until 25)
    idx.build(b1)
    idx.append(b2)
    // overlapping batch: b2's docs again plus one b1 duplicate text —
    // every gram already stored, so the delta segment must be empty
    idx.append(b2.unionByName(docs(1, 0 until 3)))
    val afterReplay = gramSet(idx.grams())
    idx.append(b3)

    val rebuildDir = java.nio.file.Files.createTempDirectory("graft_gramidx_rb").toString
    val rebuilt = new dedup.GramIndex(spark, rebuildDir)
    rebuilt.build(b1.unionByName(b2).unionByName(b3))
    assert(gramSet(idx.grams()) == gramSet(rebuilt.grams()),
      "chained appends diverge from the full rebuild")
    // segment disjointness: the multi-path read needs no distinct
    val all = idx.grams().collect().map(_.getString(0))
    assert(all.length == all.distinct.length, "segments share a gram")
    // the replayed/overlapping append added nothing
    val rebuilt12 = new dedup.GramIndex(spark,
      java.nio.file.Files.createTempDirectory("graft_gramidx_rb12").toString)
    rebuilt12.build(b1.unionByName(b2))
    assert(afterReplay == gramSet(rebuilt12.grams()),
      "overlap/replay append changed the stored gram set")
  }

  test("appends are O(batch): blooms short-circuit non-colliding old segments") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gramidx_ob").toString
    val idx = new dedup.GramIndex(spark, dir)
    idx.build(docs(1, 0 until 10))
    idx.append(docs(2, 10 until 18))
    // batch 3's vocabulary is disjoint from batches 1-2, so no bloom
    // claims any of its grams (bloom membership is deterministic for
    // fixed content, so this is not a flaky fpp roll) — the membership
    // probe must not open the old segments' parquet at all. Prove it
    // by yanking their data files out from under the append.
    val seg = new java.io.File(dir, "seg")
    val moved = new java.io.File(dir, "seg_hidden")
    assert(moved.mkdirs())
    for (s <- Seq("s1", "s2")) {
      val from = new java.io.File(seg, s"$s/grams")
      val to = new java.io.File(moved, s)
      assert(from.renameTo(to), s"could not hide $from")
    }
    idx.append(docs(3, 18 until 25)) // must not touch the hidden parquet
    for (s <- Seq("s1", "s2")) {
      val from = new java.io.File(moved, s)
      val to = new java.io.File(seg, s"$s/grams")
      assert(from.renameTo(to))
    }
    assert(idx.grams().count() == 25 * 5L)
  }

  test("compact merges to one segment; vacuum retires the old ones; reads unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gramidx_cv").toString
    val idx = new dedup.GramIndex(spark, dir)
    idx.build(docs(1, 0 until 6))
    idx.append(docs(2, 6 until 12))
    idx.append(docs(3, 12 until 20))
    val before = gramSet(idx.grams())
    val cv = idx.compact()
    assert(idx.version.contains(cv))
    assert(gramSet(idx.grams()) == before, "compaction changed the gram set")
    val dropped = idx.vacuum(1)
    assert(dropped.nonEmpty)
    // only the compacted segment survives the sweep
    val segs = new java.io.File(dir, "seg").listFiles().map(_.getName).toSet
    assert(segs == Set(s"s$cv"), s"expected only the merged segment, got $segs")
    assert(gramSet(idx.grams()) == before, "vacuum broke the served read")
  }
}
