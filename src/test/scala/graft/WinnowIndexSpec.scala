package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** The incremental duplicated-span census ([[graft.text.WinnowIndex]])
  * and its streaming driver: chained O(batch) appends must serve
  * exactly the census a full rebuild on the union corpus would, docs
  * must never double-count across replays/overlaps, the bloom
  * sidecars must short-circuit untouched segments, and a single-batch
  * stream ingest must emit exactly t16's rows.
  */
class WinnowIndexSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  // 10-token docs => 8 rolling hashes => 5 winnowing windows per doc;
  // vocab disjoint across batches except where a shared boilerplate
  // sentence is injected
  private def doc(batch: Int, id: Long, shared: Boolean): (Long, String) = {
    val toks =
      if (shared) (0 until 10).map(t => s"common$t")
      else (0 until 10).map(t => s"b${batch}d${id}t$t")
    (id, toks.mkString(" "))
  }
  private def docs(batch: Int, ids: Range, sharedIds: Set[Long] = Set.empty): DataFrame = {
    import spark.implicits._
    ids.map(i => doc(batch, i.toLong, sharedIds(i.toLong))).toDF("doc_id", "text")
  }

  private def censusMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chained appends equal a full rebuild; replays/overlaps never double-count") {
    import spark.implicits._
    val idx = new text.WinnowIndex(spark,
      java.nio.file.Files.createTempDirectory("graft_winidx_spec").toString)
    // docs 2 and 12 share a 10-token boilerplate text across batches
    val b1 = docs(1, 0 until 10, sharedIds = Set(2L))
    val b2 = docs(2, 10 until 18, sharedIds = Set(12L))
    val b3 = docs(3, 18 until 25)
    idx.build(b1)
    idx.append(b2)
    // shared boilerplate is now held by docs 2 and 12 => every one of
    // its DISTINCT window fingerprints (adjacent windows often share a
    // min — winnowing's compression) is corpus-duplicated
    val sharedFps = graft.text.TextOps.winnowWindows(docs(9, 0 until 1, Set(0L)))
      .select("fp").distinct().collect().map(_.getLong(0)).toSet
    assert(sharedFps.nonEmpty)
    assert(censusMap(idx.census()).filter(_._2 == 2L).keySet == sharedFps,
      "cross-batch shared spans must census at exactly 2 holders")
    // overlapping re-append: nothing fresh => empty delta, counts frozen
    val before = censusMap(idx.census())
    idx.append(b2.unionByName(docs(1, 0 until 3)))
    assert(censusMap(idx.census()) == before,
      "replayed/overlapping append changed the census")
    idx.append(b3)
    val rebuilt = new text.WinnowIndex(spark,
      java.nio.file.Files.createTempDirectory("graft_winidx_rb").toString)
    rebuilt.build(b1.unionByName(b2).unionByName(b3))
    assert(censusMap(idx.census()) == censusMap(rebuilt.census()),
      "chained appends diverge from the full rebuild")
    // compact: read-equality, one segment
    val preCompact = censusMap(idx.census())
    idx.compact()
    assert(censusMap(idx.census()) == preCompact, "compact changed the census")
    idx.vacuum(1)
    assert(censusMap(idx.census()) == preCompact, "vacuum changed the census")
  }

  test("appends and census probes are O(batch): blooms short-circuit old segments") {
    val dir = java.nio.file.Files.createTempDirectory("graft_winidx_ob").toString
    val idx = new text.WinnowIndex(spark, dir)
    idx.build(docs(1, 0 until 10))
    idx.append(docs(2, 10 until 18))
    val seg = new java.io.File(dir, "seg")
    val moved = new java.io.File(dir, "seg_hidden")
    assert(moved.mkdirs())
    // batch 3 has disjoint ids and vocabulary: neither the id-freshness
    // probe nor the census probe may open segments 1-2 — prove it by
    // hiding their parquet under the append. (Bloom membership is
    // deterministic for fixed content — batch 3's vocabulary was
    // checked to draw no fpp claim, so this is not a flaky roll.)
    for (s <- Seq("s1", "s2"); t <- Seq("docs", "census")) {
      val from = new java.io.File(seg, s"$s/$t")
      assert(from.renameTo(new java.io.File(moved, s"${s}_$t")), s"hide $from")
    }
    idx.append(docs(4, 30 until 37))
    // censusBeforeFor on batch-3 fps against pre-batch history: no
    // bloom claims them, so no old segment is read
    val v = idx.version.get
    val fps = graft.text.TextOps.winnowWindows(docs(4, 30 until 37))
      .select("fp").distinct()
    assert(idx.censusBeforeFor(v, fps).count() == 0L)
    for (s <- Seq("s1", "s2"); t <- Seq("docs", "census")) {
      assert(new java.io.File(moved, s"${s}_$t")
        .renameTo(new java.io.File(seg, s"$s/$t")))
    }
    val expected = graft.text.TextOps.winnowWindows(
        docs(1, 0 until 10).unionByName(docs(2, 10 until 18))
          .unionByName(docs(4, 30 until 37)))
      .select("fp").distinct().count()
    assert(censusMap(idx.census()).size.toLong == expected)
  }

  test("streaming span dedup: single-batch ingest equals batch t16; " +
      "cross-batch spans excise on arrival; replay re-emits identically") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    type Row6 = (Long, Long, Long, Long, Long, String)
    def rows(df: DataFrame): Set[Row6] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5))).toSet

    // leg 1: the whole corpus as ONE batch on an empty index == t16
    val idx1 = new text.WinnowIndex(spark,
      java.nio.file.Files.createTempDirectory("graft_winidx_st1").toString)
    idx1.build(Seq.empty[(Long, String)].toDF("doc_id", "text"))
    val corpus = Tables(spark, dir, "documents").select("doc_id", "text")
    var emitted: Set[Row6] = null
    streaming.StreamOps.spanDedupBatch(idx1, corpus, 0L)(df => emitted = rows(df))
    assert(emitted == rows(SparkEntry.queries("t16_span_excision")(spark, dir)),
      "single-batch stream ingest != batch t16")

    // leg 2: two batches; batch 2 repeats batch 1's boilerplate
    val idx2 = new text.WinnowIndex(spark,
      java.nio.file.Files.createTempDirectory("graft_winidx_st2").toString)
    val b1 = docs(1, 0 until 8, sharedIds = Set(2L))
    val b2 = docs(2, 10 until 18, sharedIds = Set(12L))
    idx2.build(Seq.empty[(Long, String)].toDF("doc_id", "text"))
    var out1: Set[Row6] = null
    streaming.StreamOps.spanDedupBatch(idx2, b1, 0L)(df => out1 = rows(df))
    // batch 1: the boilerplate exists only once so far => untouched
    assert(out1.forall(_._3 == 0L), "batch 1 must see no duplication yet")
    var out2: Set[Row6] = null
    streaming.StreamOps.spanDedupBatch(idx2, b2, 1L)(df => out2 = rows(df))
    val d12 = out2.find(_._1 == 12L).get
    assert(d12._3 == 10L && d12._5 == 1L && d12._6 == "",
      s"doc 12's repeated boilerplate must excise fully on arrival, got $d12")
    assert(out2.filter(_._1 != 12L).forall(_._3 == 0L),
      "batch-2 docs without history hits must pass through")

    // leg 3: replay batch 2 (same rows, same batchId): no new version,
    // identical emission
    val vAfter = idx2.version.get
    var outR: Set[Row6] = null
    streaming.StreamOps.spanDedupBatch(idx2, b2, 1L)(df => outR = rows(df))
    assert(idx2.version.contains(vAfter), "replay must not publish a new version")
    assert(outR == out2, "replay emission drifted")
  }
}
