package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** The incremental bigram-LM census ([[graft.text.BigramLmIndex]]) and
  * its streaming driver: chained O(batch) appends must serve exactly
  * the census a full rebuild on the union corpus would, occurrences
  * must never double-count across replays/overlaps, the bloom sidecars
  * must short-circuit untouched segments, and a single-batch stream
  * ingest must emit exactly t20's rows.
  */
class BigramLmIndexSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def df(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }
  private def countsMap(d: DataFrame): Map[String, Long] =
    d.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  // disjoint-vocab doc unless `text` given explicitly
  private def doc(batch: Int, id: Long): (Long, String) =
    (id, (0 until 10).map(t => s"b${batch}d${id}t$t").mkString(" "))
  private val boiler = (0 until 10).map(i => s"w$i").mkString(" ")

  test("chained appends equal a full rebuild on census AND lefts; " +
      "replays/overlaps never double-count; compact/vacuum preserve both") {
    val idx = new text.BigramLmIndex(spark,
      java.nio.file.Files.createTempDirectory("graft_lmidx_spec").toString)
    val b1 = df(Seq(doc(1, 0), doc(1, 1), (2L, boiler)))
    val b2 = df(Seq(doc(2, 10), (12L, boiler)))
    val b3 = df(Seq(doc(3, 20), doc(3, 21)))
    idx.build(b1)
    idx.append(b2)
    // the shared text's bigrams now count 2 occurrences
    val c = countsMap(idx.census())
    (0 until 9).foreach(i => assert(c(s"w$i w${i + 1}") == 2L))
    val l = countsMap(idx.lefts())
    (0 until 9).foreach(i => assert(l(s"w$i") == 2L))
    assert(!l.contains("w9"), "final token must not count as left context")
    // overlapping re-append: nothing fresh => counts frozen
    idx.append(b2.unionByName(df(Seq(doc(1, 0)))))
    assert(countsMap(idx.census()) == c, "overlap append changed the census")
    idx.append(b3)
    val rebuilt = new text.BigramLmIndex(spark,
      java.nio.file.Files.createTempDirectory("graft_lmidx_rb").toString)
    rebuilt.build(b1.unionByName(b2).unionByName(b3))
    assert(countsMap(idx.census()) == countsMap(rebuilt.census()),
      "chained appends diverge from the full rebuild (census)")
    assert(countsMap(idx.lefts()) == countsMap(rebuilt.lefts()),
      "chained appends diverge from the full rebuild (lefts)")
    val pre = (countsMap(idx.census()), countsMap(idx.lefts()))
    idx.compact()
    assert((countsMap(idx.census()), countsMap(idx.lefts())) == pre,
      "compact changed a count")
    idx.vacuum(1)
    assert((countsMap(idx.census()), countsMap(idx.lefts())) == pre,
      "vacuum changed a count")
  }

  test("count probes are O(batch): blooms short-circuit old segments, " +
      "and a batch's own keys read its own segment") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lmidx_ob").toString
    val idx = new text.BigramLmIndex(spark, dir)
    idx.build(df(Seq(doc(1, 0), doc(1, 1))))
    idx.append(df(Seq(doc(2, 10))))
    val seg = new java.io.File(dir, "seg")
    val moved = new java.io.File(dir, "seg_hidden")
    assert(moved.mkdirs())
    // batch 4 has disjoint ids and vocabulary: neither the id-freshness
    // probe nor the two count probes may open segments 1-2 — prove it
    // by hiding their parquet under the append + probes. (Bloom
    // membership is deterministic for fixed content.)
    for (s <- Seq("s1", "s2"); t <- Seq("docs", "census", "lefts")) {
      val from = new java.io.File(seg, s"$s/$t")
      assert(from.renameTo(new java.io.File(moved, s"${s}_$t")), s"hide $from")
    }
    val b4 = df(Seq(doc(4, 30), doc(4, 31)))
    idx.append(b4)
    val v = idx.version.get
    val big = graft.text.TextOps.bigramStream(b4).localCheckpoint()
    // self-inclusive probe: every batch bigram counts exactly its own
    // occurrences, read from segment v alone
    val c12 = countsMap(idx.censusAtFor(v, big.select("bigram")))
    assert(c12.nonEmpty && c12.values.forall(_ == 1L))
    assert(c12.keySet == big.select("bigram").collect().map(_.getString(0)).toSet)
    val l = countsMap(idx.leftsAtFor(v,
      big.selectExpr("split_part(bigram, ' ', 1) AS w1")))
    assert(l.nonEmpty && l.values.forall(_ == 1L))
    for (s <- Seq("s1", "s2"); t <- Seq("docs", "census", "lefts")) {
      assert(new java.io.File(moved, s"${s}_$t")
        .renameTo(new java.io.File(seg, s"$s/$t")))
    }
    // with history restored, the probe over an OLD bigram sums segments
    val oldBig = graft.text.TextOps.bigramStream(df(Seq(doc(1, 0))))
    assert(countsMap(idx.censusAtFor(v, oldBig.select("bigram")))
      .values.forall(_ == 1L))
  }

  test("streaming LM scoring: single-batch ingest equals batch t20; " +
      "scores are arrival-time; replay re-emits identically") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    type Row4 = (Long, Long, Double, Double)
    def rows(d: DataFrame): Set[Row4] =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSet

    // leg 1: the whole corpus as ONE batch on an empty index == t20
    val idx1 = new text.BigramLmIndex(spark,
      java.nio.file.Files.createTempDirectory("graft_lmidx_st1").toString)
    idx1.build(Seq.empty[(Long, String)].toDF("doc_id", "text"))
    val corpus = Tables(spark, sfDir, "documents").select("doc_id", "text")
    var emitted: Set[Row4] = null
    streaming.StreamOps.lmScoreBatch(idx1, corpus, 0L)(d => emitted = rows(d))
    assert(emitted == rows(SparkEntry.queries("t20_bigram_surprise")(spark, sfDir)),
      "single-batch stream ingest != batch t20")

    // leg 2: arrival-time semantics. Batch 1: five copies of one
    // boilerplate text (distinct ids). Batch 2: one more copy (fully
    // predictable => surprise 1.0) and one doc pairing the SAME vocab
    // novelly (high surprise — the coherence signal cross-batch).
    val idx2 = new text.BigramLmIndex(spark,
      java.nio.file.Files.createTempDirectory("graft_lmidx_st2").toString)
    idx2.build(Seq.empty[(Long, String)].toDF("doc_id", "text"))
    val b1 = df((0L until 5L).map(i => (i, boiler)))
    val shuffled = Seq(0, 2, 4, 6, 8, 1, 3, 5, 7, 9).map(i => s"w$i").mkString(" ")
    val b2 = df(Seq((10L, boiler), (11L, shuffled)))
    var out1: Set[Row4] = null
    streaming.StreamOps.lmScoreBatch(idx2, b1, 0L)(d => out1 = rows(d))
    assert(out1 == (0L until 5L).map(i => (i, 9L, 1.0, 1.0)).toSet,
      s"batch-1 copies must score a perfect 1.0, got $out1")
    var out2: Set[Row4] = null
    streaming.StreamOps.lmScoreBatch(idx2, b2, 1L)(d => out2 = rows(d))
    val repeat = out2.find(_._1 == 10L).get
    val novel = out2.find(_._1 == 11L).get
    // exact recount against the ARRIVAL census (b1 history + all of
    // b2 — self-inclusive, so even the novel pairings have c12 >= 1)
    val arrival = (b1.collect() ++ b2.collect()).map(_.getString(1))
      .flatMap { t => val ts = t.split(" "); ts.zip(ts.drop(1)) }
    val c12 = arrival.groupBy(identity).map { case (k, v) => k -> v.length }
    val c1 = arrival.groupBy(_._1).map { case (k, v) => k -> v.length }
    def recount(text: String): (Long, Double, Double) = {
      val ts = text.split(" ")
      val ratios = ts.zip(ts.drop(1)).map(p => c1(p._1).toDouble / c12(p).toDouble)
      val s = ratios.map(v => new java.math.BigDecimal(v)
          .setScale(6, java.math.RoundingMode.HALF_UP))
        .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
      (ratios.length.toLong,
        java.lang.Double.parseDouble(s.toPlainString) / ratios.length, ratios.max)
    }
    val (rn, rm, rx) = recount(boiler)
    assert((repeat._2, repeat._3, repeat._4) == ((rn, rm, rx)),
      s"doc 10 recount mismatch: got $repeat want ($rn, $rm, $rx)")
    val (nn, nm, nx) = recount(shuffled)
    assert((novel._2, novel._3, novel._4) == ((nn, nm, nx)),
      s"doc 11 recount mismatch: got $novel want ($nn, $nm, $nx)")
    // the coherence signal: a repeat of known text stays near 1 while
    // novel pairings of the SAME vocabulary surprise hard
    assert(repeat._3 < 1.5 && novel._3 > 3.0 && novel._3 > repeat._3 * 2,
      s"cross-batch coherence signal lost: repeat $repeat novel $novel")

    // leg 3: replay batch 2 (same rows, same batchId): no new version,
    // identical emission
    val vAfter = idx2.version.get
    var outR: Set[Row4] = null
    streaming.StreamOps.lmScoreBatch(idx2, b2, 1L)(d => outR = rows(d))
    assert(idx2.version.contains(vAfter), "replay must not publish a new version")
    assert(outR == out2, "replay emission drifted")
  }
}
