package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-15 operators: span excision (t16). */
class R15OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("t16 span excision equals an independent driver-side recount") {
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    // independent leg: winnowing + interval merge re-implemented
    // imperatively, ALL occurrences kept (t14's recount keeps min only)
    def windows(text: String): Map[Long, Seq[Long]] = {
      val toks = text.split(" ").filter(_.nonEmpty)
      val grams = if (toks.length >= 3)
        (0 to toks.length - 3).map(i => s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}")
        else Seq()
      val hs = grams.map(_.foldLeft(0L)((acc, c) => (acc * 131 + c.toInt) % 1000000007L))
      if (hs.length < 4) Map()
      else (0 to hs.length - 4).map(j => (hs.slice(j, j + 4).min, j + 1L))
        .groupBy(_._1).map { case (fp, ps) => fp -> ps.map(_._2).distinct.sorted }
    }
    val perDoc = docs.map { case (id, t) => (id, t, windows(t)) }
    val census = perDoc.flatMap(_._3.keys).groupBy(identity)
      .map { case (fp, xs) => fp -> xs.length.toLong }
    val expected = perDoc.map { case (id, t, fps) =>
      val toks = t.split(" ").filter(_.nonEmpty)
      val ps = fps.collect { case (fp, pos) if census(fp) >= 2 => pos }
        .flatten.toSeq.sorted
      val covered = ps.flatMap(p => p to p + 5).toSet
      val kept = toks.zipWithIndex.collect { case (tk, i) if !covered(i + 1L) => tk }
      val nSpans = ps.zipWithIndex.count { case (p, i) => i == 0 || p - ps(i - 1) > 6 }
      (id, toks.length.toLong, (toks.length - kept.length).toLong,
        kept.length.toLong, nSpans.toLong, kept.mkString(" "))
    }.toSet
    val got = SparkEntry.queries("t16_span_excision")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5))).toSet
    assert(got == expected,
      s"sizes got=${got.size} expected=${expected.size}; " +
        s"diff sample=${(got.diff(expected) ++ expected.diff(got)).take(2)}")
    // the fixture must exercise the interesting cases: at least one doc
    // with a MERGED span (n_spans < its marked-window count), at least
    // one doc with multiple disjoint spans, and untouched docs survive
    // verbatim
    val merged = expected.filter(e => e._3 > 0 && e._3 > 6 * e._5 - 5)
    assert(merged.nonEmpty, "no doc merged overlapping windows — degenerate fixture")
    assert(expected.exists(_._5 >= 2), "no doc with >=2 disjoint spans")
    val untouched = expected.filter(_._3 == 0)
    assert(untouched.nonEmpty && untouched.forall { e =>
      docs.toMap.apply(e._1).split(" ").filter(_.nonEmpty).mkString(" ") == e._6
    }, "untouched docs must keep their full token stream")
  }

  test("sssp preds + unfoldPaths equal an imperative frontier Bellman-Ford " +
      "(keep-old-on-tie pred rule pinned)") {
    import spark.implicits._
    // two tie shapes: (a) node 3 reachable at equal cost through preds
    // 1 and 2 in the SAME round -> min pred wins; (b) node 7 reaches
    // cost 5 via pred 8 in round 2, and via the SMALLER pred 6 only in
    // round 3 -> the earlier pred is KEPT (global min-lex would flip
    // to 6 — this asserts the documented first-achieving-round rule)
    val edges = Seq(
      (0L, 1L, 1L), (0L, 2L, 1L), (1L, 3L, 2L), (2L, 3L, 2L),
      (0L, 8L, 4L), (8L, 7L, 1L),
      (0L, 5L, 1L), (5L, 6L, 1L), (6L, 7L, 3L))
    val got = graph.Traversals.unfoldPaths(
        graph.Traversals.ssspPredsConverged(edges.toDF("src", "dst", "cost"), 0L), 0L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // imperative twin: frontier relaxation, min-(cost, pred) per round,
    // strict-< update
    val dist = scala.collection.mutable.Map(0L -> 0L)
    val pred = scala.collection.mutable.Map(0L -> 0L)
    var frontier = Set(0L)
    while (frontier.nonEmpty) {
      val cand = edges.filter(e => frontier(e._1))
        .map(e => (e._2, dist(e._1) + e._3, e._1))
        .groupBy(_._1).map { case (n, cs) => (n, cs.map(c => (c._2, c._3)).min) }
      val improved = cand.filter { case (n, (c, _)) => c < dist.getOrElse(n, Long.MaxValue) }
      improved.foreach { case (n, (c, p)) => dist(n) = c; pred(n) = p }
      frontier = improved.keySet
    }
    def path(n: Long): Seq[Long] =
      if (n == 0L) Seq(0L) else path(pred(n)) :+ n
    val expected = dist.map { case (n, c) =>
      n -> ((c, (path(n).length - 1).toLong, path(n).mkString("->")))
    }.toMap
    assert(got == expected, s"got $got expected $expected")
    assert(pred(3L) == 1L, "same-round tie must break to the smaller pred")
    assert(pred(7L) == 8L,
      "later equal-cost candidate must NOT displace the first-round pred")
    assert(got(7L)._3 == "0->8->7")
  }

  test("g28 routes are cost-consistent with g26 and structurally valid") {
    val g26 = SparkEntry.queries("g26_sssp")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = SparkEntry.queries("g28_sssp_paths")(spark, dir).collect()
    assert(rows.length == g26.size, "g28 must cover exactly the reachable set")
    val hub = rows.find(_.getLong(1) == 0L).get.getLong(0)
    rows.foreach { r =>
      val (node, cost, hops, path) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3).split("->").map(_.toLong))
      assert(cost == g26(node), s"cost mismatch at $node")
      assert(path.length == hops + 1 && path.head == hub && path.last == node)
      // bipartite: edges connect customers (even) and suppliers (odd)
      path.sliding(2).filter(_.length == 2).foreach { w =>
        assert((w(0) + w(1)) % 2 == 1,
          s"non-bipartite step ${w(0)}->${w(1)} in path of $node")
      }
    }
    assert(rows.map(_.getLong(2)).max >= 5, "paths too shallow to exercise the unfold")
  }

  test("m05: real PGM decode is resolution-invariant and finds the planted near-dup groups") {
    val fp = mm.Multimodal.pgmFingerprintTable(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the group base doc (k=0, even: 18x16) and its k=2 sibling (even
    // at the SAME resolution) vs the k=1/k=3 siblings (odd: 36x32) —
    // each group mixes both byte layouts; the noise-free pair of
    // grids from DIFFERENT resolutions exists across groups g where
    // 4g is even and 4g+1 has 1 noise pixel, so invariance is pinned
    // directly on the decoder instead
    val basePayload = mm.Multimodal.pgmPayload(0L)         // 18x16
    val upPayload = mm.Multimodal.pgmPayload(1L)           // 36x32, 1 noise px
    val baseGrid = mm.Multimodal.PgmGridDecoder.grid(basePayload)
    val upGrid = mm.Multimodal.PgmGridDecoder.grid(upPayload)
    // doc 1 differs from doc 0 only in noise pixel (0,0) -> only cell 0
    // may move; the other 71 box means must be bit-identical across
    // the two resolutions
    assert(baseGrid.drop(1).toSeq == upGrid.drop(1).toSeq,
      "2x pixel replication changed a box mean — the decoder's integer downscale is not resolution-invariant")
    // group structure: within a group fingerprints are hamming-close
    val groups = fp.keys.groupBy(_ / 4).values.filter(_.size == 4)
    assert(groups.nonEmpty)
    val intra = groups.flatMap { g =>
      val ids = g.toSeq.sorted
      for (a <- ids; b <- ids if a < b)
        yield java.lang.Long.bitCount(fp(a) ^ fp(b))
    }.toSeq
    assert(intra.max <= 6,
      s"planted near-dup groups drifted too far apart (max hamming ${intra.max})")
    val out = SparkEntry.queries("m05_pgm_neardup")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.values.sum > 0, "no near-dups found — the planted groups were missed")
  }

  test("t16 interval arithmetic is self-consistent with t14's detection") {
    // every doc t14 flags loses tokens in t16; docs t14 never flags
    // lose none
    val flagged = SparkEntry.queries("t14_dup_spans")(spark, dir)
      .select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val t16 = SparkEntry.queries("t16_span_excision")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(flagged.forall(d => t16(d) > 0), "t14-flagged doc lost no tokens")
    assert(t16.filterNot { case (d, _) => flagged(d) }.forall(_._2 == 0L),
      "unflagged doc lost tokens")
  }
}
