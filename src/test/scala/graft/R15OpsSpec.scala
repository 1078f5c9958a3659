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
