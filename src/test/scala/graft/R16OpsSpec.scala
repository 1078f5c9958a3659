package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-16 operators: PII redaction (t17). */
class R16OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("t17 pii redaction equals an independent driver-side recount " +
      "(java.util.regex over imperatively re-enriched text)") {
    import text.TextOps.{piiEmailRe, piiPhoneRe, piiIpRe, piiIdRe}
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // independent leg: the enrichment re-derived with plain string ops,
    // the detection/redaction with java.util.regex directly
    val res = Seq(piiEmailRe, piiPhoneRe, piiIpRe, piiIdRe).map(_.r)
    val tags = Seq("<EMAIL>", "<PHONE>", "<IP>", "<ID>")
    val expected = docs.map { case (id, src, text) =>
      val toks = text.split(" ").filter(_.nonEmpty).toSeq
      val k = (id % (toks.length + 1)).toInt
      val piis = Seq(
        if (id % 3 != 0) Some(s"user$id@ex${id % 10}.example.com") else None,
        if (id % 4 != 1) Some(s"${id % 90 + 10}-${id * 3 % 900 + 100}-" +
          s"${id * 7 % 900 + 100}-${id * 9 % 9000 + 1000}") else None,
        if (id % 5 == 2) Some(s"10.${id % 256}.${id * 3 % 256}.${id * 7 % 256}")
        else None,
        if (id % 7 == 3) Some(s"DE${id % 90 + 10}ACCT${id % 900000 + 100000}")
        else None).flatten
      val etext = (toks.take(k) ++ piis ++ toks.drop(k)).mkString(" ")
      val counts = res.map(_.findAllIn(etext).length.toLong)
      val redacted = res.zip(tags).foldLeft(etext) {
        case (t, (re, tag)) => re.replaceAllIn(t, tag)
      }
      (id, src, counts(0), counts(1), counts(2), counts(3), counts.sum, redacted)
    }.toSet
    val got = SparkEntry.queries("t17_pii_redaction")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7)))
      .toSet
    assert(got == expected,
      s"sizes got=${got.size} expected=${expected.size}; " +
        s"diff sample=${(got.diff(expected) ++ expected.diff(got)).take(2)}")

    // per-(source, class) census: the rollup a curation dashboard reads
    val gotCensus = got.toSeq
      .flatMap(r => Seq(("email", r._2, r._3), ("phone", r._2, r._4),
        ("ipv4", r._2, r._5), ("id", r._2, r._6)))
      .groupBy(x => (x._1, x._2)).view.mapValues(_.map(_._3).sum).toMap
    val expCensus = expected.toSeq
      .flatMap(r => Seq(("email", r._2, r._3), ("phone", r._2, r._4),
        ("ipv4", r._2, r._5), ("id", r._2, r._6)))
      .groupBy(x => (x._1, x._2)).view.mapValues(_.map(_._3).sum).toMap
    assert(gotCensus == expCensus)
    assert(gotCensus.values.sum > 0, "degenerate fixture: zero PII matched")

    // redaction completeness: no residual matches, placeholder counts
    // equal the census, and zero-PII docs pass through verbatim
    got.foreach { r =>
      res.foreach(re => assert(re.findFirstIn(r._8).isEmpty,
        s"doc ${r._1}: residual PII after redaction"))
      tags.zip(Seq(r._3, r._4, r._5, r._6)).foreach { case (tag, n) =>
        assert(tag.r.findAllIn(r._8).length == n,
          s"doc ${r._1}: $tag placeholder count != census")
      }
    }
    val untouched = got.filter(_._7 == 0L)
    assert(untouched.nonEmpty, "no zero-PII docs — degenerate residues")
    val raw = docs.map(d => d._1 -> d._3).toMap
    untouched.foreach { r =>
      assert(raw(r._1).split(" ").filter(_.nonEmpty).mkString(" ") == r._8,
        s"doc ${r._1}: zero-PII doc must pass through verbatim")
    }
  }
}
