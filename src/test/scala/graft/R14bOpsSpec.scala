package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 second batch: rare-token-density scoring (t15) and
  * shingle containment (d18) — each recounted driver-side from the
  * raw tables.
  */
class R14bOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  private def toks(text: String): Seq[String] =
    text.split(" ").filter(_.nonEmpty).toSeq

  private def sh3(text: String): Set[String] = {
    val t = toks(text)
    if (t.length >= 3) t.sliding(3).map(_.mkString(" ")).toSet else Set(text)
  }

  // dsum semantics: per-row double -> DECIMAL(38,6) half-up, exact sum,
  // correctly-rounded double
  private def dsum6(vs: Seq[Double]): Double = {
    val sum = vs.map(v => new java.math.BigDecimal(v)
        .setScale(6, java.math.RoundingMode.HALF_UP))
      .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
    java.lang.Double.parseDouble(sum.toPlainString)
  }

  lazy val texts: Map[Long, String] =
    Tables(spark, dir, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("t15 rarity equals a driver-side inverse-frequency recount") {
    val counts = texts.values.toSeq.flatMap(toks).groupBy(identity)
      .map { case (t, v) => t -> v.size.toLong }
    val nTotal = counts.values.sum
    val got = SparkEntry.queries("t15_rarity_score")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == texts.filter(t => toks(t._2).nonEmpty).keySet)
    for ((id, (nTok, rarity)) <- got) {
      val ts = toks(texts(id))
      assert(nTok == ts.length.toLong, s"n_tok of doc $id")
      val exp = dsum6(ts.map(t => nTotal.toDouble / counts(t).toDouble)) / ts.length
      assert(rarity == exp, s"rarity of doc $id")
    }
    // the score separates: rare-token-dense docs score above the head
    val rs = got.values.map(_._2)
    assert(rs.max > rs.min * 1.05, "rarity is constant — no signal")
  }

  test("d18 containment equals a raw-text recount and catches what jaccard misses") {
    val got = SparkEntry.queries("d18_containment")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.nonEmpty, "no candidate pairs at sf0.001")
    for (((a, b), (nA, nInter, c)) <- got) {
      val (sa, sb) = (sh3(texts(a)), sh3(texts(b)))
      assert(nA == sa.size.toLong, s"n_a of ($a,$b)")
      assert(nInter == sa.intersect(sb).size.toLong, s"n_inter of ($a,$b)")
      assert(c == nInter.toDouble / nA.toDouble, s"containment of ($a,$b)")
    }
    // both directions of every unordered pair are present, and the
    // synthetic " dup"-suffix copies give a pair where the short
    // side's containment beats the pair's jaccard (the case the
    // operator exists for)
    for ((a, b) <- got.keys) assert(got.contains((b, a)), s"missing ($b,$a)")
    val sep = got.collect { case ((a, b), (nA, nInter, c)) =>
      val nU = sh3(texts(a)).size + sh3(texts(b)).size - nInter
      c - nInter.toDouble / nU.toDouble
    }
    assert(sep.max > 0.1,
      "no pair where containment exceeds jaccard — subset signal absent")
  }
}
