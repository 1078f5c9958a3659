package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{PiiFunctions, PiiScan}
import graft.text.TextOps.{piiEmailRe, piiIdRe, piiIpRe, piiPhoneRe}

/** The PiiScan kernel claims EXACT `java.util.regex` replaceAll
  * equivalence for the four t17 patterns. This spec makes the claim
  * falsifiable directly: the reference leg runs the real regex engine
  * over the same chained passes, on hand-built adversarial shapes
  * (every backtracking corner the patterns have) and on seeded fuzz
  * strings dense in near-miss fragments.
  */
class PiiScanSpec extends AnyFunSuite {

  private val pats = Seq(piiEmailRe, piiPhoneRe, piiIpRe, piiIdRe)
    .map(java.util.regex.Pattern.compile)
  private val tagSeq = Seq("<EMAIL>", "<PHONE>", "<IP>", "<ID>")

  /** Chained regex passes: per pass, replacement count + rewritten text. */
  private def ref(s: String): (Seq[Long], String) = {
    var t = s
    val counts = pats.zip(tagSeq).map { case (p, tag) =>
      val m = p.matcher(t)
      var c = 0L
      while (m.find()) c += 1
      t = p.matcher(t).replaceAll(tag)
      c
    }
    (counts, t)
  }

  private def kernel(s: String): (Seq[Long], String) = {
    val r = PiiScan.scanAll(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    (Seq(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)),
      r.getUTF8String(4).toString)
  }

  private def check(s: String): Unit = {
    val (ec, et) = ref(s)
    val (gc, gt) = kernel(s)
    assert(gc == ec && gt == et,
      s"kernel diverges from java.util.regex on <$s>:\n" +
        s"  counts got $gc want $ec\n  text got <$gt> want <$et>")
  }

  test("kernel == java.util.regex on adversarial shapes") {
    Seq(
      // email: rightmost-dot backtracking, failed attempts, double '@'
      "user7@ex3.example.com", "a@b.c", "a@b.cd", "a@b.cde@f.gh",
      "a@b@c.de", "x@ab.c@d.ef", "x@y.comAB12ABCDEFGH12ZZ",
      "a..b@c..d.com", "a@1.2.3.ab", "x@1.2.3.4.ab", "x@abc",
      "@x.com", "a@.com", "a@x.", "a@x.c0m", "a@x.cOm", "a@x-y.co",
      "a@x.co-", "-@x.co", "a@x..co", "A@x.co", "aA@x.co", "a@X.co",
      "%_+-.a@b.cd", "a@b.cd.", "a@b.cd.e", "a@b.cd.ef",
      "user@ex.com more a@b text", "a@b.cde.f", "tail a@b.co",
      // phone: exact groups, boundaries, long runs
      "12-345-678-9012", "123-345-678-9012", "12-345-678-90123",
      "x12-345-678-9012", "12-345-678-9012x", "_12-345-678-9012",
      "12-345-678-9012_", " 12-345-678-9012 ", "1-345-678-9012",
      "12-34-678-9012", "12-345-678-901", "12-345-678-9012-34",
      "99-899-899-8999", "12-345-678-9012 13-456-789-0123",
      // ip: octet lengths, runs > 3, chains, boundaries
      "1.2.3.4", "10.255.3.199", "1234.5.6.7", "1.2.3.4567",
      "1.2.3.4.5", "1.2.3.4.5.6.7.8", "a1.2.3.4", "1.2.3.4a",
      "1.2.3.4_", ".1.2.3.4.", "1..2.3.4", "1.2.3.", "1.2.3",
      "10.0.0.1x2", "10.0.0.12 10.0.0.13", "0.0.0.0",
      // id: case/digit shapes, boundaries, near-misses
      "DE12ACCT123456", "DE12ACCT1234567", "DE12ACCT12345",
      "xDE12ACCT123456", "DE12ACCT123456x", "DE12ACCT123456_",
      "DE12ACCT12345a", "DEX2ACCT123456", "D112ACCT123456",
      "DE12ACCT123456", " DE12ACCT123456 ", "XDE12ACCT123456",
      "DE12acct123456", "DE99ZZZZ999999",
      // cross-class adjacency and placeholder interaction
      "a@b.co12-345-678-9012", "12-345-678-9012a@b.co",
      "1.2.3.4DE12ACCT123456", "DE12ACCT1234561.2.3.4",
      "<EMAIL> a@b.co <PHONE>", "user@ex.com 12-345-678-9012 " +
        "10.1.2.3 DE12ACCT123456",
      // degenerate
      "", " ", "@", ".", "-", "a", "1", "<", ">", "@@..--__%%++"
    ).foreach(check)
  }

  test("kernel == java.util.regex on seeded fuzz (fragment soup)") {
    val rnd = new scala.util.Random(20260816L)
    val frag = Array(
      "user", "@", "ex", ".", "com", "co", "c", "-", "_", "%", "+",
      "12", "345", "9012", "1", "10", "255", "1234", "DE", "ACCT",
      "A1", "ZZ", "99", " ", "  ", "x", "X", "<EMAIL>", "<IP>",
      "a@b.co", "1.2.3.4", "12-345-678-9012", "DE12ACCT123456",
      "ab", "AB", "0", "..", "--", "@@", "é", "日", "‌",
      "𝒜" /* 𝒜 MATHEMATICAL SCRIPT CAPITAL A (letter, astral) */,
      "😀" /* 😀 (non-letter, astral) */)
    (1 to 4000).foreach { _ =>
      val s = (0 until (1 + rnd.nextInt(12)))
        .map(_ => frag(rnd.nextInt(frag.length))).mkString
      check(s)
    }
  }

  test("the kernel's codegen path agrees with the fuzz-pinned eval on a " +
      "parquet-backed scan, and t17's plan evaluates it once per row") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    // parquet-backed (a local relation constant-folds the expression
    // away at optimize time — this forces the WholeStageCodegen path)
    val df = Tables(spark, dir, "documents").filter(col("doc_id") < 50)
      .withColumn("pii", PiiFunctions.piiRedact(col("text")))
      .select(col("text"), col("pii.n_email"), col("pii.n_phone"),
        col("pii.n_ipv4"), col("pii.n_id"), col("pii.redacted"))
    val got = df.collect().map(r =>
      (r.getString(0), (Seq(r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)), r.getString(5))))
    assert(got.nonEmpty)
    got.foreach { case (text, out) => assert(out == ref(text)) }
    val wscg = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w }
    assert(wscg.exists(_.toString.toLowerCase.contains("piiredact")),
      "kernel projection fell out of whole-stage codegen")
    // single-eval pin on the REGISTERED t17 plan: the kernel must
    // appear exactly once (CollapseProject must not duplicate the
    // struct into its five consumers)
    val t17Plan = SparkEntry.queries("t17_pii_redaction")(spark, dir)
      .queryExecution.executedPlan.toString.toLowerCase
    assert("piiredact".r.findAllIn(t17Plan).size == 1,
      s"PiiRedact duplicated or lost in t17's plan:\n$t17Plan")
  }
}
