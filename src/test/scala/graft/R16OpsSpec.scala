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

  test("t18/t19 bpe equals an imperative driver-side recount " +
      "(merge loop + per-doc encode re-derived from raw text)") {
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    def syms(word: String): Vector[String] =
      word.toVector.zipWithIndex.map { case (c, i) =>
        if (i == word.length - 1) s"$c</w>" else c.toString
      }
    // independent merge loop: plain maps, overlap-counting census,
    // left-to-right non-overlapping rewrite
    var vocab: Map[Vector[String], Long] = docs
      .flatMap(_._2.split(" ").filter(_.nonEmpty)).groupBy(identity)
      .map { case (w, xs) => syms(w) -> xs.length.toLong }
    def rewrite(ss: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < ss.length) {
        if (i + 1 < ss.length && ss(i) == a && ss(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += ss(i); i += 1 }
      }
      out.result()
    }
    val expMerges = (1 to text.Bpe.MERGES).map { _ =>
      val census = scala.collection.mutable.Map[(String, String), Long]()
      for ((ss, c) <- vocab; i <- 0 until ss.length - 1)
        census((ss(i), ss(i + 1))) = census.getOrElse((ss(i), ss(i + 1)), 0L) + c
      val ((a, b), c) = census.minBy { case ((x, y), n) => (-n, s"$x $y") }
      vocab = vocab.groupBy { case (ss, _) => rewrite(ss, a, b) }
        .map { case (ss, m) => ss -> m.values.sum }
      (s"$a $b", a + b, c)
    }
    val gotMerges = SparkEntry.queries("t18_bpe_vocab")(spark, dir)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(gotMerges == expMerges,
      s"merge tables differ:\n got $gotMerges\n exp $expMerges")
    assert(gotMerges.map(_._1).distinct.size == text.Bpe.MERGES,
      "duplicate merge learned — census not consuming prior rewrites")
    // per-doc encode recount
    val pairSeq = expMerges.map { case (p, _, _) =>
      val Array(a, b) = p.split(" ", 2); (a, b)
    }
    val expEnc = docs.map { case (id, t) =>
      val toks = t.split(" ").filter(_.nonEmpty)
      val stream = toks.toVector.flatMap(syms)
      val enc = pairSeq.foldLeft(stream) { case (ss, (a, b)) => rewrite(ss, a, b) }
      (id, toks.length.toLong, stream.length.toLong, enc.length.toLong,
        if (stream.isEmpty) 1.0 else enc.length.toDouble / stream.length.toDouble)
    }.toSet
    val gotEnc = SparkEntry.queries("t19_bpe_encode")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(gotEnc == expEnc,
      s"diff sample=${(gotEnc.diff(expEnc) ++ expEnc.diff(gotEnc)).take(2)}")
    // the merges must actually buy compression on most docs
    val ratios = gotEnc.toSeq.map(_._5)
    assert(ratios.sum / ratios.size < 0.95,
      "BPE merges bought <5% compression — degenerate vocabulary")
  }

  test("t20 bigram surprise equals a driver-side conditional-frequency " +
      "recount, scores are >= 1, and the score separates (coherence " +
      "signal a bag-of-words score cannot see)") {
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    def toks(t: String): Seq[String] = t.split(" ").filter(_.nonEmpty).toSeq
    def bigrams(t: String): Seq[(String, String)] =
      { val ts = toks(t); ts.zip(ts.drop(1)) }
    val c12 = docs.flatMap(d => bigrams(d._2)).groupBy(identity)
      .map { case (b, v) => b -> v.size.toLong }
    val c1 = c12.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    def dsum6(vs: Seq[Double]): Double = {
      val s = vs.map(v => new java.math.BigDecimal(v)
          .setScale(6, java.math.RoundingMode.HALF_UP))
        .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
      java.lang.Double.parseDouble(s.toPlainString)
    }
    val got = SparkEntry.queries("t20_bigram_surprise")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val withBigrams = docs.filter(d => bigrams(d._2).nonEmpty).map(_._1).toSet
    assert(got.keySet == withBigrams)
    for ((id, (n, surprise, maxS)) <- got) {
      val bs = bigrams(docs.toMap.apply(id))
      val ratios = bs.map(b => c1(b._1).toDouble / c12(b).toDouble)
      assert(n == bs.length.toLong, s"n_bigrams of doc $id")
      assert(surprise == dsum6(ratios) / bs.length, s"surprise of doc $id")
      assert(maxS == ratios.max, s"max_surprise of doc $id")
      assert(surprise >= 1.0 && maxS >= surprise)
    }
    val ss = got.values.map(_._2)
    assert(ss.max > ss.min * 1.05, "surprise is constant — no signal")
    // the join-back of the power-law bigram stream must never plan as
    // a sort-merge join (it would SORT the corpus token stream)
    val plan = SparkEntry.queries("t20_bigram_surprise")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"t20 sort-merge-joins the bigram stream:\n$plan")
  }

  test("s13 rerank scores equal a driver-side int8 recount; the rerank " +
      "never degrades s12's picks and recovers >=0.8 of the float-exact " +
      "ordering within its shortlist") {
    lazy val vecs = Tables(spark, dir, "embeddings").select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def quant(a: Array[Float]): Array[Long] = {
      val maxabs = a.foldLeft(0.0)((m, x) => math.max(m, math.abs(x.toDouble)))
      if (maxabs == 0.0) a.map(_ => 0L)
      else a.map(x =>
        functions.Int8Ops.roundHalfUpToByte(x.toDouble * 127.0 / maxabs).toLong)
    }
    def qcos(a: Long, b: Long): Double = {
      val (qa, qb) = (quant(vecs(a)), quant(vecs(b)))
      val (n2a, n2b) = (qa.map(x => x * x).sum, qb.map(x => x * x).sum)
      if (n2a > 0 && n2b > 0)
        qa.zip(qb).map { case (x, y) => x * y }.sum.toDouble /
          math.sqrt((n2a * n2b).toDouble)
      else -2.0
    }
    val rows = SparkEntry.queries("s13_ivfadc_rerank")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    // rerank fidelity: every emitted score IS the exact int8 cosine
    rows.foreach { case (q, n, s, _, _) =>
      assert(s == qcos(q, n), s"qcos of ($q, $n)")
    }
    // accuracy, two gates. (a) UNCONDITIONAL: the reranked top-3 must
    // match the exact graph at least as well as s12's raw ADC top-3 —
    // on this near-uniform corpus ABSOLUTE recall through an IVF
    // shortlist is bounded by the probed fraction (s10's documented
    // context), so the s09-style 0.8 floor applies to the
    // SHORTLIST-CONDITIONAL gate (b): among the R candidates the
    // shortlist actually contains, the int8 rerank must recover the
    // float-exact ordering — the claim a rerank stage exists for.
    def cosT(a: Long, b: Long): Double = {
      def d(x: Array[Float], y: Array[Float]) =
        x.indices.foldLeft(0.0)((acc, i) => acc + x(i).toDouble * y(i).toDouble)
      d(vecs(a), vecs(b)) / math.sqrt(d(vecs(a), vecs(a)) * d(vecs(b), vecs(b)))
    }
    val queries = rows.map(_._1).distinct.sorted
    val exact = queries.flatMap { q =>
      vecs.keys.filter(_ != q).toSeq
        .sortBy(n => (-cosT(q, n), n)).take(3).map(q -> _)
    }.toSet
    val s13Picks = rows.map(r => (r._1, r._2)).toSet
    val s12Picks = SparkEntry.queries("s12_ivfpq")(spark, dir)
      .filter("rank <= 3").select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall13 = s13Picks.intersect(exact).size.toDouble / exact.size
    val recall12 = s12Picks.intersect(exact).size.toDouble / exact.size
    info(f"s13 recall@3 $recall13%.2f vs s12-top3 $recall12%.2f")
    assert(recall13 >= recall12, "the int8 rerank degraded s12's raw ADC picks")
    // (b): float-exact top-3 among the R-shortlist vs s13's picks
    val shortlist = sim.Similarity.ivfadcScores(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(
        _.sortBy(t => (-t._3, t._2)).take(sim.Similarity.RERANK_R).map(_._2).toSet)
      .toMap
    val condExact = queries.flatMap { q =>
      shortlist(q).toSeq.sortBy(n => (-cosT(q, n), n)).take(3).map(q -> _)
    }.toSet
    val condRecall = s13Picks.intersect(condExact).size.toDouble / condExact.size
    info(f"s13 shortlist-conditional recall@3 $condRecall%.2f")
    assert(condRecall >= 0.8,
      f"int8 rerank recovers only $condRecall%.2f of the float-exact " +
        "ordering within its own shortlist")
    val emitted = rows.map(_._5)
    assert(emitted.forall(r => r >= 0.0 && r <= 1.0))
    assert(math.abs(emitted.sum / emitted.size - recall13) < 1e-9,
      "recall_at_3 column disagrees with the driver recount")
  }

  test("s13's rerank never shuffles or sorts the int8 store, and adds no " +
      "float-embedding scan beyond s12's machinery plus the recall witness") {
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    // the registered s13 checkpoints its summary (plan truncates), so
    // pin the factored pre-checkpoint stage-2 plan
    val plan = sim.Similarity.ivfadcRerankScored(spark, dir)
      .queryExecution.sparkPlan
    // the bucketed int8 store must only ever be the STREAMED side of a
    // broadcast join — candidates (R x queries rows) broadcast against
    // it; a plan that exchanges/sorts the store would hydrate the
    // corpus through the rerank
    var sawQvecJoin = false
    plan.foreach {
      case j: SortMergeJoinExec =>
        assert(!j.toString.contains("graft_annqvec"),
          s"int8 store inside a sort-merge join:\n$j")
      case j: ShuffledHashJoinExec =>
        assert(!j.toString.contains("graft_annqvec"),
          s"int8 store inside a shuffled hash join:\n$j")
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
          if j.toString.contains("graft_annqvec") =>
        sawQvecJoin = true
      case _ =>
    }
    assert(sawQvecJoin, "rerank plan lost the broadcast probe of the int8 store")
    def nEmbScans(p: org.apache.spark.sql.execution.SparkPlan): Int =
      p.collect {
        case s if s.nodeName.contains("Scan") &&
          s.toString.contains("embeddings.parquet") &&
          s.toString.contains("embedding") => s
      }.size
    val stage1Plan = sim.Similarity.ivfadcScores(spark, dir)
      .queryExecution.sparkPlan
    // the rerank stage must add ZERO float-embedding scans over its
    // own shortlist machinery — it reads only the int8 store
    assert(nEmbScans(plan) == nEmbScans(stage1Plan),
      s"the rerank stage hydrates float embeddings: " +
        s"${nEmbScans(plan)} vs stage-1 ${nEmbScans(stage1Plan)}")
  }
}
