package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Independent re-computation checks for the round-12 additions
  * (e13 interval counts, d14 fuzzy names, t13 weighted sampling,
  * g24 SCC): each distributed plan is compared against a plain-Scala
  * single-threaded re-implementation of the same contract on the
  * sf0.001 corpus — a different algorithm shape (driver loops,
  * boolean-matrix closure, brute-force levenshtein), so a shared bug
  * can't hide on both sides. The DuckDB oracle is the third leg.
  */
class R12OpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("e13 interval counts match a driver-side recount and plan no nested loop") {
    // es derivation is shared ingest plumbing (encoding sniff); the
    // interval logic under test is recounted independently below
    val ev = ops.Events.withEpoch(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("es"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val clicksByUser = ev.filter(_._3 == "click").groupBy(_._2)
      .map { case (u, rs) => u -> rs.map(_._4) }
    val expected = ev.filter(_._3 == "purchase").map { case (id, u, _, es) =>
      id -> clicksByUser.getOrElse(u, Array.empty[Long])
        .count(c => c >= es - 1800 && c < es).toLong
    }.toMap
    val df = SparkEntry.queries("e13_interval_counts")(spark, dir)
    // the operator exists to AVOID the quadratic plans a range predicate
    // invites — the physical tree must be equi-join only
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join planned quadratic:\n$plan")
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got.keySet == expected.keySet, "purchase coverage")
    expected.foreach { case (id, n) => assert(got(id) == n, s"purchase $id") }
    assert(expected.values.sum > 0, "corpus has at least one in-window click")
  }

  test("d14 fuzzy name pairs equal brute-force levenshtein<=1 over distinct names") {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val t = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      dp(a.length)
    }
    val names = Tables(spark, dir, "supplier").select("s_name")
      .distinct().collect().map(_.getString(0)).sorted
    val expected = (for {
      i <- names.indices; j <- (i + 1) until names.length
      if lev(names(i), names(j)) <= 1
    } yield (names(i), names(j), lev(names(i), names(j)).toLong)).toSet
    val got = SparkEntry.queries("d14_fuzzy_names")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expected, s"got ${got.size} pairs, expected ${expected.size}")
    assert(expected.nonEmpty, "corpus yields at least one distance-1 pair")
  }

  test("t13 weighted-sample census matches a driver-side recount") {
    val stop = Set("the", "a", "of", "and", "to", "in", "is")
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "text", "lang", "source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val per = docs.map { case (id, text, lang, source) =>
      val t = text.split(" ", -1).filter(_.nonEmpty)
      val qual = if (t.isEmpty) 0.0 else {
        val nStop = t.count(stop)
        val nPunct = "[!?,.;:]".r.findAllIn(text).size
        0.4 * (nStop.toDouble / t.length) +
          0.4 * (1.0 - nPunct.toDouble / text.length) +
          0.2 * math.min(t.length.toDouble / 100.0, 1.0)
      }
      val h32 = java.lang.Long.parseLong(md5hex("wsample:" + id).take(8), 16)
      ((source, lang), (qual, if (h32.toDouble < qual * 4294967296.0) 1L else 0L))
    }
    val expected = per.groupBy(_._1).map { case (k, rs) =>
      val n = rs.length.toLong
      val acc = rs.map(_._2._2).sum
      val sumQm = rs.map(r => math.round(r._2._1 * 1000000.0)).sum
      k -> ((n, acc, acc.toDouble / n, sumQm.toDouble / (n * 1000000.0)))
    }
    val got = SparkEntry.queries("t13_weighted_sample")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, v) => assert(got(k) == v, s"cell $k") }
    // sampling must neither accept nor reject everything at corpus level
    val (accTot, nTot) = (got.values.map(_._2).sum, got.values.map(_._1).sum)
    assert(accTot > 0 && accTot < nTot, s"degenerate acceptance $accTot/$nTot")
  }

  test("d15 curation funnel matches a recount from its component gates") {
    val stop = Set("the", "a", "of", "and", "to", "in", "is")
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "text", "source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // gate 1 recounted independently (exact keeper = min id per content)
    val exactKeepers = docs.groupBy(d => md5hex(d._2))
      .values.map(_.map(_._1).min).toSet
    // gate 2 uses the engine's d06 output — itself oracle-checked and
    // driver-recounted elsewhere; the funnel's JOB is composing it
    val clusterKeeper = SparkEntry.queries("d06_dup_clusters")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(2) == 1L)).toMap
    // gate 3 recounted independently (t13's quality arithmetic)
    def qual(text: String): Double = {
      val t = text.split(" ", -1).filter(_.nonEmpty)
      if (t.isEmpty) 0.0 else {
        val nStop = t.count(stop)
        val nPunct = "[!?,.;:]".r.findAllIn(text).size
        0.4 * (nStop.toDouble / t.length) +
          0.4 * (1.0 - nPunct.toDouble / text.length) +
          0.2 * math.min(t.length.toDouble / 100.0, 1.0)
      }
    }
    val expected = docs.groupBy(_._3).map { case (src, ds) =>
      val g1 = ds.filter(d => exactKeepers(d._1))
      val g2 = g1.filter(d => clusterKeeper.getOrElse(d._1, true))
      val g3 = g2.filter(d => qual(d._2) >= 0.5)
      src -> ((ds.length.toLong, g1.length.toLong, g2.length.toLong,
        g3.length.toLong, g3.length.toDouble / ds.length))
    }
    val got = SparkEntry.queries("d15_curation_funnel")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, v) => assert(got(k) == v, s"source $k") }
    // the funnel must be monotone and actually drop documents overall
    // (at sf0.001 the exact gate alone may drop nothing — the corpus'
    // ~4% near-dups are copy+" dup", not byte-identical)
    val (n, e1, e2, e3) = (got.values.map(_._1).sum, got.values.map(_._2).sum,
      got.values.map(_._3).sum, got.values.map(_._4).sum)
    assert(e1 <= n && e2 <= e1 && e3 <= e2 && e3 < n,
      s"degenerate funnel $n/$e1/$e2/$e3")
  }

  test("g24 SCC labels match a boolean-matrix closure recount") {
    val edges = graph.TradeGraph.edgesTable(spark, dir)
      .select("src", "dst").collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getAs[Number](1).longValue()))
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.length
    val reach = Array.fill(n, n)(false)
    edges.foreach { case (s, d) => reach(idx(s))(idx(d)) = true }
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (reach(i)(k) && reach(k)(j)) reach(i)(j) = true
    val expected = nodes.zipWithIndex.map { case (v, i) =>
      val mutual = nodes.zipWithIndex.collect {
        case (u, j) if reach(i)(j) && reach(j)(i) => u
      }
      v -> (mutual :+ v).min
    }.toMap
    val sizes = expected.values.groupBy(identity).map { case (s, vs) => s -> vs.size.toLong }
    val got = SparkEntry.queries("g24_scc")(spark, dir)
      .collect().map(r => (r.getAs[Number](0).longValue(),
        r.getAs[Number](1).longValue(), r.getAs[Number](2).longValue()))
    assert(got.map(_._1).toSeq == nodes.toSeq, "vertex coverage, ordered")
    got.foreach { case (v, scc, size) =>
      assert(scc == expected(v), s"node $v scc_id")
      assert(size == sizes(expected(v)), s"node $v scc_size")
    }
    // the trade graph flows both ways somewhere: at least one SCC > 1
    assert(sizes.values.max > 1, "degenerate: all-singleton SCCs")
  }
}
