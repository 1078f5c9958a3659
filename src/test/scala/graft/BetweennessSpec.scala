package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** g29's pivot-sampled fixed-point Brandes must match an independent
  * driver-side recount BIT-EXACTLY (graph rebuilt from the raw tables,
  * pivots re-derived from md5, BFS/accumulation re-run imperatively),
  * and the ESTIMATE must measure the real thing: its ranking has to
  * agree with exact real-valued all-sources Brandes (the witness that
  * the K-pivot, hop-bounded, quantized estimator still ranks brokers
  * correctly — the g27-modularity-witness idea applied to centrality).
  */
class BetweennessSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  /** Symmetric unweighted adjacency of the preferred-partner bipartite
    * graph, rebuilt from the raw tables (the G27LpaSpec recipe).
    */
  private lazy val adjacency: Map[Long, Seq[Long]] = {
    val facts = Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").cast("long").as("cust"),
        col("l_suppkey").cast("long").as("supp"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val w = facts.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val topSupp = w.toSeq.groupBy(_._1._1).toSeq.flatMap { case (_, es) =>
      es.sortBy { case ((_, s), wt) => (-wt, s) }.take(2).map(_._1)
    }.toSet
    val topCust = w.toSeq.groupBy(_._1._2).toSeq.flatMap { case (_, es) =>
      es.sortBy { case ((c, _), wt) => (-wt, c) }.take(2).map(_._1)
    }.toSet
    (topSupp ++ topCust).toSeq
      .flatMap { case (c, s) => Seq((c * 2, s * 2 + 1), (s * 2 + 1, c * 2)) }
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).distinct }
  }

  /** The operator's pivot rule re-derived: first 8 hex chars of
    * md5("bw" ‖ node) as a long, bottom-K by (hash, node).
    */
  private def pivots(nodes: Seq[Long], k: Int): Seq[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    nodes.map { n =>
      val hex = md.digest(s"bw$n".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      (java.lang.Long.parseLong(hex, 16), n)
    }.sortBy(identity).take(k).map(_._2)
  }

  /** One pivot's hop-bounded BFS + fixed-point Brandes accumulation —
    * the reference leg, plain collections. Returns δ_fp per node
    * (level ≥ 1 only, matching the operator's exclusion of the
    * source's own row).
    */
  private def deltaFp(adj: Map[Long, Seq[Long]], src: Long, hops: Int)
      : Map[Long, Long] = {
    val dist = scala.collection.mutable.Map(src -> 0)
    val sigma = scala.collection.mutable.Map(src -> 1L)
    var frontier = Seq(src)
    var d = 0
    val levels = scala.collection.mutable.ArrayBuffer(Seq(src))
    while (d < hops && frontier.nonEmpty) {
      d += 1
      val nxt = scala.collection.mutable.Map[Long, Long]()
      frontier.foreach { u =>
        adj.getOrElse(u, Nil).foreach { v =>
          if (!dist.contains(v) || dist(v) == d)
            nxt(v) = nxt.getOrElse(v, 0L) + sigma(u)
        }
      }
      val fresh = nxt.keys.filter(!dist.contains(_)).toSeq
      fresh.foreach { v => dist(v) = d; sigma(v) = nxt(v) }
      frontier = fresh
      levels += fresh
    }
    val delta = scala.collection.mutable.Map[Long, Long]()
    for (lv <- levels.indices.reverse; u <- levels(lv)) {
      var acc = 0L
      adj.getOrElse(u, Nil).foreach { v =>
        if (dist.get(v).contains(lv + 1))
          acc += sigma(u) * (1000000000L + delta.getOrElse(v, 0L)) / sigma(v)
      }
      delta(u) = acc
    }
    levels.drop(1).flatten.map(v => v -> delta(v)).toMap
  }

  test("g29 equals the imperative pivot-Brandes recount bit-exactly") {
    val adj = adjacency
    val nodes = adj.keys.toSeq.sorted
    val piv = pivots(nodes, 16)
    val expected = piv.map(deltaFp(adj, _, 8))
      .foldLeft(Map.empty[Long, Long]) { (m, one) =>
        one.foldLeft(m) { case (acc, (v, d)) =>
          acc.updated(v, acc.getOrElse(v, 0L) + d)
        }
      }
    val got = SparkEntry.queries("g29_betweenness")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.keySet == nodes.toSet, "node set diverges")
    nodes.foreach { v =>
      assert(got(v) == expected.getOrElse(v, 0L),
        s"bc_fp($v): spark=${got(v)} recount=${expected.getOrElse(v, 0L)}")
    }
    assert(got.values.count(_ > 0L) > nodes.size / 4,
      "degenerate: almost no node carries betweenness mass")
  }

  /** Exact real-valued Brandes: all sources, unbounded depth, double
    * dependency accumulation — the ground truth the estimator is
    * judged against.
    */
  private def exactBc(adj: Map[Long, Seq[Long]]): Map[Long, Double] = {
    val nodes = adj.keys.toSeq.sorted
    val bc = scala.collection.mutable.Map[Long, Double]()
      .withDefaultValue(0.0)
    nodes.foreach { s =>
      val dist = scala.collection.mutable.Map(s -> 0)
      val sigma = scala.collection.mutable.Map(s -> 1.0)
      var frontier = Seq(s)
      var d = 0
      val levels = scala.collection.mutable.ArrayBuffer(Seq(s))
      while (frontier.nonEmpty) {
        d += 1
        val nxt = scala.collection.mutable.Map[Long, Double]()
        frontier.foreach { u =>
          adj.getOrElse(u, Nil).foreach { v =>
            if (!dist.contains(v) || dist(v) == d)
              nxt(v) = nxt.getOrElse(v, 0.0) + sigma(u)
          }
        }
        val fresh = nxt.keys.filter(!dist.contains(_)).toSeq
        fresh.foreach { v => dist(v) = d; sigma(v) = nxt(v) }
        frontier = fresh
        levels += fresh
      }
      val delta = scala.collection.mutable.Map[Long, Double]()
        .withDefaultValue(0.0)
      for (lv <- levels.indices.reverse; u <- levels(lv)) {
        adj.getOrElse(u, Nil).foreach { v =>
          if (dist.get(v).contains(lv + 1))
            delta(u) += sigma(u) / sigma(v) * (1.0 + delta(v))
        }
        if (u != s) bc(u) += delta(u)
      }
    }
    bc.toMap.withDefaultValue(0.0)
  }

  test("g29's estimate ranks brokers like exact all-sources Brandes " +
      "(top-20 overlap >= 12/20)") {
    val adj = adjacency
    val exact = exactBc(adj)
    val est = SparkEntry.queries("g29_betweenness")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    def top20(m: Map[Long, Double]) =
      m.toSeq.sortBy { case (n, v) => (-v, n) }.take(20).map(_._1).toSet
    val overlap = (top20(exact) intersect top20(est)).size
    assert(overlap >= 12, s"top-20 broker overlap only $overlap/20")
  }
}
