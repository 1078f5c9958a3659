package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** g27's weighted synchronous LPA must match an independent
  * driver-side recount (graph rebuilt from the raw tables, 4
  * synchronous rounds, max-weight/min-label rule) and must find REAL
  * community structure — many communities, none swallowing the graph.
  */
class G27LpaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  private def recount(): Map[Long, Long] = {
    // (cust, supp) -> w from the raw tables
    val facts = Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").cast("long").as("cust"),
        col("l_suppkey").cast("long").as("supp"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val w = facts.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    // top-2 partners each way, ties to smaller id
    // (.toSeq first: flatMap over a Map of pair-elements would rebuild
    // a Map and collapse each key to ONE partner)
    val byCust = w.toSeq.groupBy(_._1._1).toSeq
    val topSupp = byCust.flatMap { case (_, es) =>
      es.sortBy { case ((_, s), wt) => (-wt, s) }.take(2).map(_._1)
    }.toSet
    val bySupp = w.toSeq.groupBy(_._1._2).toSeq
    val topCust = bySupp.flatMap { case (_, es) =>
      es.sortBy { case ((c, _), wt) => (-wt, c) }.take(2).map(_._1)
    }.toSet
    val sel = (topSupp ++ topCust).toSeq
    // bipartite numbering + symmetric weighted adjacency
    val adj = scala.collection.mutable.Map[Long, List[(Long, Long)]]()
      .withDefaultValue(Nil)
    for ((c, s) <- sel) {
      val (u, v, wt) = (c * 2, s * 2 + 1, w((c, s)))
      adj(u) = (v, wt) :: adj(u)
      adj(v) = (u, wt) :: adj(v)
    }
    val nodes = adj.keys.toSeq.sorted
    var lbl = nodes.map(n => n -> n).toMap
    for (_ <- 1 to graph.Components.LpaRounds) {
      val prev = lbl
      lbl = nodes.map { n =>
        val tally = adj(n).groupBy { case (u, _) => prev(u) }
          .map { case (l, es) => l -> es.map(_._2).sum }
        n -> tally.toSeq.minBy { case (l, sw) => (-sw, l) }._1
      }.toMap
    }
    lbl
  }

  test("g27 equals a driver-side synchronous-LPA recount") {
    val exp = recount()
    val got = SparkEntry.queries("g27_lpa_communities")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == exp.keySet)
    val diffs = exp.keys.filter(n => got(n) != exp(n)).take(5).toSeq
    assert(diffs.isEmpty, s"label mismatch at nodes $diffs")
    // structure: real communities, not a collapse and not all-singletons
    val sizes = got.values.groupBy(identity).map(_._2.size)
    assert(sizes.size > 10, s"only ${sizes.size} communities")
    assert(sizes.max < got.size / 2,
      s"one community swallowed ${sizes.max} of ${got.size} nodes")
    assert(sizes.max > 2, "no community grew past a pair")
  }
}
