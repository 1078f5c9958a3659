package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 operators: unbounded SSSP (g26). */
class R14OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("ssspConverged equals an in-test Dijkstra on a weighted digraph with cycles") {
    import spark.implicits._
    // deliberately cyclic + a long cheap detour that beats the direct
    // edge, so convergence needs several rounds and min-relaxation
    // over a cycle terminates
    val edges = Seq(
      (0L, 1L, 10L), (0L, 2L, 2L), (2L, 3L, 2L), (3L, 1L, 2L), // detour 0->2->3->1 cost 6
      (1L, 4L, 1L), (4L, 2L, 1L),                              // cycle 2->3->1->4->2
      (5L, 0L, 1L),                                            // unreachable-from-0 source side
      (3L, 3L, 5L))                                            // self-loop
    val got = graph.Traversals.ssspConverged(
        edges.toDF("src", "dst", "cost"), source = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // driver-side Dijkstra
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(e => (e._2, e._3)) }
    val dist = scala.collection.mutable.Map(0L -> 0L)
    val pq = scala.collection.mutable.PriorityQueue((0L, 0L))(Ordering.by(-_._2))
    val done = scala.collection.mutable.Set[Long]()
    while (pq.nonEmpty) {
      val (u, du) = pq.dequeue()
      if (!done(u) && dist(u) == du) {
        done += u
        adj.getOrElse(u, Seq()).foreach { case (v, c) =>
          if (du + c < dist.getOrElse(v, Long.MaxValue)) {
            dist(v) = du + c; pq.enqueue((v, du + c))
          }
        }
      }
    }
    assert(got == dist.toMap, s"got $got expected $dist")
    // the detour must have won (multi-round relaxation exercised)
    assert(got(1L) == 6L)
    assert(!got.contains(5L), "node 5 is unreachable from 0")
  }

  test("t14 duplicated spans equal an independent driver-side winnowing recount") {
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    // independent leg: winnowing re-implemented imperatively
    def fingerprints(text: String): Map[Long, Long] = {
      val toks = text.split(" ").filter(_.nonEmpty)
      val grams = if (toks.length >= 3)
        (0 to toks.length - 3).map(i => s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}")
        else Seq()
      val hs = grams.map(_.foldLeft(0L)((acc, c) => (acc * 131 + c.toInt) % 1000000007L))
      if (hs.length < 4) Map()
      else (0 to hs.length - 4).map(j => (hs.slice(j, j + 4).min, j + 1L))
        .groupBy(_._1).map { case (fp, ps) => fp -> ps.map(_._2).min }
    }
    val perDoc = docs.map { case (id, t) => id -> fingerprints(t) }
    val census = perDoc.flatMap(_._2.keys).groupBy(identity).map { case (fp, xs) => fp -> xs.length.toLong }
    val expected = (for {
      (id, fps) <- perDoc
      (fp, pos) <- fps
      n = census(fp) if n >= 2
    } yield (id, pos, pos + 5, n)).toSet
    val got = SparkEntry.queries("t14_dup_spans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected, s"sizes got=${got.size} expected=${expected.size}")
    assert(expected.nonEmpty, "corpus yields repeated spans — degenerate fixture otherwise")
  }

  test("g26 runs to fixpoint within the oracle's unroll budget at spec SFs") {
    val out = SparkEntry.queries("g26_sssp")(spark, dir)
    val rows = out.collect()
    assert(rows.length > 10, "hub should reach a nontrivial slice of the bipartite graph")
    // every cost positive except the hub itself; node ids well-formed
    assert(rows.count(_.getLong(1) == 0L) == 1, "exactly one zero-cost source")
    // the loop must actually exceed g08's 4-round cap on this graph —
    // otherwise g26 isn't exercising convergence at all
    assert(graph.Traversals.lastSsspRounds > 4,
      s"rounds ${graph.Traversals.lastSsspRounds} — graph too shallow for a convergence test")
    assert(graph.Traversals.lastSsspRounds <= 16,
      s"rounds ${graph.Traversals.lastSsspRounds} exceed the oracle's unroll budget — raise g26UnrollRounds")
  }
}
