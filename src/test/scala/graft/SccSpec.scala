package graft

import graft.graph.Scc
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Scc.fwbw]] must produce EXACTLY g24's deterministic labels
  * (scc_id = min node of the SCC) on any directed graph — the
  * scale-path/exact-envelope equality contract every other envelope
  * pair in the repo carries (g18 vs g07, g20 vs g14, d12 vs d05).
  * The independent leg is a boolean-matrix transitive closure on the
  * driver — a different algorithm shape entirely.
  */
class SccSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def closureLabels(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.length
    val reach = Array.fill(n, n)(false)
    edges.foreach { case (s, d) => reach(idx(s))(idx(d)) = true }
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (reach(i)(k) && reach(k)(j)) reach(i)(j) = true
    nodes.zipWithIndex.map { case (v, i) =>
      val mutual = nodes.zipWithIndex.collect {
        case (u, j) if reach(i)(j) && reach(j)(i) => u
      }
      v -> (mutual :+ v).min
    }.toMap
  }

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val got = Scc.fwbw(nodes.toDF("node"), edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.map(_._1).sorted.toSeq == nodes.sorted, "every node labeled exactly once")
    got.toMap
  }

  test("fwbw equals the matrix-closure labels on seeded random digraphs") {
    for ((seed, p) <- Seq((1, 0.03), (2, 0.08), (3, 0.15))) {
      val rnd = new scala.util.Random(seed)
      val nodes = (0L until 40L).toSeq
      val edges = for {
        i <- nodes; j <- nodes
        if i != j && rnd.nextDouble() < p
      } yield (i, j)
      val expected = closureLabels(nodes, edges)
      val got = run(nodes, edges)
      assert(got == expected, s"seed $seed p $p")
      // at p=0.15 a 40-node digraph is almost surely one giant SCC +
      // stragglers; at p=0.03 mostly singletons — both regimes covered
      if (p >= 0.15) assert(got.values.groupBy(identity).values.map(_.size).max > 10,
        "dense graph produced no giant SCC — the interesting regime went untested")
    }
  }

  test("fwbw on adversarial shapes: path (worst-case rounds), cycle, bridged cycles, isolates, self-loops") {
    // path a0 -> a1 -> ... -> a7: all singleton SCCs, FW-BW's O(n)-round
    // worst case — correctness must survive the degenerate splits
    val path = (0L until 7L).map(i => (i, i + 1))
    assert(run(0L to 7L, path) == (0L to 7L).map(v => v -> v).toMap)

    // directed cycle: one SCC labeled by its min node
    val cyc = (0L until 8L).map(i => (i, (i + 1) % 8))
    assert(run(0L to 8L, cyc) == ((0L to 7L).map(_ -> 0L) :+ (8L -> 8L)).toMap)

    // two 3-cycles joined by a ONE-WAY bridge stay separate SCCs;
    // node ids deliberately interleaved so pivot != component order
    val twoCycles = Seq((0L, 4L), (4L, 2L), (2L, 0L), // scc {0,2,4} -> 0
      (1L, 5L), (5L, 3L), (3L, 1L), // scc {1,3,5} -> 1
      (0L, 1L)) // bridge, one-way
    assert(run(0L to 5L, twoCycles) ==
      Map(0L -> 0L, 2L -> 0L, 4L -> 0L, 1L -> 1L, 3L -> 1L, 5L -> 1L))

    // self-loops and isolated nodes label themselves
    val loops = Seq((2L, 2L), (3L, 4L))
    assert(run(0L to 4L, loops) == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))

    // nested chain contraction: x's chain endpoint (2) is itself
    // contracted in a LATER peel pass (as is 1, into a lollipop onto
    // the {0,1} 2-cycle), so chain resolution must iterate. Verified
    // against the matrix closure like the shapes above.
    val nested = Seq((0L, 1L), (1L, 0L), (1L, 8L), (0L, 2L), (2L, 3L),
      (2L, 5L), (3L, 4L), (6L, 4L), (4L, 7L))
    assert(run(0L to 8L, nested) == closureLabels(0L to 8L, nested))
  }

  test("chain contraction caps path/cycle/caterpillar worst cases at O(log n) rounds") {
    // a bare 10k path is trim's O(n)-pass and pivot-FW-BW's O(n)-round
    // worst case; chain contraction must collapse it in ~2 peel passes
    // + O(log n) pointer-doubling rounds, with NO pivot BFS at all
    val n = 10000L
    val path = (0L until n - 1).map(i => (i, i + 1))
    assert(run(0L until n, path) == (0L until n).map(v => v -> v).toMap)
    assert(Scc.lastPeelPasses <= 4, s"path peel passes ${Scc.lastPeelPasses}")
    assert(Scc.lastDoublingRounds <= 20, s"path doubling rounds ${Scc.lastDoublingRounds}")
    assert(Scc.lastPivotRounds == 0, s"path pivot rounds ${Scc.lastPivotRounds}")

    // a 10k directed cycle is one SCC whose pivot BFS would walk 10k
    // hops; pure-cycle detection labels it during the doubling instead
    val cyc = (0L until n).map(i => (i, (i + 1) % n))
    assert(run(0L until n, cyc) == (0L until n).map(v => v -> 0L).toMap)
    assert(Scc.lastPeelPasses <= 4, s"cycle peel passes ${Scc.lastPeelPasses}")
    assert(Scc.lastDoublingRounds <= 20, s"cycle doubling rounds ${Scc.lastDoublingRounds}")
    assert(Scc.lastPivotRounds == 0, s"cycle pivot rounds ${Scc.lastPivotRounds}")

    // caterpillar: pendant leaves keep the spine non-chain until trim
    // peels them — contraction must fire MID-LOOP on the exposed spine
    val spine = 1000L
    val cat = (0L until spine - 1).map(i => (i, i + 1)) ++
      (0L until spine).map(i => (i, spine + i))
    assert(run(0L until 2 * spine, cat) ==
      (0L until 2 * spine).map(v => v -> v).toMap)
    assert(Scc.lastPeelPasses <= 5, s"caterpillar peel passes ${Scc.lastPeelPasses}")
    assert(Scc.lastPivotRounds == 0, s"caterpillar pivot rounds ${Scc.lastPivotRounds}")
  }

  test("g25 (registered fwbw) equals g24 (registered closure census) on the nation spine") {
    val dir = "/root/testdata/sf0.001"
    def rows(name: String) = SparkEntry.queries(name)(spark, dir).collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getAs[Number](1).longValue(),
        r.getAs[Number](2).longValue())).toSeq
    assert(rows("g25_scc_fwbw") == rows("g24_scc"))
  }
}
