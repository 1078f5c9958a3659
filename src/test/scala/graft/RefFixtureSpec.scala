package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Conformance against the reference's OWN shipped fixture graphs:
  * the G1/G4/G12-G16 adjacency matrices (reference G*.txt, first line
  * N then the 0/1 rows — copied verbatim below) are parsed through
  * [[sources.GraphTextIO]] and driven through the g03/g22 BFS and
  * g04/g23 DFS-terminal machinery, pinned to hand-derived expected
  * outputs.
  *
  * Semantics pinned:
  * - BFS (secondary_server.c:503-537): level-order from node 0. The
  *   reference's WITHIN-level order is thread-schedule-dependent, so
  *   the deterministic content is the level PARTITION — exactly the
  *   (node, dist) set [[graph.Traversals.bfsLevels]] produces.
  * - DFS terminal nodes (secondary_server.c:166-180): re-expressed per
  *   SURVEY §6 as reachable sinks on the DAG (src < dst) view — g04's
  *   composition, replicated here on the fixture edges.
  */
class RefFixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // reference fixtures, verbatim (G12 ships without a trailing newline)
  private val fixtures: Map[String, String] = Map(
    "G1" -> "5\n0 1 0 0 0 \n1 0 1 0 0 \n0 1 0 1 1 \n0 0 1 0 0 \n0 0 1 0 0 \n",
    "G4" -> "1\n0 \n",
    "G12" -> "5\n0 1 1 1 1 \n1 0 0 0 0 \n1 0 0 0 0 \n1 0 0 0 0 \n1 0 0 0 0",
    "G13" -> ("7\n0 1 0 0 0 0 0 \n1 0 1 1 0 0 0 \n0 1 0 0 1 0 1 \n" +
      "0 1 0 0 0 0 0 \n0 0 1 0 0 1 0 \n0 0 0 0 1 0 0 \n0 0 1 0 0 0 0 \n"),
    "G14" -> "3\n0 0 0 \n0 0 0 \n0 0 0 \n",
    "G15" -> "1\n0 \n",
    "G16" -> ("6\n0 1 0 0 0 0 \n1 0 1 0 0 0 \n0 1 0 1 0 0 \n" +
      "0 0 1 0 1 0 \n0 0 0 1 0 1 \n0 0 0 0 1 0"))

  // hand-derived: BFS levels from node 0 (min hop distance)
  private val expectedBfs: Map[String, Set[(Int, Int)]] = Map(
    "G1" -> Set(0 -> 0, 1 -> 1, 2 -> 2, 3 -> 3, 4 -> 3),
    "G4" -> Set(0 -> 0),
    "G12" -> Set(0 -> 0, 1 -> 1, 2 -> 1, 3 -> 1, 4 -> 1),
    "G13" -> Set(0 -> 0, 1 -> 1, 2 -> 2, 3 -> 2, 4 -> 3, 6 -> 3, 5 -> 4),
    "G14" -> Set(0 -> 0),
    "G15" -> Set(0 -> 0),
    "G16" -> Set(0 -> 0, 1 -> 1, 2 -> 2, 3 -> 3, 4 -> 4, 5 -> 5))

  // hand-derived: reachable sinks from node 0 on the src < dst DAG view
  private val expectedSinks: Map[String, Set[Int]] = Map(
    "G1" -> Set(3, 4),
    "G4" -> Set(0),
    "G12" -> Set(1, 2, 3, 4),
    "G13" -> Set(3, 5, 6),
    "G14" -> Set(0),
    "G15" -> Set(0),
    "G16" -> Set(5))

  private lazy val fixtureDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ref_fixtures")
    fixtures.foreach { case (name, text) =>
      java.nio.file.Files.write(dir.resolve(s"$name.txt"),
        text.getBytes("UTF-8"))
    }
    dir.toFile.deleteOnExit()
    dir.toString
  }

  private lazy val allEdges = sources.GraphTextIO.read(spark, fixtureDir)
    .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))

  test("GraphTextIO parses every shipped fixture into its exact edge set") {
    val got = allEdges.groupBy(_._1).view
      .mapValues(_.map(e => (e._2, e._3)).toSet).toMap
    val expected = fixtures.map { case (name, text) =>
      val lines = text.split("\n")
      val n = lines(0).trim.toInt
      val edges = for {
        i <- 0 until n
        (bit, j) <- lines(i + 1).trim.split(" ").zipWithIndex if bit == "1"
      } yield (i, j)
      name -> edges.toSet
    }
    // empty graphs parse to zero edges, hence are absent from the read
    expected.foreach { case (name, es) =>
      if (es.isEmpty) assert(!got.contains(name), s"$name: phantom edges")
      else assert(got(name) == es, s"$name edge set")
    }
    // symmetric matrices — the undirected contract every traversal assumes
    got.foreach { case (name, es) =>
      assert(es.map(_.swap) == es, s"$name matrix not symmetric")
    }
  }

  fixtures.keys.toSeq.sorted.foreach { name =>
    test(s"$name: BFS levels and DFS-terminal sinks match hand-derived truth") {
      import spark.implicits._
      val edges = allEdges.collect { case (`name`, s, d) => (s, d) }
        .toSeq.toDF("src", "dst")
      val bfs = graph.Traversals.bfsLevels(edges, source = 0, maxHops = 30)
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      assert(bfs == expectedBfs(name), s"$name BFS levels")
      // g04's composition on the fixture: reachable sinks on the DAG view
      val dag = graph.TradeGraph.dagEdges(edges).localCheckpoint()
      val reach = graph.Traversals.reachableFrom(dag, source = 0)
      val sinks = reach.join(dag.select(col("src")).distinct(),
          reach("node") === col("src"), "left_anti")
        .collect().map(_.getInt(0)).toSet
      assert(sinks == expectedSinks(name), s"$name DFS-terminal sinks")
    }
  }
}
