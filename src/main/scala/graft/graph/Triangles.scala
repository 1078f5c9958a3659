package graft.graph

import graft.Op
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Triangle counting on the undirected trade graph.
  *
  * Uses the ordered-edge (a<b) representation so each triangle is
  * enumerated exactly once as a<b<c — the standard shuffle-efficient
  * formulation: two self-joins on an edge list that is already
  * deduplicated and ordered, no candidate explosion from symmetric
  * edges. Per-node counts come from exploding each triangle's three
  * corners; the global count is their sum / 3.
  */
object Triangles {

  /** Ordered undirected edge list (a < b). */
  def orderedEdges(edges: DataFrame): DataFrame =
    TradeGraph.symEdges(edges)
      .filter(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b"))

  private def g06(s: SparkSession, dir: String): DataFrame = {
    val e = orderedEdges(TradeGraph.edgesTable(s, dir)).localCheckpoint()
    val e1 = e.as("e1"); val e2 = e.as("e2"); val e3 = e.as("e3")
    val tris = e1.join(e2, col("e1.b") === col("e2.a"))
      .join(e3, col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val corners = tris.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
    TradeGraph.nodes(s, dir)
      .join(corners.groupBy(col("node")).agg(count(lit(1)).as("n_tri")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .orderBy(col("node"))
  }

  private val g06Sql = s"""
    WITH ${GraphSql.edgesCte}, ${GraphSql.nodesCte}, ${GraphSql.symCte},
    und AS (SELECT src AS a, dst AS b FROM sym WHERE src < dst),
    tris AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM und e1
      JOIN und e2 ON e1.b = e2.a
      JOIN und e3 ON e1.a = e3.a AND e2.b = e3.b),
    corners AS (
      SELECT x AS node FROM tris
      UNION ALL SELECT y FROM tris
      UNION ALL SELECT z FROM tris)
    SELECT n.node, count(c.node) AS n_tri
    FROM nodes n LEFT JOIN corners c ON c.node = n.node
    GROUP BY n.node ORDER BY n.node"""

  val ops: Seq[Op] = Seq(Op("g06_triangles", g06, Some(g06Sql)))
}
