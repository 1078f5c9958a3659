package graft.graph

import graft.Op

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph construction + degree statistics (reference ops 1-2 view the
  * stored adjacency matrix; these are the analytical equivalents over
  * the relational store).
  */
object GraphOps {

  /** g01: materialize the trade-graph edge list. */
  private def g01(s: SparkSession, dir: String): DataFrame =
    TradeGraph.edgesTable(s, dir).orderBy(col("src"), col("dst"))

  private val g01Sql = s"""
    WITH ${GraphSql.edgesCte}
    SELECT src, dst, weight, n_orders FROM edges ORDER BY src, dst"""

  /** g02: in/out degree + edge-weight totals per vertex. */
  private def g02(s: SparkSession, dir: String): DataFrame = {
    val e = TradeGraph.edgesTable(s, dir)
    val out = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_deg"), sum(col("weight")).as("out_weight"))
    val in = e.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("in_deg"), sum(col("weight")).as("in_weight"))
    TradeGraph.nodes(s, dir)
      .join(out, Seq("node"), "left")
      .join(in, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        (coalesce(col("out_deg"), lit(0L)) + coalesce(col("in_deg"), lit(0L))).as("total_deg"),
        coalesce(col("out_weight"), lit(0L)).as("out_weight"),
        coalesce(col("in_weight"), lit(0L)).as("in_weight"))
      .orderBy(col("node"))
  }

  private val g02Sql = s"""
    WITH ${GraphSql.edgesCte}, ${GraphSql.nodesCte},
    o AS (SELECT src AS node, count(*) AS out_deg, CAST(SUM(weight) AS BIGINT) AS out_weight
          FROM edges GROUP BY src),
    i AS (SELECT dst AS node, count(*) AS in_deg, CAST(SUM(weight) AS BIGINT) AS in_weight
          FROM edges GROUP BY dst)
    SELECT n.node,
      COALESCE(o.out_deg, 0) AS out_deg,
      COALESCE(i.in_deg, 0) AS in_deg,
      COALESCE(o.out_deg, 0) + COALESCE(i.in_deg, 0) AS total_deg,
      COALESCE(o.out_weight, 0) AS out_weight,
      COALESCE(i.in_weight, 0) AS in_weight
    FROM nodes n
    LEFT JOIN o ON o.node = n.node
    LEFT JOIN i ON i.node = n.node
    ORDER BY n.node"""

  val ops: Seq[Op] = Seq(
    Op("g01_build_edges", g01, Some(g01Sql)),
    Op("g02_degrees", g02, Some(g02Sql)))
}
