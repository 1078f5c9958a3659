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

  /** g17: two-hop trade flows — src → mid → dst with flow capacity =
    * least of the two edge weights, top-20; the multi-hop pattern
    * query a graph database answers about indirect relationships. One
    * self-join on the materialized edge list (tiny, broadcast).
    */
  private def g17(s: SparkSession, dir: String): DataFrame = {
    val e = TradeGraph.edgesTable(s, dir)
    val e1 = e.select(col("src"), col("dst").as("mid"), col("weight").as("w1"))
    val e2 = e.select(col("src").as("mid2"), col("dst"), col("weight").as("w2"))
    e1.join(e2, col("mid") === col("mid2"))
      .filter(col("src") =!= col("dst") && col("src") =!= col("mid") &&
        col("mid") =!= col("dst"))
      .select(col("src"), col("mid"), col("dst"),
        least(col("w1"), col("w2")).as("capacity"))
      .orderBy(col("capacity").desc, col("src"), col("mid"), col("dst"))
      .limit(20)
  }

  private val g17Sql = s"""
    WITH ${GraphSql.edgesCte}
    SELECT a.src, a.dst AS mid, b.dst,
      least(a.weight, b.weight) AS capacity
    FROM edges a JOIN edges b ON a.dst = b.src
    WHERE a.src <> b.dst AND a.src <> a.dst AND a.dst <> b.dst
    ORDER BY capacity DESC, a.src, mid, b.dst
    LIMIT 20"""

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

  /** g21: degrees SERVED through the incrementally-maintained
    * [[DegreeView]] over a [[GraphStore]] snapshot — the reference's
    * "modify graph" op (client.c:23-29) the way a graph database runs
    * it at 100 TB: load the edge list into the store once, publish a
    * keyed delta, refresh the degree index from the previous view +
    * delta only (no base rescan — proven by spec), and serve reads
    * from the view. The delta retires every edge out of nation 0 and
    * adds a doubled 0→1 corridor plus a 1→0 backflow, so the served
    * result exercises multiplicity (stacked keys) end-to-end.
    */
  private def g21(s: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_g21").toString
    // the returned frame lazily reads the view parquet, so the dirs
    // must outlive this call; reclaimed at JVM exit like MatStore's
    graft.util.MatStore.cleanupAtExit(base)
    val store = new GraphStore(s, s"$base/store")
    val view = new DegreeView(s, store, "trade", s"$base/view")
    val e = TradeGraph.edgesTable(s, dir).select(col("src"), col("dst"))
    store.add("trade", e)
    view.rebuild()
    val adds = s.createDataFrame(Seq((0, 1), (0, 1), (1, 0))).toDF("src", "dst")
    val dels = e.filter(col("src") === 0)
    view.applyDelta(adds, dels) // fresh view -> incremental refresh path
    view.read().orderBy(col("node"))
  }

  private val g21Sql = s"""
    WITH ${GraphSql.edgesCte},
    delta AS (
      SELECT src, dst FROM edges WHERE src <> 0
      UNION ALL SELECT * FROM (VALUES (0, 1), (0, 1), (1, 0)) AS t(src, dst)),
    o AS (SELECT src AS node, count(*) AS out_deg FROM delta GROUP BY 1),
    i AS (SELECT dst AS node, count(*) AS in_deg FROM delta GROUP BY 1)
    SELECT COALESCE(o.node, i.node) AS node,
      COALESCE(o.out_deg, 0) AS out_deg,
      COALESCE(i.in_deg, 0) AS in_deg,
      COALESCE(o.out_deg, 0) + COALESCE(i.in_deg, 0) AS deg
    FROM o FULL OUTER JOIN i ON o.node = i.node
    ORDER BY node"""

  val ops: Seq[Op] = Seq(
    Op("g01_build_edges", g01, Some(g01Sql)),
    Op("g02_degrees", g02, Some(g02Sql)),
    Op("g17_two_hop_flows", g17, Some(g17Sql)),
    Op("g21_stored_degrees", g21, Some(g21Sql)))
}
