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
    * it at 100 TB: load the edge list into the store ONCE per
    * (session, corpus) — the base store + rebuilt view are memoized in
    * a [[graft.util.MatStore.scratchDir]] — then every invocation
    * publishes a keyed delta and refreshes the degree index from the
    * previous view + delta only (no base rescan — proven by spec), and
    * serves reads from the view.
    *
    * The delta retires every edge out of nation 0 plus the 1→0 key,
    * then adds a doubled 0→1 corridor and a 1→0 backflow, so the
    * served result exercises multiplicity (stacked keys) end-to-end.
    * Deleting 1→0 makes the delta IDEMPOTENT: on the first pass it is
    * a no-op only if the base lacks that edge, and on every later pass
    * it retires exactly the rows the previous invocation added, so
    * repeated invocations share one stored base instead of rebuilding
    * (and re-writing) the store each time; a vacuum per invocation
    * keeps on-disk state flat at two snapshots.
    */
  private def g21(s: SparkSession, dir: String): DataFrame = {
    val base = graft.util.MatStore.scratchDir(s, s"g21:$dir", "graft_g21") { p =>
      val store = new GraphStore(s, s"$p/store")
      store.add("trade", TradeGraph.edgesTable(s, dir).select(col("src"), col("dst")))
      new DegreeView(s, store, "trade", s"$p/view").rebuild()
    }
    val store = new GraphStore(s, s"$base/store")
    val view = new DegreeView(s, store, "trade", s"$base/view")
    // disk stays flat across invocations: the previous delta's
    // snapshots are dropped before publishing this one (keepLast=2
    // retains everything a concurrent lazy reader could still hold)
    store.vacuum("trade", 2)
    view.vacuum(2)
    val e = TradeGraph.edgesTable(s, dir).select(col("src"), col("dst"))
    val adds = s.createDataFrame(Seq((0, 1), (0, 1), (1, 0))).toDF("src", "dst")
    // deletions name BOTH added keys explicitly (not just base src=0
    // rows): that's what retires the previous invocation's additions,
    // and it subsumes to the same delta on the first pass whether or
    // not the base graph happens to contain those edges
    val dels = e.filter(col("src") === 0)
      .unionByName(s.createDataFrame(Seq((0, 1), (1, 0))).toDF("src", "dst"))
    view.applyDelta(adds, dels) // fresh view -> incremental refresh path
    view.read().orderBy(col("node"))
  }

  private val g21Sql = s"""
    WITH ${GraphSql.edgesCte},
    delta AS (
      SELECT src, dst FROM edges
      WHERE src <> 0 AND NOT (src = 1 AND dst = 0)
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
