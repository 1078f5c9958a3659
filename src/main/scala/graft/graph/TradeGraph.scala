package graft.graph

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The canonical graph the engine analyzes: nation-level trade flow.
  *
  * The reference stores graphs as adjacency matrices over ≤30 nodes
  * (client.c:23-29, G*.txt); we re-express "a graph" as vertex/edge
  * DataFrames derived from the relational store. Vertices = the 25
  * nations; a directed edge (src → dst) means customers of nation
  * `src` bought from suppliers of nation `dst`, weighted by lineitem
  * count and distinct orders.
  *
  * Scale: the edge build is the classic fact-to-fact shuffle join
  * (lineitem ⋈ orders on orderkey) with broadcast dimensions —
  * exactly the plan that survives a 100 TB lineitem. The aggregated
  * edge list is tiny (≤ V²) so every downstream iterative algorithm
  * runs on a cached, broadcast-friendly DataFrame.
  */
object TradeGraph {

  /** The shared fact spine: lineitem ⋈ orders pre-joined ONCE per
    * (session, corpus). The fact-fact join — the single most expensive
    * exchange in the graph builds — happens in this build only;
    * [[edges]] and [[Components.bipartitePairs]] both consume the
    * spine, so their plans carry no orderkey join at all (asserted in
    * BucketingSpec). At 100 TB this is the standard materialized
    * denormalization: pay the fact-fact shuffle once, serve every
    * downstream graph/pair build from it.
    *
    * The SPINE stays PLAIN parquet, measured choice at sf0.1/local[32]
    * (its consumers aggregate rather than re-join on orderkey, so
    * bucketing the spine itself pays nothing — plain 9.3 s vs
    * bucketed 10.3 s for [edges+bipairs]). The spine's INPUTS are the
    * other story (r9): lineitem and orders come from the
    * session-bucketed fact layout (`Tables.bucketed`), so the
    * fact-fact join here carries zero exchanges and the one bucketing
    * shuffle is shared with every other orderkey consumer (q03/q05).
    */
  def orderFacts(s: SparkSession, dir: String): DataFrame =
    graft.util.MatStore.table(s, s"ofacts:$dir", "graft_ofacts") {
      // both facts come from the session-bucketed layout (r9): the
      // orderkey join below plans with ZERO exchanges — the bucketing
      // pass is the one shuffle, shared with q03/q05 and any other
      // orderkey consumer (BucketingSpec asserts the plan shape)
      val l = Tables.bucketed(s, dir, "lineitem", "l_orderkey")
        .select(col("l_orderkey").as("orderkey"), col("l_suppkey").as("suppkey"))
      val o = Tables.bucketed(s, dir, "orders", "o_orderkey")
        .select(col("o_orderkey"), col("o_custkey").as("custkey"))
      l.join(o, col("orderkey") === col("o_orderkey"))
        .select(col("orderkey"), col("custkey"), col("suppkey"))
    }

  /** Directed weighted edges (src, dst, weight, n_orders). */
  def edges(s: SparkSession, dir: String): DataFrame = {
    val f = orderFacts(s, dir)
    val c = Tables(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val sup = Tables(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    f.join(c, col("custkey") === col("c_custkey"))
      .join(broadcast(sup), col("suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").cast("int").as("src"),
        col("s_nationkey").cast("int").as("dst"))
      .agg(count(lit(1)).as("weight"), countDistinct(col("orderkey")).as("n_orders"))
  }

  /** The materialized trade-graph edge list for a corpus dir.
    *
    * A graph database holds its graph, it doesn't re-derive it per
    * query: the first operator touching a corpus distills the edge
    * list once per (session, dir) into parquet (same lifecycle story
    * as GraphStore snapshots: immutable, cleanup-proof, shared by
    * every traversal/component/rank query that follows).
    */
  def edgesTable(s: SparkSession, dir: String): DataFrame =
    graft.util.MatStore.table(s, s"edges:$dir", "graft_edges")(edges(s, dir))

  /** All vertices (isolated ones included). */
  def nodes(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "nation").select(col("n_nationkey").cast("int").as("node"))

  /** Undirected view: both directions of every edge, self-loops dropped. */
  def symEdges(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()

  /** DAG view (src < dst): the deterministic re-expression of the
    * reference's DFS traversal domain (SURVEY.md §6).
    */
  def dagEdges(edges: DataFrame): DataFrame =
    edges.filter(col("src") < col("dst"))
}

/** Shared oracle-SQL fragments mirroring [[TradeGraph]] in DuckDB.
  *
  * All fact-derived CTEs are `AS MATERIALIZED`: a plain CTE is
  * re-evaluated at every reference, and a reference INSIDE a
  * recursive CTE re-runs it per iteration — at sf1 that turned g04's
  * 25-node closure into ~25 re-builds of the 6M-row fact join and a
  * >100 GB spill (same lesson the d06 dup-graph oracle learned with
  * its `dups`/`sym` CTEs). The edge list itself is ≤ V² rows;
  * materializing it is what the Spark side does too (MatStore).
  */
object GraphSql {
  val edgesCte: String = """
    edges AS MATERIALIZED (
      SELECT CAST(c_nationkey AS INTEGER) AS src, CAST(s_nationkey AS INTEGER) AS dst,
        count(*) AS weight, count(DISTINCT o_orderkey) AS n_orders
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY 1, 2)"""

  val nodesCte: String =
    "nodes AS (SELECT CAST(n_nationkey AS INTEGER) AS node FROM nation)"

  val symCte: String = """
    sym AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges)
      WHERE src <> dst)"""

  val dagCte: String =
    "dag AS MATERIALIZED (SELECT src, dst, weight FROM edges WHERE src < dst)"

  /** Preferred-partner CTEs (w + sel) — the SQL mirror of
    * `Traversals.custSuppW` / `Traversals.preferredPartners`, shared
    * by the g26 and g27 oracles.
    */
  val prefCtes: String = """
    w AS MATERIALIZED (
      SELECT CAST(o_custkey AS BIGINT) AS cust, CAST(l_suppkey AS BIGINT) AS supp,
        count(*) AS w
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2),
    sel AS MATERIALIZED (
      SELECT DISTINCT cust, supp, w FROM (
        SELECT cust, supp, w FROM (
          SELECT cust, supp, w,
            row_number() OVER (PARTITION BY cust ORDER BY w DESC, supp) AS rn FROM w)
        WHERE rn <= 2
        UNION ALL
        SELECT cust, supp, w FROM (
          SELECT cust, supp, w,
            row_number() OVER (PARTITION BY supp ORDER BY w DESC, cust) AS rn FROM w)
        WHERE rn <= 2))"""
}
