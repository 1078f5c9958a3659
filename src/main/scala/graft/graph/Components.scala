package graft.graph

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components via hash-min label propagation: every node
  * starts labeled with its own id and repeatedly takes the min label
  * among itself and its neighbors until fixpoint. Each round is one
  * shuffle join + one aggregation, both map-side-combining; rounds are
  * bounded by the component diameter, and `localCheckpoint` keeps the
  * plan flat. This is the standard scalable CC for Spark — no driver
  * state, no per-node threads (contrast secondary_server.c's
  * thread-per-vertex traversal).
  */
object Components {

  /** (node, comp) with comp = min node id in the component.
    *
    * Convergence check: labels only ever decrease, so the global label
    * sum strictly decreases until fixpoint — comparing one scalar
    * aggregate per round replaces a join against the previous labels
    * (one cheap job instead of a shuffle per iteration).
    */
  def labelPropagate(nodes: DataFrame, symEdges: DataFrame, maxIters: Int = 50): DataFrame = {
    val e = symEdges.select(col("src"), col("dst")).localCheckpoint()
    var labels = nodes.select(col("node"), col("node").as("comp")).localCheckpoint()
    var labelSum = Long.MaxValue
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      it += 1
      val msgs = labels.join(e, labels("node") === e("src"))
        .select(e("dst").as("node"), col("comp"))
      val next = labels.select(col("node"), col("comp")).unionAll(msgs)
        .groupBy(col("node")).agg(min(col("comp")).as("comp"))
        .localCheckpoint()
      val nextSum = next.agg(sum(col("comp").cast("long"))).collect()(0).getLong(0)
      converged = nextSum == labelSum
      labelSum = nextSum
      labels = next
    }
    labels
  }

  /** Connected components of the undirected trade graph. */
  private def g05(s: SparkSession, dir: String): DataFrame = {
    val edges = TradeGraph.edgesTable(s, dir)
    labelPropagate(TradeGraph.nodes(s, dir), TradeGraph.symEdges(edges))
      .orderBy(col("node"))
  }

  private val g05Sql = s"""
    WITH RECURSIVE ${GraphSql.edgesCte}, ${GraphSql.nodesCte}, ${GraphSql.symCte},
    r(a, b) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT r.a, e.dst FROM r JOIN sym e ON e.src = r.b)
    SELECT a AS node, CAST(MIN(b) AS INTEGER) AS comp
    FROM r GROUP BY a ORDER BY node"""

  /** Customer–supplier bipartite components — the scale path: this
    * graph grows with SF (millions of edges at 100 TB) while the
    * nation graph stays 25 nodes. Node ids are disambiguated by side
    * (customer = 2k, supplier = 2k+1). Non-SQL-expressible at scale
    * (closure would be quadratic), so the driver records a rows-only
    * check; the spec asserts bipartite invariants instead.
    */
  private def g11(s: SparkSession, dir: String): DataFrame = {
    val l = Tables(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val o = Tables(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val pairs = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val nodes = pairs.select(col("src").as("node"))
      .unionAll(pairs.select(col("dst").as("node"))).distinct()
    val sym = pairs.unionAll(pairs.select(col("dst").as("src"), col("src").as("dst")))
    val labels = labelPropagate(nodes, sym)
    labels.groupBy(col("comp"))
      .agg(count(lit(1)).as("n_nodes"),
        count(when(col("node") % 2 === 0, lit(1))).as("n_customers"),
        count(when(col("node") % 2 === 1, lit(1))).as("n_suppliers"))
      .orderBy(col("comp"))
  }

  /** k-core: iteratively peel nodes of degree < k until fixpoint. The
    * third iterative pattern in the engine (frontier expansion, label
    * propagation, and now peeling); each round is one degree count +
    * two semi-joins, and the edge count strictly decreases so the
    * convergence check is a cheap count comparison.
    */
  def kCore(symEdges: DataFrame, k: Int): DataFrame = {
    var e = symEdges.select(col("src"), col("dst")).localCheckpoint()
    var nEdges = e.count()
    var changed = true
    while (changed) {
      val keep = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("node"))
        .localCheckpoint()
      val ne = e.join(keep, e("src") === keep("node"), "left_semi")
        .join(keep, e("dst") === keep("node"), "left_semi")
        .localCheckpoint()
      val n = ne.count()
      changed = n != nEdges
      nEdges = n
      e = ne
    }
    e.select(col("src").as("node")).distinct()
  }

  /** 2-core of the customer–supplier bipartite graph: strip customers
    * with a single supplier and suppliers with a single customer,
    * repeatedly — the "structurally redundant trade" core. Float-free
    * but iteration-count-dependent, so rows-checked.
    */
  private def g12(s: SparkSession, dir: String): DataFrame = {
    val l = Tables(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val o = Tables(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val pairs = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val sym = pairs.unionAll(pairs.select(col("dst").as("src"), col("src").as("dst")))
    val core = kCore(sym, k = 2)
    core.agg(count(lit(1)).as("n_core_nodes"),
      count(when(col("node") % 2 === 0, lit(1))).as("n_core_customers"),
      count(when(col("node") % 2 === 1, lit(1))).as("n_core_suppliers"))
  }

  val ops: Seq[Op] = Seq(
    Op("g05_connected_components", g05, Some(g05Sql)),
    Op("g11_bipartite_cc", g11, None),
    Op("g12_kcore_bipartite", g12, None))
}
