package graft.graph

import graft.Op
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frontier-join traversals: the Spark re-expression of the
  * reference's BFS (secondary_server.c:503-537, level order) and DFS
  * terminal-node query (secondary_server.c:166-180), plus
  * transitive closure and bounded weighted shortest path.
  *
  * Pattern (Pregel-style): keep a `visited` set and a `frontier`
  * DataFrame; each hop is one shuffle join frontier ⋈ edges followed
  * by an anti-join against visited. `localCheckpoint` truncates the
  * growing lineage so a 20-hop traversal doesn't replan 20 nested
  * joins; on a cluster the frontier stays partitioned by the join key
  * and AQE broadcasts it once it shrinks below the threshold.
  */
object Traversals {

  /** Edge table partitioned by the per-round join key ONCE and kept
    * resident for the loop's lifetime (r16 optimization round). Two
    * deliberate choices, both measured:
    *   - `persist`, not `localCheckpoint`: under AQE a checkpoint's
    *     LogicalRDD reports UnknownPartitioning, so every round's
    *     frontier join re-exchanged the WHOLE edge table; a cached
    *     plan keeps its HashPartitioning (AQE may not change cached
    *     plan output partitioning), so each round exchanges only the
    *     frontier (guide §2.4 — remove shuffles of data already
    *     partitioned as needed).
    *   - the partition count is the session's shuffle-partition conf
    *     (scale-adaptive: the bench drives it from SPARK_GRAFT_CPUS,
    *     a cluster from its own sizing), pinned explicitly so the
    *     frontier exchange lands co-partitioned.
    * Callers unpersist after the loop; every returned frame is
    * checkpointed first, so nothing downstream re-reads the cache.
    */
  private[graph] def keyedResident(df: DataFrame, key: String): DataFrame = {
    val sess = df.sparkSession
    // Size-adaptive (the same runtime-statistics decision AQE makes
    // for joins): an edge table under the broadcast threshold is
    // cheapest re-broadcast per round — repartition+cache overhead
    // buys nothing (measured +0.1-0.3 s per query on the 25-node
    // nation spine) — while a larger one is partitioned on the
    // per-round join key once and kept resident for the loop.
    // The small path caches WITHOUT repartitioning — and deliberately
    // not localCheckpoint: a checkpoint's LogicalRDD loses size
    // statistics (estimated as the default huge size), which silently
    // demotes every per-round broadcast of the edge side to a shuffled
    // join (measured on g29: +26% wall, +0.35M shuffled rows), while a
    // cached plan keeps its child's statistics. Returning the frame
    // unchanged is no good either: derivations that contain an
    // exchange (e.g. PageRank's distinct) would re-run every round
    // (measured: g09/g16 shuffle rows 1.2k → 7.4k).
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val threshold = sess.sessionState.conf.autoBroadcastJoinThreshold
    // The persisted plan is wrapped in a no-op projection so its cache
    // entry is keyed on a plan NO caller shares: Spark's cache manager
    // keys by logical plan and is not reference-counted, so persisting
    // the caller's frame as-is (often a shared MatStore read) would let
    // this loop's end-of-loop unpersist evict a cache an overlapping
    // operator still iterates over (r16 ADVICE).
    if (threshold > 0 && estBytes <= threshold)
      return df.select(df.columns.map(c => col(c)): _*).persist()
    val p = graft.util.Par.shufflePartitions(sess)
    // also sorted within partitions: the cached plan's outputOrdering
    // survives (like its partitioning), so a sort-merge round join at
    // the wavefront peak never re-sorts the edge side; one sort at
    // cache build, not one per round. Join strategy per round is left
    // to AQE: small frontiers convert to broadcast at runtime (the
    // measured local winner — a forced SHUFFLE_HASH was 2.4x slower),
    // big frontiers stay sort-merge against the pre-sorted cache.
    df.repartition(p, col(key)).sortWithinPartitions(key).persist()
  }

  /** Checkpoint `df` and count its rows matching `pred` in ONE Spark
    * job (r17). The checkpoint is LAZY; the counting action computes
    * every partition of the checkpointed RDD, so materialization rides
    * the same job that answers the loop's continue-probe. Every
    * iterative loop previously paid one eager-checkpoint job PLUS one
    * isEmpty/convergence job — two scheduler round-trips per round
    * where one suffices. Wall time here is per-job latency; on a
    * cluster the same fusion removes one barrier per round, which is
    * the iterative family's true scale cost (guide §2.2's latency
    * channel). Semantics are unchanged: localCheckpoint(eager=false)
    * returns the same LogicalRDD-backed frame as the eager form, and
    * the count's full-partition pass is exactly the materialization
    * the eager form runs internally.
    */
  private[graft] def checkpointWithCount(df: DataFrame,
      pred: org.apache.spark.sql.Column): (DataFrame, Long) = {
    val ck = df.localCheckpoint(eager = false)
    // RDD-level count, NOT Dataset.count(): the SQL count plans a
    // partial-agg + single-partition exchange, which AQE materializes
    // as its own extra job — toRdd.count() sums per-partition counts
    // on the driver in exactly ONE job with no exchange (the bench's
    // own action), and computing every partition is what materializes
    // the lazy checkpoint.
    (ck, ck.filter(pred).queryExecution.toRdd.count())
  }

  /** (node, dist) for every node within `maxHops` of `source`.
    *
    * Round shape (r16): the hop number doubles as the first-visit tag
    * — `visited ∪ candidates` under a map-side-combining `min(dist)`
    * keeps the old row for already-visited nodes (its dist is
    * strictly smaller) and assigns `hop` to first visits, and the
    * next frontier is exactly `dist === hop`. One union+groupBy
    * replaces the old distinct + anti-join + union cascade: two
    * exchanges per hop (frontier into the join, the min-combine)
    * instead of four, and the edge table is never re-shuffled.
    */
  def bfsLevels(edges: DataFrame, source: Int, maxHops: Int): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    val e = keyedResident(edges.select(col("src"), col("dst")), "src")
    var visited = Seq((source, 0)).toDF("node", "dist").localCheckpoint()
    var frontier = visited
    var frontierN = 1L // the source row
    var hop = 0
    while (hop < maxHops && frontierN > 0) {
      hop += 1
      val cand = frontier.join(e, frontier("node") === e("src"))
        .select(e("dst").as("node"), lit(hop).as("dist"))
      // checkpoint + frontier probe fused into one job (r17)
      val (ck, n) = checkpointWithCount(
        visited.unionAll(cand)
          .groupBy(col("node")).agg(min(col("dist")).as("dist")),
        col("dist") === hop)
      visited = ck
      frontierN = n
      frontier = visited.filter(col("dist") === hop)
    }
    e.unpersist(false)
    visited
  }

  /** Nodes reachable from `source` (source included), frontier loop
    * until fixpoint. Same tagged round shape as [[bfsLevels]] (the
    * first-visit hop is carried internally and dropped at return).
    */
  def reachableFrom(edges: DataFrame, source: Int): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    val e = keyedResident(edges.select(col("src"), col("dst")), "src")
    var visited = Seq((source, 0)).toDF("node", "tag").localCheckpoint()
    var frontier = visited
    var frontierN = 1L // the source row
    var hop = 0
    while (frontierN > 0) {
      hop += 1
      val cand = frontier.join(e, frontier("node") === e("src"))
        .select(e("dst").as("node"), lit(hop).as("tag"))
      // checkpoint + frontier probe fused into one job (r17)
      val (ck, n) = checkpointWithCount(
        visited.unionAll(cand)
          .groupBy(col("node")).agg(min(col("tag")).as("tag")),
        col("tag") === hop)
      visited = ck
      frontierN = n
      frontier = visited.filter(col("tag") === hop)
    }
    e.unpersist(false)
    visited.select(col("node"))
  }

  /** BFS level order from nation 0, capped at 6 hops (reference op 4). */
  private def g03(s: SparkSession, dir: String): DataFrame =
    bfsLevels(TradeGraph.edgesTable(s, dir), source = 0, maxHops = 6)
      .orderBy(col("node"))

  private val g03Sql = s"""
    WITH RECURSIVE ${GraphSql.edgesCte},
    bfs(node, d) AS (
      SELECT CAST(0 AS INTEGER), CAST(0 AS INTEGER)
      UNION
      SELECT e.dst, CAST(bfs.d + 1 AS INTEGER)
      FROM bfs JOIN edges e ON e.src = bfs.node
      WHERE bfs.d < 6)
    SELECT node, CAST(MIN(d) AS INTEGER) AS dist
    FROM bfs GROUP BY node ORDER BY node"""

  /** BFS level order from the busiest hub (max out-degree, smallest-id
    * tie-break) — the reference client passes an ARBITRARY start node
    * to its traversals (client.c:23-29), so the parameterized source
    * path ([[bfsLevels]]'s `source`) must be oracle-checked on a
    * non-zero source too, not only exercised by specs. The source is
    * data-derived and deterministic so the DuckDB oracle rederives the
    * identical node; the driver-side `head()` is one scalar (argmax),
    * not graph-sized state.
    */
  private def g22(s: SparkSession, dir: String): DataFrame = {
    val e = TradeGraph.edgesTable(s, dir)
    val hub = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .orderBy(col("d").desc, col("src")).head().getInt(0)
    bfsLevels(e, source = hub, maxHops = 6).orderBy(col("node"))
  }

  private val g22Sql = s"""
    WITH RECURSIVE ${GraphSql.edgesCte},
    hub AS (
      SELECT src FROM edges GROUP BY src
      ORDER BY count(*) DESC, src LIMIT 1),
    bfs(node, d) AS (
      SELECT src, CAST(0 AS INTEGER) FROM hub
      UNION
      SELECT e.dst, CAST(bfs.d + 1 AS INTEGER)
      FROM bfs JOIN edges e ON e.src = bfs.node
      WHERE bfs.d < 6)
    SELECT node, CAST(MIN(d) AS INTEGER) AS dist
    FROM bfs GROUP BY node ORDER BY node"""

  /** Reachable terminal (sink) nodes on the DAG view from nation 0 —
    * the deterministic re-expression of the reference's DFS
    * deepest-node output (reference op 3; SURVEY.md §6).
    */
  private def g04(s: SparkSession, dir: String): DataFrame = {
    val dag = TradeGraph.dagEdges(TradeGraph.edgesTable(s, dir)).localCheckpoint()
    val reach = reachableFrom(dag, source = 0)
    reach.join(dag.select(col("src")).distinct(),
        reach("node") === col("src"), "left_anti")
      .select(col("node")).orderBy(col("node"))
  }

  private val g04Sql = s"""
    WITH RECURSIVE ${GraphSql.edgesCte}, ${GraphSql.dagCte},
    reach(node) AS (
      SELECT CAST(0 AS INTEGER)
      UNION
      SELECT e.dst FROM reach r JOIN dag e ON e.src = r.node)
    SELECT node FROM reach
    WHERE node NOT IN (SELECT src FROM dag)
    ORDER BY node"""

  /** Reachable terminal (sink) nodes from the busiest DAG hub — g04's
    * DFS-terminal semantics with a DATA-DERIVED non-zero source,
    * closing the same parity gap for reference op 3 that g22 closes
    * for op 4 (the reference client passes an arbitrary start to both
    * traversals, client.c:23-29). The hub is the max-out-degree DAG
    * source with smallest-id tie-break, so the DuckDB oracle
    * rederives the identical node; the driver-side `head()` is one
    * scalar (argmax), not graph-sized state.
    */
  private def g23(s: SparkSession, dir: String): DataFrame = {
    val dag = TradeGraph.dagEdges(TradeGraph.edgesTable(s, dir)).localCheckpoint()
    val hub = dag.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .orderBy(col("d").desc, col("src")).head().getInt(0)
    val reach = reachableFrom(dag, source = hub)
    reach.join(dag.select(col("src")).distinct(),
        reach("node") === col("src"), "left_anti")
      .select(col("node")).orderBy(col("node"))
  }

  private val g23Sql = s"""
    WITH RECURSIVE ${GraphSql.edgesCte}, ${GraphSql.dagCte},
    hub AS (
      SELECT src FROM dag GROUP BY src
      ORDER BY count(*) DESC, src LIMIT 1),
    reach(node) AS (
      SELECT src FROM hub
      UNION
      SELECT e.dst FROM reach r JOIN dag e ON e.src = r.node)
    SELECT node FROM reach
    WHERE node NOT IN (SELECT src FROM dag)
    ORDER BY node"""

  /** Directed transitive-closure pairs (root, node): root reaches node
    * via ≥1 edge. Frontier loop — all sources advance together, so the
    * hop count (not the source count) bounds the number of shuffles.
    * O(V·reach) output: the documented exact envelope shared by g07
    * and g24 (g18's FM-sketch is the registered linear-state scale
    * path for reach COUNTS; closure-pair consumers at 100 TB bound the
    * root set instead).
    */
  private def closurePairs(edges: DataFrame): DataFrame = {
    // r16 round shape: first-visit tag + union/min-combine, edge table
    // resident and partitioned on the join key once (see keyedResident)
    val e = keyedResident(edges.select(col("src"), col("dst")), "src")
    // initial checkpoint + emptiness probe fused like the loop's (r17)
    var (pairs, frontierN) = checkpointWithCount(
      e.select(col("src").as("root"), col("dst").as("node"), lit(0).as("tag"))
        .groupBy(col("root"), col("node")).agg(min(col("tag")).as("tag")),
      lit(true))
    var frontier = pairs
    var hop = 0
    while (frontierN > 0) {
      hop += 1
      val cand = frontier.join(e, frontier("node") === e("src"))
        .select(frontier("root"), e("dst").as("node"), lit(hop).as("tag"))
      val (ck, n) = checkpointWithCount(
        pairs.unionAll(cand)
          .groupBy(col("root"), col("node")).agg(min(col("tag")).as("tag")),
        col("tag") === hop)
      pairs = ck
      frontierN = n
      frontier = pairs.filter(col("tag") === hop)
    }
    e.unpersist(false)
    pairs.select(col("root"), col("node"))
  }

  private def g07(s: SparkSession, dir: String): DataFrame = {
    val edges = TradeGraph.edgesTable(s, dir)
      .select(col("src"), col("dst")).localCheckpoint()
    val pairs = closurePairs(edges)
    val verts = TradeGraph.nodes(s, dir)
    verts.join(pairs, verts("node") === pairs("root"), "left")
      .groupBy(verts("node"))
      .agg(count(pairs("root")).as("n_reachable"))
      .orderBy(verts("node"))
  }

  private val g07Sql = s"""
    WITH RECURSIVE ${GraphSql.edgesCte}, ${GraphSql.nodesCte},
    r(root, nd) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.root, e.dst FROM r JOIN edges e ON e.src = r.nd)
    SELECT n.node, count(r.root) AS n_reachable
    FROM nodes n LEFT JOIN r ON r.root = n.node
    GROUP BY n.node ORDER BY n.node"""

  /** Strongly connected components of the DIRECTED trade graph — the
    * directed-graph census g05/g11 (undirected CC) can't answer: two
    * nations are in one SCC iff trade flows both ways, possibly
    * transitively. Labels are deterministic by construction: scc_id(v)
    * = min(v, min{u : u⇄v mutually reachable}), computed as the
    * closure-pair set intersected with its own transpose — same
    * [[closurePairs]] machinery and the same documented exact envelope
    * as g07 (the mutual-pair set is one self-join of the closure on
    * the flipped key pair, hash-uniform). At cluster scale the
    * pair-set closure gives way to pivot-based forward-backward
    * decomposition — BUILT as [[Scc.fwbw]] and registered as g25
    * against this query's own oracle (SccSpec pins the two bit-equal
    * on adversarial graphs); this registered query stays the
    * exact-envelope census on the 25-node nation spine.
    */
  private def g24(s: SparkSession, dir: String): DataFrame = {
    val edges = TradeGraph.edgesTable(s, dir)
      .select(col("src"), col("dst")).localCheckpoint()
    val pairs = closurePairs(edges)
    val mutual = pairs.join(
      pairs.select(col("node").as("root"), col("root").as("node")),
      Seq("root", "node"))
      .select(col("root").as("v"), col("node").as("u"))
    val verts = TradeGraph.nodes(s, dir)
    val labeled = verts.join(mutual, verts("node") === mutual("v"), "left")
      .groupBy(verts("node"))
      .agg(min(mutual("u")).as("mn"))
      .select(col("node"),
        least(col("node"), coalesce(col("mn"), col("node"))).as("scc_id"))
    labeled
      .withColumn("scc_size",
        count(lit(1)).over(Window.partitionBy(col("scc_id"))))
      .orderBy(col("node"))
  }

  private val g24Sql = s"""
    WITH RECURSIVE ${GraphSql.edgesCte}, ${GraphSql.nodesCte},
    r(root, nd) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.root, e.dst FROM r JOIN edges e ON e.src = r.nd),
    m AS (
      SELECT a.root AS v, a.nd AS u
      FROM r a JOIN r b ON b.root = a.nd AND b.nd = a.root),
    s AS (
      SELECT n.node, least(n.node, coalesce(min(m.u), n.node)) AS scc_id
      FROM nodes n LEFT JOIN m ON m.v = n.node
      GROUP BY n.node)
    SELECT node, scc_id, count(*) OVER (PARTITION BY scc_id) AS scc_size
    FROM s ORDER BY node"""

  /** g25: the SAME SCC census served by the SCALE path — [[Scc.fwbw]]'s
    * pivot forward-backward decomposition (frontier joins only, no
    * closure-pair materialization) on the same nation spine, checked
    * against the same oracle as g24. Registering it makes the scale
    * plan itself oracle-exercised, the d05→d12 / e11→e12 pattern:
    * g24 stays as the exact-envelope census, this row is the plan a
    * 100 TB graph actually runs.
    */
  private def g25(s: SparkSession, dir: String): DataFrame = {
    val edges = TradeGraph.edgesTable(s, dir).select(col("src"), col("dst"))
    Scc.fwbw(TradeGraph.nodes(s, dir), edges)
      .select(col("node").cast("int").as("node"),
        col("scc_id").cast("int").as("scc_id"))
      .withColumn("scc_size",
        count(lit(1)).over(Window.partitionBy(col("scc_id"))))
      .orderBy(col("node"))
  }

  /** Closeness centrality via multi-source BFS: every vertex's frontier
    * advances in the same loop (as in g07, the diameter — not the
    * vertex count — bounds the shuffle count), tracking min hop
    * distance; closeness = n_reachable / sum(dist) over the reachable
    * set. Integral hops, so the only double is the final ratio.
    */
  /** Hop cap shared by the Spark loop and the DuckDB oracle's
    * recursion bound — if only the oracle capped (as it used to),
    * any graph with eccentricity ≥ the cap would legitimately
    * diverge from the uncapped engine.
    */
  private val g14MaxHops = 10

  private def g14(s: SparkSession, dir: String): DataFrame = {
    // r16 round shape: the hop is the first-visit tag — one
    // union + min-combine per hop replaces the old groupBy + anti-join
    // + union cascade, and the symmetric edge table stays resident and
    // partitioned on the join key (see keyedResident)
    val sym = keyedResident(
      TradeGraph.symEdges(TradeGraph.edgesTable(s, dir)), "src")
    var dist = TradeGraph.nodes(s, dir)
      .select(col("node").as("root"), col("node"), lit(0).as("hop"))
      .localCheckpoint()
    var frontier = dist
    var round = 0
    while (!frontier.isEmpty && round < g14MaxHops) {
      round += 1
      val cand = frontier.join(sym, frontier("node") === sym("src"))
        .select(frontier("root"), sym("dst").as("node"), lit(round).as("hop"))
      dist = dist.unionAll(cand)
        .groupBy(col("root"), col("node")).agg(min(col("hop")).as("hop"))
        .localCheckpoint()
      frontier = dist.filter(col("hop") === round)
    }
    sym.unpersist(false)
    dist.groupBy(col("root").as("node"))
      .agg((count(lit(1)) - 1).as("n_reachable"),
        sum(col("hop")).cast("long").as("sum_dist"))
      .withColumn("closeness", when(col("sum_dist") > 0,
        col("n_reachable").cast("double") / col("sum_dist").cast("double"))
        .otherwise(lit(0.0)))
      .orderBy(col("node"))
  }

  private val g14Sql = s"""
    WITH RECURSIVE ${GraphSql.edgesCte}, ${GraphSql.nodesCte}, ${GraphSql.symCte},
    b(root, nd, d) AS (
      SELECT node, node, 0 FROM nodes
      UNION
      SELECT b.root, e.dst, b.d + 1 FROM b JOIN sym e ON e.src = b.nd
      WHERE b.d < $g14MaxHops),
    mind AS (SELECT root, nd, MIN(d) AS d FROM b GROUP BY root, nd)
    SELECT root AS node, count(*) - 1 AS n_reachable,
      CAST(SUM(d) AS BIGINT) AS sum_dist,
      CASE WHEN SUM(d) > 0 THEN
        CAST(count(*) - 1 AS DOUBLE) / CAST(CAST(SUM(d) AS BIGINT) AS DOUBLE)
      ELSE CAST(0 AS DOUBLE) END AS closeness
    FROM mind GROUP BY root ORDER BY node"""

  /** Bounded Bellman-Ford: min-cost path from node 0 on the DAG view
    * using ≤4 relaxation rounds; edge cost is the integral trade-cost
    * proxy FLOOR(1e6 / weight) + 1 so path sums stay exact.
    */
  private def g08(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dag = TradeGraph.dagEdges(TradeGraph.edgesTable(s, dir))
      .select(col("src"), col("dst"),
        (floor(lit(1000000.0) / col("weight")) + 1).cast("long").as("cost"))
      .localCheckpoint()
    var dist = Seq((0, 0L)).toDF("node", "cost")
    for (_ <- 1 to 4) {
      val relaxed = dist.join(dag, dist("node") === dag("src"))
        .select(dag("dst").as("node"), (dist("cost") + dag("cost")).as("cost"))
      dist = dist.unionAll(relaxed)
        .groupBy(col("node")).agg(min(col("cost")).as("cost"))
        .localCheckpoint()
    }
    dist.orderBy(col("node"))
  }

  private val g08Sql = s"""
    WITH RECURSIVE ${GraphSql.edgesCte},
    dag AS (
      SELECT src, dst, CAST(FLOOR(1000000.0 / weight) + 1 AS BIGINT) AS cost
      FROM edges WHERE src < dst),
    paths(node, cost, depth) AS (
      SELECT CAST(0 AS INTEGER), CAST(0 AS BIGINT), 0
      UNION
      SELECT e.dst, p.cost + e.cost, p.depth + 1
      FROM paths p JOIN dag e ON e.src = p.node
      WHERE p.depth < 4)
    SELECT node, MIN(cost) AS cost
    FROM paths GROUP BY node ORDER BY node"""

  /** Diagnostics: relaxation rounds of the last [[ssspConverged]] run
    * (spec instrumentation; also how the g26 oracle's unroll depth was
    * measured — single-threaded test use only).
    */
  @volatile private[graft] var lastSsspRounds: Int = 0

  /** Unbounded single-source shortest path over positive integral
    * edge costs, iterated to FIXPOINT — the general form of g08's
    * bounded Bellman-Ford (the reference's "shortest route" semantics
    * without a depth cap). Frontier-relaxation (delta-stepping
    * shape): each round relaxes only edges out of nodes whose
    * distance improved last round — one equi-join on the frontier +
    * a map-side-combining min per destination + one anti/left join
    * against the running distance table, all hash-uniform on node
    * ids, nothing driver-sized (the loop probe is isEmpty, lineage is
    * checkpoint-truncated per round like g03's BFS). Positive costs
    * guarantee termination in ≤ (max shortest-path hop count) rounds;
    * at 1000 executors the cost per round is one shuffle of the
    * improved set, which shrinks monotonically after the wavefront
    * peak.
    */
  private[graft] def ssspConverged(edges: DataFrame, source: Long): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    // r16 round shape. The distance table carries the round each
    // node's cost last IMPROVED (`tag`); one union + map-side-
    // combining `min(struct(cost, tag))` merges the raw relaxation
    // candidates into the table — a candidate wins only on a strict
    // cost improvement (cost ties keep the old row: its tag is
    // smaller), so `tag === round` is exactly the old `improved`
    // frontier. Replaces the old per-round candidate groupBy +
    // left-join-filter + anti-join + union (4 exchanges + 2
    // checkpoints per round, with the edge table re-shuffled every
    // round) with 2 exchanges + 1 checkpoint and a resident,
    // pre-partitioned edge table (guide §2.3/§2.4).
    val e = keyedResident(edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"), col("cost").cast("long").as("cost")),
      "src")
    var dist = Seq((source, 0L, 0)).toDF("node", "cost", "tag").localCheckpoint()
    var frontier = dist
    var frontierN = 1L // the source row
    var rounds = 0
    while (frontierN > 0) {
      rounds += 1
      val cand = frontier.join(e, frontier("node") === e("src"))
        .select(e("dst").as("node"), (frontier("cost") + e("cost")).as("cost"),
          lit(rounds).as("tag"))
      // checkpoint + improved-frontier probe fused into one job (r17)
      val (ck, n) = checkpointWithCount(
        dist.unionAll(cand)
          .groupBy(col("node")).agg(min(struct(col("cost"), col("tag"))).as("b"))
          .select(col("node"), col("b.cost").as("cost"), col("b.tag").as("tag")),
        col("tag") === rounds)
      dist = ck
      frontierN = n
      frontier = dist.filter(col("tag") === rounds)
    }
    lastSsspRounds = rounds
    e.unpersist(false)
    dist.select(col("node"), col("cost"))
  }

  /** g26: SSSP to fixpoint on the PREFERRED-PARTNER bipartite graph —
    * each customer keeps its two best suppliers (max lineitem count,
    * smallest-id tie-break) and each supplier its two best customers. The
    * full customer–supplier graph is so dense its diameter is ~4 at
    * every SF (g08's bounded form already covers that regime); the
    * best-partner subgraph is chain-like and DEEP, so the convergence
    * loop is genuinely exercised — and it grows with SF (millions of
    * nodes at 100 TB). Nodes use the g11 bipartite numbering
    * (customer 2k, supplier 2k+1); the edge cost is the g08 integral
    * trade-cost proxy FLOOR(1e6 / lineitem-count) + 1 (heavier
    * trading pairs are cheaper hops; integral so path sums stay
    * exact). The source is the busiest supplier (max distinct
    * customers, smallest-id tie-break) — data-derived and
    * deterministic like g22's hub, so the oracle rederives it; the
    * driver-side head() is one scalar.
    */
  /** (cust, supp, w) trade-volume pairs — the shared input of the
    * preferred-partner subgraph (g26, g27).
    */
  private[graph] def custSuppW(s: SparkSession, dir: String): DataFrame =
    // r16: materialized once per (session, corpus) — g26/g27/g28/g29
    // all start from this fact aggregation (and g26/g28 re-probe it
    // for the hub), so it joins the shared-index family (the d04/d18
    // shingle-table move) instead of re-scanning the fact spine per
    // query and per rep
    graft.util.MatStore.table(s, s"custsuppw:$dir", "graft_custsuppw") {
      TradeGraph.orderFacts(s, dir)
        .groupBy(col("custkey").cast("long").as("cust"),
          col("suppkey").cast("long").as("supp"))
        .agg(count(lit(1)).as("w"))
    }

  /** Preferred-partner selection over [[custSuppW]]: each customer's
    * top-2 suppliers and each supplier's top-2 customers by trade
    * volume (ties to the smaller id) — a sparse, DEEP, SF-scaling
    * bipartite subgraph, vs the diameter-~4 full bipartite graph.
    * The per-partner top-2 windows partition on hash-uniform ids.
    */
  private[graph] def preferredPartners(w: DataFrame): DataFrame = {
    val topSupp = w.withColumn("rn", row_number().over(
        Window.partitionBy(col("cust")).orderBy(col("w").desc, col("supp"))))
      .filter(col("rn") <= 2).select(col("cust"), col("supp"), col("w"))
    val topCust = w.withColumn("rn", row_number().over(
        Window.partitionBy(col("supp")).orderBy(col("w").desc, col("cust"))))
      .filter(col("rn") <= 2).select(col("cust"), col("supp"), col("w"))
    topSupp.unionAll(topCust).distinct()
  }

  /** [[preferredPartners]] over [[custSuppW]], materialized once per
    * (session, corpus) — the two corpus-pair window passes are the
    * shared prelude of g26/g27/g28/g29 (r16: previously re-run per
    * query and per bench rep; only g29 memoized its derived edge list).
    */
  private[graph] def prefSel(s: SparkSession, dir: String): DataFrame =
    graft.util.MatStore.table(s, s"prefsel:$dir", "graft_prefsel")(
      preferredPartners(custSuppW(s, dir)))

  private def g26(s: SparkSession, dir: String): DataFrame = {
    val w = custSuppW(s, dir)
    val sel = prefSel(s, dir)
    val bi = sel.select((col("cust") * 2).as("src"), (col("supp") * 2 + 1).as("dst"),
      (floor(lit(1000000.0) / col("w")) + 1).cast("long").as("cost"))
    val sym = bi.unionAll(bi.select(col("dst").as("src"), col("src").as("dst"), col("cost")))
    val hub = w.groupBy(col("supp")).agg(count(lit(1)).as("d"))
      .orderBy(col("d").desc, col("supp")).head().getLong(0) * 2 + 1
    ssspConverged(sym, hub).orderBy(col("node"))
  }

  /** Unrolled-relaxation oracle (the g11 hash-min pattern): DuckDB's
    * recursive CTE cannot run Bellman-Ford to fixpoint — (node, cost)
    * states grow along cycles forever — so the oracle unrolls
    * [[g26UnrollRounds]] relaxation rounds as a chained CTE. The
    * round count was measured via [[lastSsspRounds]] at sf0.001/0.01/
    * 0.1 and carries headroom; the Spark side iterates to true
    * fixpoint regardless of SF.
    */
  private val g26UnrollRounds = 16

  /** [[ssspConverged]] with PREDECESSOR tracking — the route, not just
    * the distance (the reference's op-3/4 user asks "how do I get
    * there"; g26 answers only "how far"). Identical frontier-relaxation
    * loop and exchanges; the min-struct per destination carries
    * (cost, pred), so ties break to the smallest predecessor id WITHIN
    * the first round the final cost is achieved, and a node's pred
    * never changes afterwards (improvements are strict). That rule is
    * deterministic AND oracle-unrollable: every optimal predecessor of
    * a node first achieves its own final cost exactly one round before
    * the node does (any earlier and the node would have improved
    * earlier; any later and its candidate never survives the strict-<
    * filter), so a full-relaxation unroll sees the same candidate set
    * in the deciding round. The source's pred is itself — the walk
    * terminator.
    */
  private[graft] def ssspPredsConverged(edges: DataFrame, source: Long): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    // r16 round shape, see ssspConverged. The merge key extends to
    // min(struct(cost, tag, pred)): a cost tie keeps the old row (its
    // tag is strictly smaller — "a node's pred never changes after the
    // round its final cost is achieved"), and among same-round
    // candidates the smallest pred wins — both exactly the documented
    // tie rules of the old min(struct(cost, pred)) + strict-< filter.
    val e = keyedResident(edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"), col("cost").cast("long").as("cost")),
      "src")
    var dist = Seq((source, 0L, 0, source)).toDF("node", "cost", "tag", "pred")
      .localCheckpoint()
    var frontier = dist
    var frontierN = 1L // the source row
    var rounds = 0
    while (frontierN > 0) {
      rounds += 1
      val cand = frontier.join(e, frontier("node") === e("src"))
        .select(e("dst").as("node"), (frontier("cost") + e("cost")).as("cost"),
          lit(rounds).as("tag"), frontier("node").as("pred"))
      // checkpoint + improved-frontier probe fused into one job (r17)
      val (ck, n) = checkpointWithCount(
        dist.unionAll(cand)
          .groupBy(col("node"))
          .agg(min(struct(col("cost"), col("tag"), col("pred"))).as("b"))
          .select(col("node"), col("b.cost").as("cost"), col("b.tag").as("tag"),
            col("b.pred").as("pred")),
        col("tag") === rounds)
      dist = ck
      frontierN = n
      frontier = dist.filter(col("tag") === rounds)
    }
    lastSsspRounds = rounds
    e.unpersist(false)
    dist.select(col("node"), col("cost"), col("pred"))
  }

  /** Unfold full routes from a (node, cost, pred) distance table by
    * iterative predecessor joins — the pred map is a tree rooted at
    * the source, so the walk terminates in exactly the path depth
    * (bounded by the relaxation round count). Per round: one hash
    * join of the still-walking rows against the node-keyed pred
    * table; finished rows exit the loop immediately, so total work is
    * Σ path lengths — the size of the output itself. Nothing
    * driver-sized; lineage is checkpoint-truncated per round.
    */
  private[graft] def unfoldPaths(dist: DataFrame, source: Long): DataFrame = {
    // r16: POINTER-DOUBLING unfold — ceil(log2(max path depth)) rounds
    // instead of one join per path-depth level (the Scc chain-
    // contraction move applied to the pred tree). jump after round k
    // maps node → (its 2^k-th ancestor, the ancestor segment
    // [p_{2^k}, …, p_1] nearest-ancestor-LAST, both clipped at the
    // source, which is absorbing: jump(source) = (source, [])). The
    // walking rows keep the invariant path = [cur, …, node], so a
    // round prepends the segment and jumps cur — finished rows (cur =
    // source) exit exactly as before, and the emitted path arrays are
    // identical element for element.
    var jump = dist.select(col("node").as("jn"),
        when(col("node") === lit(source), col("node"))
          .otherwise(col("pred")).as("jp"),
        when(col("node") === lit(source), array().cast("array<long>"))
          .otherwise(array(col("pred"))).as("seg"))
      .localCheckpoint()
    // checkpoint + active probe fused into one job, here and per
    // round below (r17)
    val (start, startActiveN) = Traversals.checkpointWithCount(
      dist.select(col("node"), col("cost"), col("node").as("cur"),
        array(col("node")).as("path")),
      col("cur") =!= lit(source))
    var done = List(start.filter(col("cur") === lit(source)))
    var active = start.filter(col("cur") =!= lit(source))
    var activeEmpty = startActiveN == 0
    while (!activeEmpty) {
      val j = jump
      val (stepped, activeN) = Traversals.checkpointWithCount(
        active.join(j, active("cur") === j("jn"))
          .select(col("node"), col("cost"), j("jp").as("cur"),
            concat(j("seg"), col("path")).as("path"))
          .toDF("node", "cost", "cur", "path"),
        col("cur") =!= lit(source))
      done ::= stepped.filter(col("cur") === lit(source))
      active = stepped.filter(col("cur") =!= lit(source))
      activeEmpty = activeN == 0
      if (!activeEmpty) {
        // double the jump table: 2^(k+1) ancestor = 2^k ancestor of
        // the 2^k ancestor; segments concatenate ancestor-side first
        val j2 = j.select(col("jn").as("jn2"), col("jp").as("jp2"),
          col("seg").as("seg2"))
        jump = j.join(j2, j("jp") === col("jn2"))
          .select(j("jn"), col("jp2").as("jp"),
            concat(col("seg2"), j("seg")).as("seg"))
          .toDF("jn", "jp", "seg").localCheckpoint()
      }
    }
    done.reduce(_ unionAll _)
      .select(col("node"), col("cost"),
        (size(col("path")) - 1).cast("long").as("hops"),
        concat_ws("->", expr("transform(path, x -> cast(x as string))"))
          .as("path"))
  }

  /** g28: shortest ROUTES from the g26 hub on the preferred-partner
    * bipartite graph — g26's distance table extended with predecessor
    * tracking and unfolded into the full hub→node path per node
    * (rendered "a->b->c"). Same graph, same source, same fixpoint
    * loop; the path unfold adds one hash join per path-depth level.
    */
  private def g28(s: SparkSession, dir: String): DataFrame = {
    val w = custSuppW(s, dir)
    val sel = prefSel(s, dir)
    val bi = sel.select((col("cust") * 2).as("src"), (col("supp") * 2 + 1).as("dst"),
      (floor(lit(1000000.0) / col("w")) + 1).cast("long").as("cost"))
    val sym = bi.unionAll(bi.select(col("dst").as("src"), col("src").as("dst"), col("cost")))
    val hub = w.groupBy(col("supp")).agg(count(lit(1)).as("d"))
      .orderBy(col("d").desc, col("supp")).head().getLong(0) * 2 + 1
    unfoldPaths(ssspPredsConverged(sym, hub), hub).orderBy(col("node"))
  }

  /** g26's unrolled-relaxation oracle extended with pred tracking
    * (struct-min mirrors the Spark min(struct(cost, pred)); the
    * keep-old-on-tie rule rides the o.cost <= n.cost CASE), then a
    * recursive-CTE walk up the pred tree rebuilds each node's path.
    */
  private val g28Sql: String = {
    val relax = (1 to g26UnrollRounds).map { i =>
      s"""n$i AS (
      SELECT node, min({'c': cost, 'p': pred}) AS b FROM (
        SELECT e.dst AS node, p.cost + e.cost AS cost, p.node AS pred
        FROM d${i - 1} p JOIN bedges e ON e.src = p.node)
      GROUP BY node),
    d$i AS MATERIALIZED (
      SELECT COALESCE(o.node, n.node) AS node,
        CASE WHEN o.cost IS NOT NULL AND (n.b IS NULL OR o.cost <= n.b.c)
          THEN o.cost ELSE n.b.c END AS cost,
        CASE WHEN o.cost IS NOT NULL AND (n.b IS NULL OR o.cost <= n.b.c)
          THEN o.pred ELSE n.b.p END AS pred
      FROM d${i - 1} o FULL OUTER JOIN n$i n ON n.node = o.node)"""
    }.mkString(",\n    ")
    s"""
    WITH RECURSIVE ${GraphSql.prefCtes},
    bi AS MATERIALIZED (
      SELECT cust * 2 AS src, supp * 2 + 1 AS dst,
        CAST(FLOOR(1000000.0 / w) + 1 AS BIGINT) AS cost
      FROM sel),
    bedges AS MATERIALIZED (
      SELECT src, dst, cost FROM bi
      UNION ALL SELECT dst AS src, src AS dst, cost FROM bi),
    hub AS (
      SELECT supp * 2 + 1 AS h FROM w GROUP BY supp ORDER BY count(*) DESC, supp LIMIT 1),
    d0 AS (SELECT h AS node, CAST(0 AS BIGINT) AS cost, h AS pred FROM hub),
    $relax,
    walk(node, cost, cur, path) AS (
      SELECT node, cost, node, [node] FROM d$g26UnrollRounds
      UNION ALL
      SELECT w2.node, w2.cost, p.pred, list_prepend(p.pred, w2.path)
      FROM walk w2 JOIN d$g26UnrollRounds p ON p.node = w2.cur
      WHERE w2.cur <> (SELECT h FROM hub))
    SELECT node, cost, CAST(len(path) - 1 AS BIGINT) AS hops,
      array_to_string(list_transform(path, x -> CAST(x AS VARCHAR)), '->') AS path
    FROM walk WHERE cur = (SELECT h FROM hub)
    ORDER BY node"""
  }

  private val g26Sql: String = {
    val relax = (1 to g26UnrollRounds).map { i =>
      s"""d$i AS MATERIALIZED (
      SELECT node, MIN(cost) AS cost FROM (
        SELECT node, cost FROM d${i - 1}
        UNION ALL
        SELECT e.dst AS node, p.cost + e.cost AS cost
        FROM d${i - 1} p JOIN bedges e ON e.src = p.node)
      GROUP BY node)"""
    }.mkString(",\n    ")
    s"""
    WITH ${GraphSql.prefCtes},
    bi AS MATERIALIZED (
      SELECT cust * 2 AS src, supp * 2 + 1 AS dst,
        CAST(FLOOR(1000000.0 / w) + 1 AS BIGINT) AS cost
      FROM sel),
    bedges AS MATERIALIZED (
      SELECT src, dst, cost FROM bi
      UNION ALL SELECT dst AS src, src AS dst, cost FROM bi),
    hub AS (
      SELECT supp * 2 + 1 AS h FROM w GROUP BY supp ORDER BY count(*) DESC, supp LIMIT 1),
    d0 AS (SELECT h AS node, CAST(0 AS BIGINT) AS cost FROM hub),
    $relax
    SELECT node, cost FROM d$g26UnrollRounds ORDER BY node"""
  }

  val ops: Seq[Op] = Seq(
    Op("g03_bfs_levels", g03, Some(g03Sql)),
    Op("g22_bfs_from_hub", g22, Some(g22Sql)),
    Op("g04_dfs_terminal", g04, Some(g04Sql)),
    Op("g23_dfs_terminal_from_hub", g23, Some(g23Sql)),
    Op("g07_reachability", g07, Some(g07Sql)),
    Op("g24_scc", g24, Some(g24Sql)),
    // g25 deliberately reuses g24's oracle: FW-BW must produce the
    // identical SCC partition as the closure-based exact form — the
    // shared SQL IS the contract (SURVEY §2 records the same)
    Op("g25_scc_fwbw", g25, Some(g24Sql)),
    Op("g08_shortest_path_weighted", g08, Some(g08Sql)),
    Op("g26_sssp", g26, Some(g26Sql)),
    Op("g28_sssp_paths", g28, Some(g28Sql)),
    Op("g14_closeness", g14, Some(g14Sql)))
}
