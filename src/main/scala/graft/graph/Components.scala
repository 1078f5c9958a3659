package graft.graph

import graft.Op
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
    *
    * One materialization per round, deliberately: batching two rounds
    * into one job was measured 5× SLOWER (round 3) — the inner round's
    * subtree is referenced by both the join and the union branch of
    * the outer round and gets recomputed in each, and AQE does not
    * reuse the duplicated exchanges.
    */
  def labelPropagate(nodes: DataFrame, symEdges: DataFrame, maxIters: Int = 50,
      onRound: (Int, Double) => Unit = (_, _) => ()): DataFrame = {
    // r16: the edge table is partitioned on the join key once and kept
    // resident (Traversals.keyedResident — under AQE a localCheckpoint
    // loses its partitioning and every round re-shuffled the edges);
    // each round now exchanges only the label table (into the join,
    // then the min-combine). Join strategy per round is left to AQE
    // (keyedResident's doc: a forced SHUFFLE_HASH measured 2.4x slower;
    // the cached edge side is pre-sorted, so an SMJ round never
    // re-sorts it).
    val e = Traversals.keyedResident(symEdges.select(col("src"), col("dst")), "src")
    var labels = nodes.select(col("node"), col("node").as("comp")).localCheckpoint()
    var labelSum = Long.MaxValue
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      it += 1
      val t0 = System.nanoTime()
      val msgs = labels.join(e, labels("node") === e("src"))
        .select(e("dst").as("node"), col("comp"))
      // r17: LAZY checkpoint — the convergence aggregate right below
      // computes every partition, so materialization rides the same
      // job and each round pays one scheduler round-trip, not two
      // (the Traversals.checkpointWithCount fusion, with the label-sum
      // probe in place of a count)
      val next = labels.select(col("node"), col("comp")).unionAll(msgs)
        .groupBy(col("node")).agg(min(col("comp")).as("comp"))
        .localCheckpoint(eager = false)
      // r16 negative result, documented so it is not retried: a
      // label(label(v)) pointer-doubling shortcut per round was
      // measured on d17's diameter-21 near-dup graph at 21 → 17
      // rounds for +1 join per round — NET SLOWER. Min-over-ball
      // pointers do not align toward the component min (the ball's
      // argmin id is positionally arbitrary), so composition buys no
      // exponential reach without true SV hooking.
      val nextSum = next.agg(sum(col("comp").cast("long"))).collect()(0).getLong(0)
      converged = nextSum == labelSum
      labelSum = nextSum
      labels = next
      onRound(it, (System.nanoTime() - t0) / 1e9)
    }
    e.unpersist(false)
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

  /** Customer–supplier bipartite edge list (cust, supp) — the graph
    * that grows with SF (millions of edges at 100 TB) while the nation
    * graph stays 25 nodes. Materialized once per (session, corpus) and
    * shared by g11/g12.
    */
  def bipartitePairs(s: SparkSession, dir: String): DataFrame =
    graft.util.MatStore.table(s, s"bipairs:$dir", "graft_bipairs") {
      // consumes the bucketed fact spine — no orderkey join in this
      // build's plan (asserted in BucketingSpec), just scan + distinct
      TradeGraph.orderFacts(s, dir)
        .select(col("custkey").as("cust"), col("suppkey").as("supp"))
        .distinct()
    }

  private[graph] val bipairsCteSql = """
    pairs AS MATERIALIZED (
      SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey)"""

  /** Customer–supplier bipartite components. Node ids are
    * disambiguated by side (customer = 2k, supplier = 2k+1).
    *
    * Two-hop contraction: each customer's suppliers are star-connected
    * through the customer's min supplier, and label propagation runs
    * on the supplier projection only — same components, roughly half
    * the rounds, and label rows shrink from |C|+|S| to |S| (customers
    * outnumber suppliers 15:1 in this schema). Customers then inherit
    * their suppliers' component in one join. The component id stays
    * the bipartite min node id, so the output is identical to
    * propagating on the full bipartite graph.
    */
  /** (node, comp) for every node of the bipartite graph given as
    * (cust, supp) pairs, in the 2k/2k+1 bipartite numbering — computed
    * by the supplier-projection contraction described at g11, equal to
    * labelPropagate on the full doubled graph (spec-tested on
    * multi-component synthetic graphs the testdata can't produce).
    */
  /** Directed star-contraction edges of the supplier projection: each
    * customer's suppliers connected through the customer's min
    * supplier (the g11 contraction; exposed so Profile's decomposition
    * measures THIS code, not a copy).
    */
  private[graft] def supplierStar(pairs: DataFrame): DataFrame = {
    val minSupp = pairs.groupBy(col("cust")).agg(min(col("supp")).as("msupp"))
    pairs.join(minSupp, Seq("cust"))
      .filter(col("supp") =!= col("msupp"))
      .select(col("msupp").as("src"), col("supp").as("dst"))
      .distinct()
  }

  def bipartiteComponents(pairs: DataFrame): DataFrame = {
    val star = supplierStar(pairs)
    val snodes = pairs.select(col("supp").as("node")).distinct()
    val ssym = star.unionAll(star.select(col("dst").as("src"), col("src").as("dst")))
    val slabels = labelPropagate(snodes, ssym) // (supp, scomp = min supp in comp)
    val custComp = pairs.join(slabels, pairs("supp") === slabels("node"))
      .groupBy(col("cust")).agg(min(col("comp")).as("scomp"))
    // bipartite component id = min over the component of the 2k/2k+1 ids
    val cmin = custComp.groupBy(col("scomp")).agg(min(col("cust") * 2).as("cm"))
    val smin = slabels.groupBy(col("comp").as("scomp"))
      .agg(min(col("node") * 2 + 1).as("sm"))
    val compId = cmin.join(smin, Seq("scomp"))
      .select(col("scomp"), least(col("cm"), col("sm")).cast("long").as("comp"))
    val custRows = custComp.join(compId, Seq("scomp"))
      .select((col("cust") * 2).cast("long").as("node"), col("comp"))
    val suppRows = slabels.select(col("node").as("supp"), col("comp").as("scomp"))
      .join(compId, Seq("scomp"))
      .select((col("supp") * 2 + 1).cast("long").as("node"), col("comp"))
    custRows.unionAll(suppRows)
  }

  private def g11(s: SparkSession, dir: String): DataFrame =
    bipartiteComponents(bipartitePairs(s, dir))
      .groupBy(col("comp"))
      .agg(count(lit(1)).as("n_nodes"),
        count(when(col("node") % 2 === 0, lit(1))).as("n_customers"),
        count(when(col("node") % 2 === 1, lit(1))).as("n_suppliers"))
      .orderBy(col("comp"))

  /** Unrolled hash-min oracle: the sf0.01 bipartite graph converges in
    * 4 rounds (measured); 8 unrolled rounds = 2× safety margin, and
    * extra rounds past the fixpoint are no-ops so over-unrolling can't
    * change the answer.
    */
  private val g11Sql: String = {
    val rounds = 8
    val iters = (1 to rounds).map { i =>
      s"""l$i AS MATERIALIZED (
        SELECT node, MIN(comp) AS comp FROM (
          SELECT node, comp FROM l${i - 1}
          UNION ALL
          SELECT e.dst AS node, l.comp FROM l${i - 1} l JOIN sym e ON e.src = l.node)
        GROUP BY node)"""
    }.mkString(", ")
    s"""
    WITH $bipairsCteSql,
    bip AS MATERIALIZED (
      SELECT CAST(cust * 2 AS BIGINT) AS src, CAST(supp * 2 + 1 AS BIGINT) AS dst
      FROM pairs),
    sym AS MATERIALIZED (
      SELECT src, dst FROM bip UNION ALL SELECT dst AS src, src AS dst FROM bip),
    l0 AS (SELECT DISTINCT src AS node, src AS comp FROM sym),
    $iters
    SELECT comp, count(*) AS n_nodes,
      count(CASE WHEN node % 2 = 0 THEN 1 END) AS n_customers,
      count(CASE WHEN node % 2 = 1 THEN 1 END) AS n_suppliers
    FROM l$rounds GROUP BY comp ORDER BY comp"""
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

  /** Bipartite k-core peeling on the (cust, supp) pair list directly —
    * degrees per side are two aggregations over the same pair table,
    * half the rows of the symmetrized form kCore consumes.
    *
    * Degrees are counted as rows per cust/supp, which equals
    * distinct-neighbor degree only on a distinct pair list — so the
    * input is de-duplicated here rather than trusting the caller
    * (bipartitePairs happens to be distinct already; arbitrary
    * (cust, supp) frames are not, and duplicate pairs would silently
    * inflate degrees and keep nodes that k-core semantics peel).
    */
  def kCoreBipartite(pairs: DataFrame, k: Int): DataFrame = {
    // one peel per materialization — batching peels into one job
    // recomputes the inner peel once per reference (3 refs: two degree
    // aggs + the semi-join source) and was measured slower; see
    // labelPropagate's note
    // r17: checkpoint + initial count fused into one job
    var (p, nPairs) = Traversals.checkpointWithCount(
      pairs.select(col("cust"), col("supp")).distinct(), lit(true))
    var changed = true
    while (changed) {
      val keepC = p.groupBy(col("cust")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("cust"))
      val keepS = p.groupBy(col("supp")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("supp"))
      // r17: checkpoint + fixpoint count fused into one job
      val (np, n) = Traversals.checkpointWithCount(
        p.join(keepC, Seq("cust"), "left_semi")
          .join(keepS, Seq("supp"), "left_semi"),
        lit(true))
      changed = n != nPairs
      nPairs = n
      p = np
    }
    p
  }

  /** 2-core of the customer–supplier bipartite graph: strip customers
    * with a single supplier and suppliers with a single customer,
    * repeatedly — the "structurally redundant trade" core.
    */
  private def g12(s: SparkSession, dir: String): DataFrame = {
    val core = kCoreBipartite(bipartitePairs(s, dir), k = 2)
    core.agg(
      (countDistinct(col("cust")) + countDistinct(col("supp"))).as("n_core_nodes"),
      countDistinct(col("cust")).as("n_core_customers"),
      countDistinct(col("supp")).as("n_core_suppliers"))
  }

  /** Unrolled peeling oracle: the sf0.01 graph is already its own
    * 2-core (0 effective peel rounds, measured); 4 unrolled rounds
    * cover deeper peels, and rounds past the fixpoint are no-ops.
    */
  private val g12Sql: String = {
    val rounds = 4
    val iters = (1 to rounds).map { i =>
      s"""p$i AS MATERIALIZED (
        SELECT cust, supp FROM p${i - 1}
        WHERE cust IN (SELECT cust FROM p${i - 1} GROUP BY cust HAVING count(*) >= 2)
          AND supp IN (SELECT supp FROM p${i - 1} GROUP BY supp HAVING count(*) >= 2))"""
    }.mkString(", ")
    s"""
    WITH $bipairsCteSql,
    p0 AS (SELECT cust, supp FROM pairs),
    $iters
    SELECT count(DISTINCT cust) + count(DISTINCT supp) AS n_core_nodes,
      count(DISTINCT cust) AS n_core_customers,
      count(DISTINCT supp) AS n_core_suppliers
    FROM p$rounds"""
  }

  /** Supplier neighborhood similarity (link prediction shape): Jaccard
    * of customer sets for the 50 most-overlapping supplier pairs. The
    * co-customer join is keyed on cust — a customer with d suppliers
    * yields d² pair rows, so extreme-fanout customers are the skew
    * case ops.Skew.saltedJoin exists for; counts are exact integers,
    * the only double is the final ratio.
    */
  /** Salting engages only when the hottest customer's degree is at
    * least this many times the median degree — the regime where one
    * key's d² pair fan-out dwarfs a typical reducer's share. Below the
    * ratio the plain self-join wins: the semi/anti split plus the
    * salted join's explode cost more than they save (measured: the old
    * absolute threshold 48 engaged on the near-uniform sf0.1 fixture,
    * max/median ≈ 3, and taxed g13 ~6× for nothing).
    */
  private[graft] val SkewRatio = 8L
  private[graft] val SaltFactor = 8

  /** Measured-skew salt decision: one tiny aggregate over the customer
    * degree distribution (the same statistic g15's histogram reports).
    * Returns the degree threshold above which customers take the
    * salted path, or None when the distribution is too uniform for
    * salting to pay. Driver-side on two numbers only — the same shape
    * of runtime-statistics decision AQE itself makes.
    */
  private[graft] def measuredSaltThreshold(pairs: DataFrame): Option[Int] = {
    val row = pairs.groupBy(col("cust")).agg(count(lit(1)).as("cdeg"))
      .agg(max(col("cdeg")).as("mx"),
        expr("percentile_approx(cdeg, 0.5)").as("med")).head()
    if (row.isNullAt(0)) return None // empty graph: nothing to salt
    val mx = row.getLong(0)
    val med = math.max(row.getLong(1), 1L)
    // Clamp before narrowing: at extreme medians (plausible at 100 TB)
    // SkewRatio * med exceeds Int range, and an overflowed negative
    // threshold would silently send EVERY customer down the salted path.
    if (mx >= SkewRatio * med)
      Some(math.min(SkewRatio * med, (Int.MaxValue - 1).toLong).toInt)
    else None
  }

  /** (supp_a, supp_b, n_common) co-customer counts with the skew
    * switch: customers above `saltThreshold` suppliers take the salted
    * self-join (their d² pair fan-out spreads across `salt` reducers
    * instead of meeting on one), the rest take the plain join. The
    * split is exact — a customer is entirely hot or cold, so the
    * union of both pair sets equals the unsplit self-join's.
    */
  private[graft] def coCustomerCounts(pairs: DataFrame, saltThreshold: Int,
      salt: Int): DataFrame = {
    if (saltThreshold == Int.MaxValue) {
      // No hot keys possible — skip the semi/anti split entirely so the
      // uniform-degree common case pays exactly one self-join.
      return pairs.select(col("cust"), col("supp").as("supp_a"))
        .join(pairs.select(col("cust").as("cust_b"), col("supp").as("supp_b")),
          col("cust") === col("cust_b") && col("supp_a") < col("supp_b"))
        .groupBy(col("supp_a"), col("supp_b")).agg(count(lit(1)).as("n_common"))
    }
    val hotKeys = pairs.groupBy(col("cust")).agg(count(lit(1)).as("cdeg"))
      .filter(col("cdeg") > saltThreshold).select(col("cust"))
    val hot = pairs.join(hotKeys, Seq("cust"), "left_semi")
    val cold = pairs.join(hotKeys, Seq("cust"), "left_anti")
    val coldPairs = cold.select(col("cust"), col("supp").as("supp_a"))
      .join(cold.select(col("cust").as("cust_b"), col("supp").as("supp_b")),
        col("cust") === col("cust_b") && col("supp_a") < col("supp_b"))
      .select(col("supp_a"), col("supp_b"))
    val hotPairs = graft.ops.Skew.saltedJoin(
        hot.select(col("cust"), col("supp").as("supp_a")),
        hot.select(col("cust"), col("supp").as("supp_b")),
        "cust", salt)
      .filter(col("supp_a") < col("supp_b"))
      .select(col("supp_a"), col("supp_b"))
    coldPairs.unionAll(hotPairs)
      .groupBy(col("supp_a"), col("supp_b")).agg(count(lit(1)).as("n_common"))
  }

  private def g13(s: SparkSession, dir: String): DataFrame = {
    val pairs = bipartitePairs(s, dir)
    val deg = pairs.groupBy(col("supp")).agg(count(lit(1)).as("deg"))
    val common = coCustomerCounts(pairs,
      measuredSaltThreshold(pairs).getOrElse(Int.MaxValue), SaltFactor)
    common
      .join(deg.toDF("supp_a", "deg_a"), Seq("supp_a"))
      .join(deg.toDF("supp_b", "deg_b"), Seq("supp_b"))
      .withColumn("jaccard", col("n_common").cast("double") /
        (col("deg_a") + col("deg_b") - col("n_common")).cast("double"))
      .select(col("supp_a"), col("supp_b"), col("n_common"),
        col("deg_a"), col("deg_b"), col("jaccard"))
      .orderBy(col("jaccard").desc, col("supp_a"), col("supp_b"))
      .limit(50)
  }

  private val g13Sql = s"""
    WITH $bipairsCteSql,
    deg AS (SELECT supp, count(*) AS deg FROM pairs GROUP BY supp),
    common AS (
      SELECT a.supp AS supp_a, b.supp AS supp_b, count(*) AS n_common
      FROM pairs a JOIN pairs b ON a.cust = b.cust AND a.supp < b.supp
      GROUP BY 1, 2)
    SELECT c.supp_a, c.supp_b, c.n_common,
      da.deg AS deg_a, db.deg AS deg_b,
      CAST(c.n_common AS DOUBLE)
        / CAST(da.deg + db.deg - c.n_common AS DOUBLE) AS jaccard
    FROM common c
    JOIN deg da ON da.supp = c.supp_a
    JOIN deg db ON db.supp = c.supp_b
    ORDER BY jaccard DESC, c.supp_a, c.supp_b
    LIMIT 50"""

  /** Degree histogram of the bipartite trade graph, per side — the
    * first statistic a graph database reports about a stored graph,
    * and the skew evidence that justifies salting decisions: two
    * aggregations (degree, then count per degree).
    */
  private def g15(s: SparkSession, dir: String): DataFrame = {
    val pairs = bipartitePairs(s, dir)
    val cd = pairs.groupBy(col("cust")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
      .withColumn("side", lit("customer"))
    val sd = pairs.groupBy(col("supp")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
      .withColumn("side", lit("supplier"))
    cd.unionAll(sd)
      .select(col("side"), col("degree"), col("n_nodes"))
      .orderBy(col("side"), col("degree"))
  }

  private val g15Sql = s"""
    WITH $bipairsCteSql,
    cd AS (SELECT 'customer' AS side, degree, count(*) AS n_nodes FROM (
      SELECT cust, count(*) AS degree FROM pairs GROUP BY cust) GROUP BY degree),
    sd AS (SELECT 'supplier' AS side, degree, count(*) AS n_nodes FROM (
      SELECT supp, count(*) AS degree FROM pairs GROUP BY supp) GROUP BY degree)
    SELECT side, degree, n_nodes FROM cd
    UNION ALL SELECT side, degree, n_nodes FROM sd
    ORDER BY side, degree"""

  // ---- g27: weighted label-propagation communities ---------------------
  /** Number of synchronous LPA rounds — fixed (not a convergence
    * probe) so the oracle can unroll them exactly, the g09/s10
    * pattern. Synchronous LPA can 2-cycle on bipartite-ish structure,
    * which a fixpoint probe would never exit; a fixed even/odd round
    * budget sidesteps that too.
    */
  private[graft] val LpaRounds = 4

  /** Weighted label propagation (Raghavan et al. 2007, "Near linear
    * time algorithm to detect community structures"), SEMI-SYNCHRONOUS
    * deterministic variant (the graph-coloring schedule of Cordasco &
    * Gargano 2010, "Community detection via semi-synchronous label
    * propagation" — public literature): init label(v) = v; each round
    * updates ONE side of the bipartite numbering (odd rounds the even/
    * customer nodes, even rounds the odd/supplier nodes) to the label
    * carrying the max total incident edge WEIGHT among its neighbors,
    * ties to the smallest label. Fully-synchronous LPA provably
    * 2-cycles on bipartite graphs — after any even round count each
    * side holds only same-side-origin labels, NO edge is ever
    * intra-community, and the weighted modularity is negative
    * (measured -0.063; the G27LpaSpec witness that forced this
    * variant). The one-side-per-round schedule is exactly the
    * color-class update of the semi-synchronous paper (a bipartite
    * graph 2-colors), keeps determinism (no async ordering to pin),
    * and lets labels mix across sides: measured modularity +0.44 at
    * the same round budget. Communities are what components (g05)
    * can't see — the trade graph is one giant connected component,
    * but LPA splits it by trade VOLUME affinity.
    *
    * Determinism: weights are BIGINT order counts, so the per-(node,
    * label) tally is an exact integer sum (no double partial-agg
    * hazard), and the argmax is `min(struct(-sw, lbl))` — largest
    * weight, then smallest label, one map-side-combining aggregate
    * (never a window/sort). Round r reads only round r-1's labels.
    *
    * Scale shape per round: one hash join of the label table against
    * the edge list (both keyed by node id) + two map-side-combining
    * aggregates — PageRank's exchange pattern exactly; rounds are
    * fixed, state is node-sized. The census join is the d17 rule:
    * groupBy + join back, no count-over-window on the skewed
    * community key.
    */
  private[graft] def lpaCommunities(nodes: DataFrame, symW: DataFrame,
      rounds: Int): DataFrame = {
    // r16: the weighted edge list is partitioned on its JOIN key (dst)
    // once and kept resident — the per-round side filter preserves the
    // partitioning, so each round exchanges only the label table.
    val e = Traversals.keyedResident(
      symW.select(col("src"), col("dst"), col("w")), "dst")
    var labels = nodes.select(col("node"), col("node").as("lbl"))
      .localCheckpoint()
    for (r <- 1 to rounds) {
      // the color class this round updates: odd rounds the even
      // (customer) nodes, even rounds the odd (supplier) nodes
      val side = if (r % 2 == 1) 0L else 1L
      // Only the updating side's winners survive the merge below,
      // so tally only edges whose src is on that side — halves the
      // join probe and both aggregates each round.
      val tally = e
        .where(col("src") % 2 === lit(side))
        .join(labels.select(col("node").as("dst"), col("lbl")), Seq("dst"))
        .groupBy(col("src").as("node"), col("lbl"))
        .agg(sum(col("w")).as("sw"))
      // r16: one union + min-combine replaces the separate winner
      // aggregate plus the left-join merge (two exchanges + a join
      // per round → one): carried labels ride with pri=1 and tallies
      // with pri=0, so an updating-side node takes its best tally
      // (largest weight, then smallest label — the same
      // min(struct(-sw, lbl)) argmax) and every other node keeps its
      // label (it has no tally rows: the side filter above).
      labels = labels
        .select(col("node"), lit(1).as("pri"), lit(0L).as("negw"), col("lbl"))
        .unionAll(tally.select(col("node"), lit(0).as("pri"),
          (lit(0L) - col("sw")).as("negw"), col("lbl")))
        .groupBy(col("node"))
        .agg(min(struct(col("pri"), col("negw"), col("lbl"))).as("b"))
        .select(col("node"), col("b.lbl").as("lbl"))
        .localCheckpoint()
    }
    e.unpersist(false)
    labels
  }

  /** g27: LPA communities of the weighted PREFERRED-PARTNER bipartite
    * graph (g26's subgraph: each customer's/supplier's top-2 partners
    * by trade volume, g11's 2k / 2k+1 node numbering) — the full
    * trade graphs are too dense for communities to exist (the
    * 25-nation graph is COMPLETE: LPA provably collapses it to one
    * label), while the sparse partner subgraph has real volume-
    * affinity structure and scales with SF. [[LpaRounds]] synchronous
    * rounds; output one row per node with its community and the
    * community's size.
    */
  private def g27(s: SparkSession, dir: String): DataFrame = {
    val sel = Traversals.prefSel(s, dir)
    val bi = sel.select((col("cust") * 2).as("src"),
      (col("supp") * 2 + 1).as("dst"), col("w"))
    val symW = bi.unionAll(
        bi.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      .localCheckpoint()
    val nodes = symW.select(col("src").as("node")).distinct()
    val labels = lpaCommunities(nodes, symW, LpaRounds)
    val census = labels.groupBy(col("lbl")).agg(count(lit(1)).as("community_size"))
    // hash join, not sort-merge: community sizes are power-law and SMJ
    // would sort the node table by the skewed community key (the d17
    // census rule)
    labels.join(census.hint("SHUFFLE_HASH"), Seq("lbl"))
      .select(col("node"), col("lbl").as("community"), col("community_size"))
      .orderBy(col("node"))
  }

  private val g27Sql: String = {
    val rounds = (1 to LpaRounds).map { i =>
      val side = if (i % 2 == 1) 0 else 1
      s"""t$i AS (
      SELECT s.src AS node, p.lbl, CAST(SUM(s.w) AS BIGINT) AS sw
      FROM symw s JOIN l${i - 1} p ON p.node = s.dst
      GROUP BY 1, 2),
    w$i AS (
      SELECT node, lbl FROM (
        SELECT node, lbl, row_number() OVER (PARTITION BY node
          ORDER BY sw DESC, lbl) AS rn FROM t$i)
      WHERE rn = 1),
    l$i AS MATERIALIZED (
      SELECT p.node,
        CASE WHEN p.node % 2 = $side THEN COALESCE(w.lbl, p.lbl)
          ELSE p.lbl END AS lbl
      FROM l${i - 1} p LEFT JOIN w$i w USING (node))"""
    }.mkString(",\n    ")
    s"""
    WITH ${GraphSql.prefCtes},
    bi AS MATERIALIZED (
      SELECT cust * 2 AS src, supp * 2 + 1 AS dst, CAST(w AS BIGINT) AS w
      FROM sel),
    symw AS MATERIALIZED (
      SELECT src, dst, w FROM bi
      UNION ALL SELECT dst AS src, src AS dst, w FROM bi),
    lnodes AS (SELECT DISTINCT src AS node FROM symw),
    l0 AS (SELECT node, node AS lbl FROM lnodes),
    $rounds,
    c AS (SELECT lbl, count(*) AS community_size FROM l$LpaRounds GROUP BY lbl)
    SELECT l.node, l.lbl AS community, c.community_size
    FROM l$LpaRounds l JOIN c USING (lbl)
    ORDER BY node"""
  }

  val ops: Seq[Op] = Seq(
    Op("g27_lpa_communities", g27, Some(g27Sql)),
    Op("g05_connected_components", g05, Some(g05Sql)),
    Op("g11_bipartite_cc", g11, Some(g11Sql)),
    Op("g12_kcore_bipartite", g12, Some(g12Sql)),
    Op("g13_supplier_overlap", g13, Some(g13Sql)),
    Op("g15_degree_histogram", g15, Some(g15Sql)))
}
