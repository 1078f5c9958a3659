package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Strongly connected components at cluster scale: pivot-based
  * forward-backward (FW-BW) decomposition — the scale sibling the g24
  * closure-pair envelope has always documented (Fleischer/Hendrickson/
  * Pinar's divide-and-conquer SCC, the standard distributed SCC
  * algorithm; public references: the FW-BW paper and Spark-GraphX-style
  * implementations of it).
  *
  * Why g24's shape can't scale: the closure-pair set is O(V · reach)
  * rows — quadratic on a dense reachability structure — and the SCC
  * query pays it twice (closure ⋈ transpose). FW-BW never materializes
  * reachability PAIRS: per round it materializes only per-partition
  * reachable SETS (≤ |V| rows each), so nothing in the plan is ever
  * larger than O(V) per round.
  *
  * One round, per live partition (all partitions advance together in
  * the same DataFrames, like g07's all-sources-at-once closure loop):
  *
  *   1. pivot = MIN node id in the partition (deterministic — no RNG
  *      to coordinate across executors, and it makes the emitted label
  *      the SCC's min id: the pivot's SCC always contains the
  *      partition's min node, see below);
  *   2. FW = BFS from the pivot over forward edges, confined to the
  *      partition; BW = the same over reversed edges;
  *   3. FW ∩ BW is exactly the pivot's SCC (mutual reachability within
  *      a partition equals mutual reachability in the whole graph —
  *      FW-BW's invariant: every SCC is wholly inside one partition,
  *      because the three-way split below never cuts a cycle);
  *   4. label it `scc_id = pivot`; split the remainder three ways —
  *      FW∖SCC, BW∖SCC, neither — as the next round's partitions.
  *
  * Label determinism: the pivot is the partition's min node and a
  * member of its own SCC, and every node of that SCC is in the same
  * partition, so `pivot = min(SCC)` — exactly g24's
  * `scc_id(v) = min(v, min{u : u ⇄ v})` contract, which is what lets
  * SccSpec pin this implementation bit-equal to the registered g24 on
  * any graph.
  *
  * Partition ids stay distributed and collision-free with no driver
  * coordination: a child partition's id is `pivot · 4 + branch`
  * (branch ∈ {1, 2, 3}) — pivots are distinct across partitions (a
  * pivot belongs to its own partition) and |Δpivot| · 4 > |Δbranch|,
  * so the affine code is injective; the whole namespace is remade
  * every round, so cross-round reuse is harmless. (Envelope: node ids
  * up to 2^61 — the id arithmetic is LongType.)
  *
  * Scale shape: every step is a frontier equi-join / semi-join keyed
  * by (part, node) — hash-uniform, nothing broadcast, nothing
  * driver-sized (the loop conditions are `isEmpty` probes, the
  * per-round lineage is truncated by localCheckpoint exactly like
  * g03/g14's loops). Rounds: expected O(log n) on random/power-law
  * graphs (each round removes every live partition's pivot SCC and
  * the three-way split separates the rest); the adversarial worst
  * case (a path graph) degrades to O(n) rounds — the documented
  * trade every pivot-based SCC shares. Shuffle count per round is
  * bounded by the FW/BW eccentricity of the pivots, not by |V|.
  *
  * Reference behavior re-expressed: the reference engine has no SCC
  * op (its graphs are its clients' adjacency files); this is part of
  * the EXTENDED analytics surface, the directed-census operator d15's
  * trade-flow questions need (g24's scaladoc, Traversals.scala).
  */
object Scc {

  /** (node, scc_id) for every node in `nodes` (isolated nodes label
    * themselves), with `scc_id` = the SCC's min node id — bit-equal to
    * g24's labels. `nodes` must be distinct (node); `edges` (src, dst)
    * may carry duplicates (deduped on entry).
    *
    * Each outer round runs TRIM to fixpoint first — the standard
    * companion optimization every published FW-BW implementation
    * carries: a node with no in-edge (or no out-edge) among the live
    * nodes of its own partition can sit on no cycle, so it is its own
    * SCC and is labeled immediately, one bulk join per pass instead
    * of one pivot round per node. On real graphs (and on sparse
    * random ones) the acyclic fringe is most of the graph, and trim
    * dissolves it in a handful of passes, leaving the pivot rounds to
    * the cyclic cores only — without it, a long branch-3 chain
    * degrades the round count toward O(#SCCs).
    */
  def fwbw(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).distinct().localCheckpoint()
    // ONE direction-tagged edge table: d=1 forward, d=2 reversed — the
    // FW and BW waves ride the same BFS loop, so the inner loop runs
    // max(depth_fw, depth_bw) rounds instead of their sum
    val dirE = e.withColumn("d", lit(1))
      .unionAll(e.select(col("dst").as("src"), col("src").as("dst")).withColumn("d", lit(2)))
      .localCheckpoint()
    var active = nodes.select(col("node").cast("long").as("node"), lit(0L).as("part"))
      .localCheckpoint()
    var labeled = active.select(col("node"), col("node").as("scc_id")).filter(lit(false))
      .localCheckpoint()

    // multi-pivot BFS confined to partitions: frontier ⋈ dir-edges,
    // then a semi-join against the live partition assignment keeps the
    // wave inside its own partition (an edge leaving the partition
    // leads to a node some earlier round already labeled or split away
    // — following it would break the FW-BW invariant)
    def reach(pivots: DataFrame, act: DataFrame): DataFrame = {
      var visited = pivots
        .select(col("part"), col("pivot").as("node"), explode(array(lit(1), lit(2))).as("d"))
        .localCheckpoint()
      var frontier = visited
      while (!frontier.isEmpty) {
        val next = frontier.join(dirE,
            frontier("node") === dirE("src") && frontier("d") === dirE("d"))
          .select(frontier("part"), dirE("dst").as("node"), frontier("d")).distinct()
          .join(act, Seq("part", "node"), "left_semi")
          .join(visited, Seq("part", "node", "d"), "left_anti")
          .localCheckpoint()
        // lazy union of checkpointed hops — the anti-join above reads
        // it as a cheap union scan; one checkpoint at return, not one
        // job per hop
        visited = visited.unionAll(next)
        frontier = next
      }
      visited.localCheckpoint()
    }

    while (!active.isEmpty) {
      // ---- trim to fixpoint: peel source/sink nodes as singleton SCCs.
      // Each pass materializes only NODE-sized frames: the live-edge
      // join stays lazy inside one plan whose output is the per-node
      // (has_in, has_out) flag table — the exploded endpoint stream is
      // narrow and map-side-combines down to node count before the
      // shuffle, so a pass never checkpoints (or exchanges) anything
      // edge-sized. (The first cut checkpointed the live edge table
      // per pass; at sf3 that alone made trim the dominant cost.)
      var trimming = true
      while (trimming) {
        val flags = e
          .join(active.select(col("node").as("src"), col("part")), Seq("src"))
          .join(active.select(col("node").as("dst"), col("part")), Seq("dst", "part"))
          .select(col("part"), explode(array(
            struct(col("src").as("node"), lit(1).as("o"), lit(0).as("i")),
            struct(col("dst").as("node"), lit(0).as("o"), lit(1).as("i")))).as("x"))
          .select(col("part"), col("x.node").as("node"), col("x.o").as("o"), col("x.i").as("i"))
          .groupBy(col("part"), col("node"))
          .agg(max(col("o")).as("has_out"), max(col("i")).as("has_in"))
        val kept = active.join(
            flags.filter(col("has_out") === 1 && col("has_in") === 1)
              .select(col("part"), col("node")),
            Seq("part", "node"), "left_semi")
          .localCheckpoint()
        val trimmed = active.join(kept, Seq("part", "node"), "left_anti")
        trimming = !trimmed.isEmpty
        if (trimming) {
          // lazy accumulate — trimmed is a cheap diff of two
          // checkpointed frames; one checkpoint after the fixpoint
          // bounds the lineage without paying a job per pass
          labeled = labeled.unionAll(trimmed.select(col("node"), col("node").as("scc_id")))
          active = kept
        }
      }
      labeled = labeled.localCheckpoint()
      if (!active.isEmpty) {
        // ---- one pivot FW-BW round over the surviving cyclic cores
        val pivots = active.groupBy(col("part"))
          .agg(min(col("node")).as("pivot")).localCheckpoint()
        val vis = reach(pivots, active)
        val fw = vis.filter(col("d") === 1).select(col("part"), col("node"))
        val bw = vis.filter(col("d") === 2).select(col("part"), col("node"))
        val scc = fw.join(bw, Seq("part", "node"), "left_semi").localCheckpoint()
        labeled = labeled.unionAll(
          scc.join(pivots, Seq("part")).select(col("node"), col("pivot").as("scc_id")))
          .localCheckpoint()
        // three-way split of the unlabeled remainder; scc ⊆ fw ∩ bw, so
        // a remainder node is in at most ONE of fw/bw and the branch
        // code is well-defined
        active = active.join(scc, Seq("part", "node"), "left_anti")
          .join(fw.withColumn("in_fw", lit(1)), Seq("part", "node"), "left")
          .join(bw.withColumn("in_bw", lit(1)), Seq("part", "node"), "left")
          .join(pivots, Seq("part"))
          .select(col("node"),
            (col("pivot") * 4 +
              when(col("in_fw") === 1, 1)
                .when(col("in_bw") === 1, 2)
                .otherwise(3)).as("part"))
          .localCheckpoint()
      }
    }
    labeled
  }
}
