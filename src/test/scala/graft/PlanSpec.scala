package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: the properties that make these
  * plans survive a 100× scale-up are asserted, not assumed — filter
  * pushdown reaching the parquet scan, column pruning, broadcast of
  * dimension tables, and no accidental cartesian/nested-loop joins
  * anywhere in the registry.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.sparkPlan.toString

  test("q06 pushes its filters into the parquet scan and prunes columns") {
    val plan = planOf("q06_forecast_filter")
    // the selective predicates must reach the scan, not sit in a
    // post-scan Filter only
    assert(plan.contains("PushedFilters: ["), plan.linesIterator.take(25).mkString("\n"))
    assert("PushedFilters: \\[[^\\]]*(GreaterThan|LessThan|IsNotNull)".r
      .findFirstIn(plan).nonEmpty, "no predicate pushed to the lineitem scan")
    // q06 touches 4 of lineitem's 16 columns; a scan reading l_comment
    // would mean pruning regressed
    assert(!plan.contains("l_comment"), "column pruning lost: scan reads l_comment")
  }

  test("dimension joins broadcast the small side") {
    // q05's nation/region and q03's customer side are classic
    // broadcast dims; a sort-merge join there would shuffle the fact
    // table on a dimension key for nothing
    assert(planOf("q05_nation_revenue").contains("BroadcastHashJoin"))
    assert(planOf("q03_top_orders").contains("BroadcastHashJoin"))
  }

  /** Ops where a cartesian/nested-loop join IS the right plan: either
    * the documented all-pairs design (brute-force baselines anchoring
    * recall gates) or a broadcast of a provably tiny frame (scalar
    * aggregates, fixed-size boundary/centroid tables) — the pattern
    * "broadcast small dims" explicitly calls for. Everything else in
    * the registry must plan with equi-joins only.
    */
  private val allPairsByDesign = Set(
    "s01_knn_bruteforce", // exact baseline for s05's recall gate
    "s04_knn_graph",      // exact KNN graph, denominator of s07
    "s05_ann_recall",     // composes s01's plan
    "s08_quantized_knn",  // probe-set brute force, composes s01's plan
    "q16_spend_deciles",  // broadcast compare vs a 10-row boundary frame
    "q17_set_ops",        // crossJoin of three 1-row scalar aggregates
    "e05_funnel",         // scalar per-stage count assembly
    "s03_ivf_label",      // distance probe vs the tiny centroid table
    "t06_tfidf",          // scalar corpus doc-count join
    "t07_vocab_coverage", // scalar total-token join
    "t15_rarity_score",   // same scalar total-token join as t07
    "t12_heavy_hitters",  // scalar total-count join vs ≤k candidates
    "g10_adjacency_roundtrip" // dense 25x25 matrix codec, fixed size
  )

  /** Ops whose ONLY permitted nested-loop is the centroid probe: a
    * BNLJ is fine against the k-row TRAINED centroid frame (k = 10 by
    * construction), but these ops must not be blanket-exempt — a
    * regression that nested-loops the corpus side must still fail. The
    * targeted assertion: exactly one BNLJ, and its build side reads
    * the memoized k-means centroid table (graft_kmcent), nothing
    * corpus-sized.
    */
  // s13 composes s12's probe but checkpoints its per-query summary, so
  // its FINAL plan is truncated — the general no-BNLJ test covers it;
  // R16OpsSpec pins the pre-checkpoint rerank plan explicitly.
  private val centroidProbeOnly = Set("s10_ivf_kmeans", "s12_ivfpq")

  centroidProbeOnly.foreach { name =>
    test(s"$name nested-loops ONLY against the k-row centroid table") {
      import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
      import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.sparkPlan
      assert(!plan.toString.contains("CartesianProduct"), s"CartesianProduct in $name")
      val bnljs = plan.collect { case b: BroadcastNestedLoopJoinExec => b }
      // s12 instantiates the probe subplan twice (cell filter + qc
      // scalar) — each BNLJ must individually build on the centroids
      assert(bnljs.nonEmpty && bnljs.size <= 2,
        s"$name: expected only centroid-probe BNLJs, found ${bnljs.size}")
      bnljs.foreach { b =>
        val build = b.buildSide match {
          case BuildRight => b.right
          case BuildLeft  => b.left
        }
        assert(build.toString.contains("graft_kmcent"),
          s"a BNLJ build side of $name is not the trained-centroid table:\n$build")
      }
    }
  }

  Registry.all.map(_.name).filterNot(allPairsByDesign ++ centroidProbeOnly).foreach { name =>
    test(s"$name plans without cartesian or nested-loop joins") {
      val plan = planOf(name)
      assert(!plan.contains("CartesianProduct"), s"CartesianProduct in $name")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"BroadcastNestedLoopJoin in $name")
    }
  }
}
