package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sketch ops are only useful if their estimates track the exact
  * counts they replace — these gates compare g18/g19 against the exact
  * closure (g07) and exact component sizes (bipartiteComponents) on
  * graphs small enough to know the truth.
  *
  * FM with R=16 registers has σ ≈ 28%; the factor-3 bound is ~4σ in
  * log space, tight enough to catch a broken hash (the first, replica-
  * in-low-bits attempt saturated every estimate near 1.8 regardless of
  * true count) while never flaking on a correct one.
  */
class ReachSketchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"
  private val Phi = 0.77351

  private def assertWithinFactor(rows: Seq[(Long, Double, Long)], factor: Double): Unit = {
    val bad = rows.filter { case (_, est, exact) =>
      est > exact * factor || est < exact / factor }
    assert(bad.isEmpty, s"estimates off by >${factor}x: $bad")
  }

  test("g18 estimates track exact g07 reachability counts (factor 3, exact >= 8)") {
    val exact = SparkEntry.queries("g07_reachability")(spark, sf)
      .select(col("node"), col("n_reachable"))
    val est = SparkEntry.queries("g18_reach_sketch")(spark, sf)
      .withColumn("est", pow(lit(2.0), col("est_log2")) / lit(Phi))
      .select(col("node"), col("est"))
    val rows = exact.join(est, Seq("node"))
      .filter(col("n_reachable") >= 8)
      .collect()
      .map(r => (r.getAs[Int]("node").toLong, r.getAs[Double]("est"),
        r.getAs[Long]("n_reachable")))
      .toSeq
    assert(rows.nonEmpty, "fixture has no node reaching >= 8 others")
    assertWithinFactor(rows, 3.0)
  }

  test("g20 sketch closeness tracks exact g14 on the nation graph (factor 3)") {
    val exact = SparkEntry.queries("g14_closeness")(spark, sf)
      .select(col("node"), col("n_reachable"), col("sum_dist"))
    val sym = graph.TradeGraph.symEdges(
      graph.TradeGraph.edgesTable(spark, sf)).localCheckpoint()
    val est = graph.ReachSketch.sketchCloseness(
      sym, graph.TradeGraph.nodes(spark, sf))
    val rows = exact.join(est, Seq("node"))
      .filter(col("n_reachable") >= 8)
      .collect()
      .map(r => (r.getAs[Int]("node").toLong,
        r.getAs[Double]("est_n"), r.getAs[Long]("n_reachable"),
        r.getAs[Double]("est_sum_dist"), r.getAs[Long]("sum_dist")))
      .toSeq
    assert(rows.nonEmpty, "fixture has no node reaching >= 8 others")
    // reachable-count estimate: the same gate g18/g19 pass
    assertWithinFactor(rows.map(r => (r._1, r._2, r._3)), 3.0)
    // distance-sum estimate: per-round diffs of correlated estimates
    // are noisier than the final count, but factor 3 still holds and
    // still catches a broken hash or a mis-telescoped sum
    assertWithinFactor(rows.map(r => (r._1, r._4, r._5)), 3.0)
  }

  test("g19 estimates track exact bipartite component sizes (factor 3, size >= 8)") {
    val comps = graph.Components.bipartiteComponents(
      graph.Components.bipartitePairs(spark, sf))
    val sizes = comps.groupBy(col("comp")).agg(count(lit(1)).as("csize"))
    val exact = comps.join(sizes, Seq("comp")).select(col("node"), col("csize"))
    val est = SparkEntry.queries("g19_reach_sketch_bipartite")(spark, sf)
      .withColumn("est", pow(lit(2.0), col("est_log2")) / lit(Phi))
      .select(col("node"), col("est"))
    val rows = exact.join(est, Seq("node"))
      .filter(col("csize") >= 8)
      .collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Double]("est"), r.getAs[Long]("csize")))
      .toSeq
    assert(rows.nonEmpty, "fixture has no component of size >= 8")
    assertWithinFactor(rows, 3.0)
  }
}
