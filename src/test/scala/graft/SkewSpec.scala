package graft

import graft.graph.Components
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The degree-threshold salt switch in g13's co-customer build must be
  * invisible in the output: hot/cold is a partition of customers, so
  * salted-hot ∪ plain-cold equals the unsplit self-join for ANY
  * threshold. Proven here live on real pairs and on an extreme-skew
  * fixture (one customer holding 30% of all edges — the shape AQE's
  * partition splitting alone can't fix, since one grouping key must
  * still meet on one reducer without the salt).
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def counts(pairs: org.apache.spark.sql.DataFrame, threshold: Int) =
    Components.coCustomerCounts(pairs, threshold, salt = 8)
      .orderBy(col("supp_a"), col("supp_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("salted and unsalted co-customer counts agree on real pairs") {
    val pairs = Components.bipartitePairs(spark, sf)
    val allCold = counts(pairs, Int.MaxValue)
    val allHot = counts(pairs, 0)
    val mixed = counts(pairs, 48)
    assert(allCold.nonEmpty)
    assert(allHot == allCold)
    assert(mixed == allCold)
  }

  test("measured skew engages on the extreme fixture, not on uniform pairs") {
    import spark.implicits._
    // Near-uniform real trade graph: max/median degree well under the
    // SkewRatio, so the measured decision must choose the plain join.
    val real = Components.bipartitePairs(spark, sf)
    assert(Components.measuredSaltThreshold(real).isEmpty)
    // One customer holding 200 of ~500 edges: max/median >= ratio, so
    // salting engages, and only for the outlier (threshold > background
    // degree 3).
    val hot = (1L to 200L).map(sp => (999L, sp))
    val cold = for (c <- 1L to 100L; k <- 0L to 2L) yield (c, (c * 7 + k * 13) % 50 + 1)
    val skewed = (hot ++ cold).toDF("cust", "supp")
    val t = Components.measuredSaltThreshold(skewed)
    assert(t.nonEmpty && t.get > 3 && t.get < 200)
  }

  test("salted and unsalted agree on an extreme-skew fixture") {
    import spark.implicits._
    // customer 999 buys from 200 suppliers; 100 background customers
    // with 3 suppliers each — the hot key carries ~200²/2 of the pairs
    val hot = (1L to 200L).map(sp => (999L, sp))
    val cold = for (c <- 1L to 100L; k <- 0L to 2L) yield (c, (c * 7 + k * 13) % 50 + 1)
    val pairs = (hot ++ cold).toDF("cust", "supp")
    val unsalted = counts(pairs, Int.MaxValue)
    val salted = counts(pairs, 10)
    assert(unsalted.nonEmpty)
    assert(salted == unsalted)
  }

  test("sf1 scale evidence: measured switch fires on an injected hot key, isolates it, matches plain") {
    // Gated on the dev-generated sf1 corpus (tools/gen_sf.py). Two
    // claims at 10x-sf0.1 pair volume (~300k distinct (cust,supp)
    // edges): (a) the driver-shaped corpus is near-uniform, so the
    // measured decision stays OFF — the common case pays exactly one
    // self-join; (b) injecting ONE aggregator-shaped customer covering
    // 2000 suppliers (the guaranteed shape of a 100 TB marketplace
    // corpus) flips the decision ON, the derived threshold isolates
    // exactly that key into the salted branch, and the salted union
    // still equals the plain self-join on the full co-customer
    // aggregate. Wall-time evidence for the tail bound lives in
    // docs/SCALE_EVIDENCE_r10.md (a spec must not assert timings).
    val sf = "/tmp/graft_testdata/sf1"
    assume(new java.io.File(s"$sf/orders.parquet").exists(),
      "sf1 corpus not generated on this host")
    import spark.implicits._
    val real = Components.bipartitePairs(spark, sf)
      .select(col("cust"), col("supp"))
    assert(Components.measuredSaltThreshold(real).isEmpty,
      "near-uniform sf1 degrees must keep the salt switch off")
    val hotCust = 100000000L
    val hot = (1L to 2000L).map(sp => (hotCust, sp)).toDF("cust", "supp")
    val skewed = real.unionAll(hot)
    val t = Components.measuredSaltThreshold(skewed)
    assert(t.nonEmpty, "one 2000-degree key must flip the measured switch on")
    // the hot/cold split fires for exactly the injected key
    val hotKeys = skewed.groupBy(col("cust")).agg(count(lit(1)).as("d"))
      .filter(col("d") > t.get).select(col("cust"))
      .collect().map(_.getLong(0)).toSeq
    assert(hotKeys == Seq(hotCust),
      s"threshold ${t.get} must isolate only the injected key, got $hotKeys")
    // equality at volume, compared on aggregates (the hot key alone
    // contributes ~2M co-customer pairs — too many rows to collect)
    def agg(threshold: Int) =
      Components.coCustomerCounts(skewed, threshold, salt = 8)
        .agg(count(lit(1)), sum(col("n_common")), max(col("n_common")))
        .collect().head.toSeq
    assert(agg(t.get) == agg(Int.MaxValue))
  }

  test("g13 output is identical with the salt switch disabled") {
    val expected = SparkEntry.queries("g13_supplier_overlap")(spark, sf).collect().toSeq
    val pairs = Components.bipartitePairs(spark, sf)
    val deg = pairs.groupBy(col("supp")).agg(count(lit(1)).as("deg"))
    val plain = Components.coCustomerCounts(pairs, Int.MaxValue, 8)
      .join(deg.toDF("supp_a", "deg_a"), Seq("supp_a"))
      .join(deg.toDF("supp_b", "deg_b"), Seq("supp_b"))
      .withColumn("jaccard", col("n_common").cast("double") /
        (col("deg_a") + col("deg_b") - col("n_common")).cast("double"))
      .select(col("supp_a"), col("supp_b"), col("n_common"),
        col("deg_a"), col("deg_b"), col("jaccard"))
      .orderBy(col("jaccard").desc, col("supp_a"), col("supp_b"))
      .limit(50).collect().toSeq
    assert(expected == plain)
  }
}
