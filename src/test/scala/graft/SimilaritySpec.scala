package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ANN KNN-graph (s06) is only shippable with a quantified recall
  * against the exact build (s04) — this is the gate stating that
  * number, at both small scale factors, against the stated target.
  */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  // The target the 16-table × 1-flip-probe family was calibrated to
  // on the real embeddings (see Similarity.s06 scaladoc).
  private val RecallTarget = 0.80

  Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { sf =>
    test(s"s06 ANN KNN graph reaches avg recall@3 >= $RecallTarget at $sf") {
      val recall = SparkEntry.queries("s07_knn_recall")(spark, sf)
        .agg(avg(col("recall_at_3"))).head().getDouble(0)
      assert(recall >= RecallTarget, f"avg recall@3 $recall%.3f < $RecallTarget")
    }
  }

  test("s06 emits at most 3 neighbors per query, ranked consistently with s04 on hits") {
    val sf = "/root/testdata/sf0.001"
    val ann = SparkEntry.queries("s06_knn_graph_ann")(spark, sf)
    val perQuery = ann.groupBy(col("query_id")).count()
    assert(perQuery.filter(col("count") > 3).isEmpty)
    // every (query, neighbor) edge s06 shares with s04 carries the
    // identical exact cosine — the re-rank is exact, only candidate
    // GENERATION is approximate
    val exact = SparkEntry.queries("s04_knn_graph")(spark, sf)
      .select(col("query_id"), col("neighbor_id"), col("cos").as("cos_exact"))
    val joined = ann.join(exact, Seq("query_id", "neighbor_id"))
    assert(joined.filter(col("cos") =!= col("cos_exact")).isEmpty)
  }
}
