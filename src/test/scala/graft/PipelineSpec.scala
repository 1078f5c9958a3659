package graft

import graft.sources.JsonlIO
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end composition: the individual operators are each
  * oracle-checked, this spec checks they chain into the curation
  * pipeline a user would actually run — dedup clustering → quality
  * survivor selection → filter → JSONL sink → read-back.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("curation pipeline: dedup survivors -> quality filter -> JSONL sink") {
    val docs = Tables(spark, sf, "documents")
    val nDocs = docs.count()

    // survivor selection over dup clusters (d08 ranks only clustered
    // docs; unclustered docs are implicitly keepers)
    val ranked = SparkEntry.queries("d08_quality_survivor")(spark, sf)
    val losers = ranked.filter(col("keep") === 0).select(col("doc_id"))
    val nLosers = losers.count()
    assert(nLosers > 0, "fixture should contain near-duplicates")

    val curated = docs.join(losers, Seq("doc_id"), "left_anti")
    assert(curated.count() == nDocs - nLosers)

    // quality gate on the curated set
    val quality = graft.text.TextOps.qualityScores(spark, sf)
      .select(col("doc_id"), col("quality_score"))
    val gated = curated.join(quality, Seq("doc_id"))
      .filter(col("quality_score") >= 0.2)
    val nGated = gated.count()
    assert(nGated > 0 && nGated <= nDocs - nLosers)

    // sink + read-back preserves the curated corpus exactly
    val out = java.nio.file.Files.createTempDirectory("curated").toString
    JsonlIO.write(gated, s"$out/corpus")
    val back = JsonlIO.read(spark, s"$out/corpus", gated.schema).cache()
    assert(back.filter(col("_corrupt").isNotNull).count() == 0)
    assert(back.count() == nGated)
    assert(back.select(countDistinct(col("doc_id"))).head().getLong(0) == nGated)
    back.unpersist()
  }
}
