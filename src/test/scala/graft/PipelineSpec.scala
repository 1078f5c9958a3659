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

  // d12 is d05's registered scale path (ANN candidates -> exact cosine
  // filter): its output must be a SUBSET of the exact near-dup pairs
  // (same final filters, approximate candidate generation only), and
  // the recall against the exact oracle must clear the same 0.80 gate
  // the s06/s07 family was calibrated to — on every shipped corpus
  // (measured 0.83 / 0.85 / 0.81).
  Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
    test(s"d12 ANN near-dup is a subset of exact d05 with recall >= 0.80 at $dir") {
      def pairs(name: String) =
        SparkEntry.queries(name)(spark, dir)
          .select(col("vec_a"), col("vec_b"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = pairs("d05_embedding_neardup")
      val ann = pairs("d12_neardup_ann")
      assert(ann.subsetOf(exact), s"${(ann -- exact).size} pairs not in the exact oracle")
      val recall = ann.size.toDouble / exact.size
      info(f"recall = $recall%.3f (${ann.size}/${exact.size})")
      assert(recall >= 0.80, f"d12 recall $recall%.3f < 0.80")
    }
  }

  test("d12 bucketed plan: bit-equal to the broadcast plan, zero broadcasts") {
    val dir = "/root/testdata/sf0.01"
    import graft.functions.VectorFunctions.floatNorm
    val e = Tables(spark, dir, "embeddings").withColumn("nrm", floatNorm(col("embedding")))
    val (bits, tables) = sim.Similarity.annParams(e.count())
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = dedup.Dedup.d12Bucketed(spark, dir, bits, tables)
      val b = bucketed.collect().toSeq
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastExchange"),
        "bucketed d12 plan still contains a broadcast")
      val a = dedup.Dedup.d12Broadcast(e, bits, tables).collect().toSeq
      assert(a == b, s"plans diverge: broadcast ${a.size} rows, bucketed ${b.size}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

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

  test("MinHashIndex delta append equals full rebuild on the appended corpus") {
    import graft.dedup.{Dedup, MinHashIndex}
    val docs = Tables(spark, sf, "documents").select("doc_id", "text")
    // split the corpus into yesterday's crawl and two daily increments
    val dayZero = docs.filter(col("doc_id") % 5 < 3)
    val dayOne = docs.filter(col("doc_id") % 5 === 3)
    val dayTwo = docs.filter(col("doc_id") % 5 === 4)

    val idxDir = java.nio.file.Files.createTempDirectory("mhindex").toString
    val idx = new MinHashIndex(spark, idxDir)
    intercept[java.util.NoSuchElementException](idx.signatures())
    idx.build(dayZero)
    assert(idx.version.contains(1L))

    def sigSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    def candSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def assertEqualsRebuild(corpus: org.apache.spark.sql.DataFrame): Unit = {
      val fullSig = Dedup.minhashes(corpus)
      assert(sigSet(idx.signatures()) == sigSet(fullSig))
      assert(candSet(idx.candidates()) == candSet(Dedup.candidates(fullSig)))
    }

    def dirBytes(rel: String): Long = {
      val p = java.nio.file.Paths.get(s"$idxDir/$rel")
      if (!java.nio.file.Files.exists(p)) 0L
      else {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(java.nio.file.Files.size).sum
      }
    }

    // delta-refresh day one: only dayOne is shingled, candidates extend
    // by new-vs-all band matches — must equal the from-scratch index
    idx.append(dayOne)
    assert(idx.version.contains(2L))
    assertEqualsRebuild(dayZero.unionByName(dayOne))

    // chained second append stays equal
    idx.append(dayTwo)
    assert(idx.version.contains(3L))
    assertEqualsRebuild(docs)

    // replaying an overlapping batch is idempotent (first-writer-wins
    // per doc_id): nothing changes but the version
    idx.append(dayTwo)
    assert(idx.version.contains(4L))
    assertEqualsRebuild(docs)

    // WRITES are O(delta), not O(index): each append persisted only its
    // delta segment, so dayOne's segment (20% of docs) is smaller than
    // the base build (60%), the idempotent replay's segment (empty
    // delta) is smaller still, and the version dirs are manifest-sized.
    val base = dirBytes("seg/s1")
    assert(base > 0)
    assert(dirBytes("seg/s2") < base,
      "append must write a delta-sized segment, not rewrite the index")
    assert(dirBytes("seg/s4") < dirBytes("seg/s2"),
      "an empty delta's segment must be near-empty")
    assert(dirBytes("v4") < 4096, "a version publish is manifest-sized")

    // compaction merges the four per-ingest segments into ONE — the
    // sidecar/footer growth bound for a long-running crawl — and the
    // served tables are unchanged (segments are disjoint, so the
    // merge is exactly the union the old manifest served)
    assert(idx.compact() == 5L)
    assertEqualsRebuild(docs)
    val compactManifest = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$idxDir/v5/segments"))
    assert(compactManifest.size == 1,
      s"compaction must publish one segment, got $compactManifest")

    // appends continue on top of the compacted layout
    idx.append(dayTwo) // idempotent empty delta
    assert(idx.version.contains(6L))
    assertEqualsRebuild(docs)

    // retention sweeps every pre-compaction version and their segments
    assert(idx.vacuum(1).toSet == Set(1L, 2L, 3L, 4L, 5L))
    assertEqualsRebuild(docs)
    import scala.jdk.CollectionConverters._
    val liveSegs = java.nio.file.Files.list(
      java.nio.file.Paths.get(s"$idxDir/seg")).iterator().asScala
      .map(_.getFileName.toString).toSet
    assert(liveSegs == Set("s5", "s6"),
      s"pre-compaction segments must be swept, got $liveSegs")

    // a markerless crash leftover (writer died between the sig and
    // cand writes) is invisible: version() stays at the newest COMPLETE
    // snapshot and the next append publishes right past the garbage
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$idxDir/v9/sig"))
    assert(idx.version.contains(6L))
    assertEqualsRebuild(docs)
    idx.append(dayTwo) // still idempotent, now writes v7
    assert(idx.version.contains(7L))
    assertEqualsRebuild(docs)
  }
}
