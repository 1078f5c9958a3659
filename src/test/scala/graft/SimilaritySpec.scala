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

  // The target the calibrated bits/tables family (Similarity.annParams)
  // was measured against on the real embeddings: the registered s06
  // derives (bits, tables) from count(embeddings), so these gates
  // exercise 8/24 (n=500), 9/32 (n=2000) — measured 0.87–0.89.
  private val RecallTarget = 0.80

  // sf0.1 included: 4x the vectors of sf0.01 — the gate must hold as n
  // grows, not just on the calibration corpus (measured 0.88 at sf0.1)
  Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { sf =>
    test(s"s06 ANN KNN graph reaches avg recall@3 >= $RecallTarget at $sf") {
      val recall = SparkEntry.queries("s07_knn_recall")(spark, sf)
        .agg(avg(col("recall_at_3"))).head().getDouble(0)
      assert(recall >= RecallTarget, f"avg recall@3 $recall%.3f < $RecallTarget")
    }
  }

  // int8 quantization is a lossy code; the gate is the measured price
  // (0.98 at sf0.01) with slack for corpus growth, and the cosine
  // distortion bound catches a broken quantizer (wrong scale, signed
  // overflow) even when rank order survives by luck
  Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { sf =>
    test(s"s08 int8-quantized top-5 holds recall >= 0.8 and distorts cosine < 0.05 at $sf") {
      val out = SparkEntry.queries("s08_quantized_knn")(spark, sf)
        .select(col("query_id"), col("neighbor_id"), col("qcos"), col("recall_at_5"))
        .collect()
      val recall = out.map(r => r.getLong(0) -> r.getDouble(3)).toMap.values
      assert(recall.sum / recall.size >= 0.80,
        f"avg quantized recall ${recall.sum / recall.size}%.3f < 0.80")
      // exact float cosine for the emitted pairs
      val e = Tables(spark, sf, "embeddings")
        .withColumn("nrm", graft.functions.VectorFunctions.floatNorm(col("embedding")))
      val exactCos = e.select(col("vec_id").as("qid"), col("embedding").as("eq"), col("nrm").as("nq"))
        .join(e.select(col("vec_id").as("nid"), col("embedding").as("ec"), col("nrm").as("nc")),
          col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"),
          (graft.functions.VectorFunctions.floatDot(col("eq"), col("ec")) /
            (col("nq") * col("nc"))).as("cos"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      out.foreach { r =>
        val d = math.abs(r.getDouble(2) - exactCos((r.getLong(0), r.getLong(1))))
        assert(d < 0.05, f"pair (${r.getLong(0)},${r.getLong(1)}): |qcos-cos| = $d%.4f")
      }
    }
  }

  // the codegen kernel replaced an oracle-green interpreted HOF chain;
  // this pins bit-equality of every quantized component on the real
  // corpora, so the replacement can never silently shift a rounding
  Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { sf =>
    test(s"int8 codegen kernel is bit-identical to the HOF forms it replaced at $sf") {
      import graft.functions.Int8Functions.{int8Dot, int8NormSq, int8Quantize}
      val both = Tables(spark, sf, "embeddings")
        .withColumn("maxabs", expr(
          """aggregate(embedding, cast(0.0 as double),
               (acc, x) -> greatest(acc, abs(cast(x as double))))"""))
        .withColumn("qv_hof", expr(
          """transform(embedding, x ->
               CASE WHEN maxabs = 0.0 THEN cast(0 as bigint)
                    ELSE cast(round(cast(x as double) * 127.0 / maxabs) as bigint) END)"""))
        .withColumn("qn2_hof", expr(
          """aggregate(qv_hof, cast(0 as bigint), (acc, x) -> acc + x * x)"""))
        .withColumn("qv", int8Quantize(col("embedding")))
        .withColumn("qn2", int8NormSq(col("qv")))
        .select(col("vec_id"), col("qv"), col("qv_hof"), col("qn2"), col("qn2_hof"))
      both.collect().foreach { r =>
        val codegen = r.getAs[Array[Byte]]("qv").map(_.toLong).toSeq
        val hof = r.getSeq[Long](2)
        assert(codegen == hof, s"vec ${r.getLong(0)}: quantized bytes diverge")
        assert(r.getLong(3) == r.getLong(4), s"vec ${r.getLong(0)}: qn2 diverges")
      }
      // per-PAIR dot: codegen loop vs the HOF fold, on a pair sample
      val q = both.select(col("vec_id").as("qid"), col("qv").as("qa"), col("qv_hof").as("ha"))
        .filter(col("qid") < 50)
      val c = both.select(col("vec_id").as("nid"), col("qv").as("qb"), col("qv_hof").as("hb"))
        .filter(col("nid") < 50)
      val diverged = q.crossJoin(c)
        .withColumn("dot_cg", int8Dot(col("qa"), col("qb")))
        .withColumn("dot_hof", expr(
          """aggregate(sequence(1, least(size(ha), size(hb))), cast(0 as bigint),
               (acc, i) -> acc + element_at(ha, i) * element_at(hb, i))"""))
        .filter(col("dot_cg") =!= col("dot_hof")).count()
      assert(diverged == 0, s"$diverged pair dots diverge from the HOF fold")
    }
  }

  // s09 stacks TWO lossy codes (LSH candidates + int8 scoring); the
  // witness column prices both at once and this is its gate
  Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { sf =>
    test(s"s09 quantized rerank over bucketed LSH candidates holds recall@3 >= 0.8 at $sf") {
      val perQuery = SparkEntry.queries("s09_quantized_rerank")(spark, sf)
        .select(col("query_id"), col("recall_at_3")).distinct()
      val recall = perQuery.agg(avg(col("recall_at_3"))).head().getDouble(0)
      info(f"avg recall@3 $recall%.3f over ${perQuery.count()} queries")
      assert(recall >= RecallTarget, f"avg recall@3 $recall%.3f < $RecallTarget")
    }
  }

  test("bits is the scale knob: +log2(n growth) bits cuts candidates, holds recall") {
    val sf = "/root/testdata/sf0.1" // 2000 vectors = 4x sf0.01's 500
    val exact = SparkEntry.queries("s04_knn_graph")(spark, sf)
      .select(col("query_id"), col("neighbor_id"))
    def recallAt(bits: Int, tables: Int): Double = {
      val approx = sim.Similarity.annKnnGraphAt(spark, sf, bits, tables)
        .select(col("query_id").as("q2"), col("neighbor_id").as("n2"))
      exact.join(approx,
          col("query_id") === col("q2") && col("neighbor_id") === col("n2"), "left")
        .groupBy(col("query_id"))
        .agg((count(col("q2")).cast("double") / lit(3.0)).as("r"))
        .agg(avg(col("r"))).head().getDouble(0)
    }
    // 4x the vectors: +2 bits restores per-bucket occupancy, and tables
    // grow 16 -> 40 (LSH L ~ n^rho: a longer signature retains true
    // neighbors at P(<=1 flip of 10) = 0.046/table on this corpus's
    // p~0.6 bit agreement, so L must rise to hold Sigma P) — candidate
    // pairs still shrink because random collisions fall 2^-bits while L
    // grows linearly. Measured intermediate points that pin this
    // calibration: 10-bit/16t recall 0.495, 10-bit/24t 0.678 (theory
    // 0.680) — bits is NOT a standalone knob.
    val cands8 = sim.Similarity.annCandidates(spark, sf, 8, 16).count()
    val cands10 = sim.Similarity.annCandidates(spark, sf, 10, 40).count()
    val recall10 = recallAt(10, 40)
    info(f"sf0.1: candidates 8-bit/16t=$cands8%d, 10-bit/40t=$cands10%d, recall@3(10-bit/40t)=$recall10%.3f")
    assert(cands10 < cands8,
      s"scaled family generated no fewer candidates ($cands10 vs $cands8)")
    assert(recall10 >= RecallTarget, f"recall@3 $recall10%.3f < $RecallTarget at 10 bits/40 tables")
  }

  test("sf1 scale evidence: calibrated bits/tables hold recall at 10x the vectors") {
    // Gated on the dev-generated sf1 corpus (tools/gen_sf.py): 20000
    // vectors = 10x sf0.1. Continuing the calibration curve, +3 bits
    // (~log2(10)) restores per-bucket occupancy n/2^bits and tables
    // grow with L ~ n^rho; candidates must shrink vs the fixed 8-bit
    // family while recall holds the shipping gate.
    //
    // The exact side is evaluated on a SAMPLED query set (1000 of
    // 20000) — the documented 100 TB practice (s07 scaladoc): sampled
    // queries x corpus stays linear in n, where the full s04 corpus²
    // build is deliberately quadratic and priced out at this n on the
    // 4-thread test session. The ANN side still builds its FULL graph
    // through the bucketed scale path.
    val sf = "/tmp/graft_testdata/sf1"
    assume(new java.io.File(s"$sf/embeddings.parquet").exists(),
      "sf1 corpus not generated on this host")
    import graft.functions.VectorFunctions.{floatDot, floatNorm}
    val e = Tables(spark, sf, "embeddings")
      .withColumn("nrm", floatNorm(col("embedding")))
    val isSampled = col("query_id") % 20 === 0
    val q = e.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("eq"), col("nrm").as("nq"))
    val pairs = broadcast(q).join(
        e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ec"), col("nrm").as("nc")),
        col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", floatDot(col("eq"), col("ec")) / (col("nq") * col("nc")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    val exact = pairs.select(col("query_id"), col("neighbor_id"), col("cos"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id")).cache()
    assert(exact.count() == 1000 * 3)

    def recallAt(bits: Int, tables: Int): Double = {
      val approx = sim.Similarity.annKnnGraphAt(spark, sf, bits, tables)
        .filter(isSampled)
        .select(col("query_id").as("q2"), col("neighbor_id").as("n2"))
      exact.join(approx,
          col("query_id") === col("q2") && col("neighbor_id") === col("n2"), "left")
        .groupBy(col("query_id"))
        .agg((count(col("q2")).cast("double") / lit(3.0)).as("r"))
        .agg(avg(col("r"))).head().getDouble(0)
    }
    // per-sampled-query candidate volume, the quantity the bits knob
    // controls (counted on the same 1000 queries for both configs)
    val cands8 = sim.Similarity.annCandidates(spark, sf, 8, 16)
      .filter(isSampled).count()
    // 128 tables from the measured per-table retention at this n:
    // 96t gave recall 0.757 => per-table retention 0.0146, so
    // L >= ln(0.2)/-ln(1-0.0146) ~ 110 for the 0.80 gate; 128 adds
    // margin (predicted ~0.85) while candidates stay ~3x under the
    // fixed 8-bit family's
    val cands13 = sim.Similarity.annCandidates(spark, sf, 13, 128)
      .filter(isSampled).count()
    val recall13 = recallAt(13, 128)
    exact.unpersist()
    info(f"sf1: sampled candidates 8-bit/16t=$cands8%d, 13-bit/128t=$cands13%d, recall@3(13-bit/128t)=$recall13%.3f")
    assert(cands13 < cands8,
      s"scaled family generated no fewer candidates ($cands13 vs $cands8)")
    assert(recall13 >= RecallTarget, f"recall@3 $recall13%.3f < $RecallTarget at 13 bits/128 tables")
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

  // The past-the-envelope plan (bucketed signature index + bucketed
  // vector store, nothing broadcast) must be indistinguishable from
  // the in-envelope broadcast plan in its ROWS — the
  // annBroadcastEnvelopeRows switch changes only the physical shape.
  // autoBroadcastJoinThreshold=-1 makes the no-broadcast assertion
  // meaningful: the planner cannot sneak a broadcast back in, so
  // every join in the bucketed tree is proven to run on the bucketed
  // layouts (the BucketingSpec pattern).
  private def assertBucketedEqualsBroadcast(sf: String): Unit = {
    import graft.functions.VectorFunctions.floatNorm
    val e = Tables(spark, sf, "embeddings").withColumn("nrm", floatNorm(col("embedding")))
    val (bits, tables) = sim.Similarity.annParams(e.count())
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = sim.Similarity.annGraphBucketed(spark, sf, bits, tables)
      val b = bucketed.collect().toSeq
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastExchange"),
        "bucketed ANN plan still contains a broadcast")
      val a = sim.Similarity.annGraphBroadcast(e, bits, tables).collect().toSeq
      assert(a == b, s"plans diverge: broadcast ${a.size} rows, bucketed ${b.size}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { sf =>
    test(s"bucketed ANN graph: bit-equal to the broadcast plan, zero broadcasts, at $sf") {
      assertBucketedEqualsBroadcast(sf)
    }
  }

  test("annParamsProbed reproduces the measured anchors within one ladder step") {
    // The solver is the documented path past the calibration map's
    // 2^17 reach; its credibility is that it REDERIVES the measured
    // anchors from the retention probe alone. Anchor L values come
    // from the recall measurements in annParams' scaladoc.
    val ladder = sim.Similarity.AnnTableLadder
    val anchors = Seq(
      "/root/testdata/sf0.001" -> (8, 24),
      "/root/testdata/sf0.01" -> (8, 24),
      "/root/testdata/sf0.1" -> (9, 32),
      "/tmp/graft_testdata/sf1" -> (13, 128),
      "/tmp/graft_testdata/sf3" -> (14, 192))
    anchors.foreach { case (dir, (aBits, aTables)) =>
      if (new java.io.File(s"$dir/embeddings.parquet").exists()) {
        val (bits, tables) = sim.Similarity.annParamsProbed(spark, dir)
        info(s"$dir: solved ($bits, $tables), anchor ($aBits, $aTables)")
        assert(bits == aBits, s"$dir: occupancy bits $bits != anchor $aBits")
        val (si, ai) = (ladder.indexOf(tables), ladder.indexOf(aTables))
        assert(si >= 0 && ai >= 0 && math.abs(si - ai) <= 1,
          s"$dir: solved L=$tables not within one ladder step of anchor $aTables")
      }
    }
  }

  test("annParamsFor dispatch: map below the threshold, solver above it") {
    import graft.functions.VectorFunctions.floatNorm
    val sf = "/root/testdata/sf0.001" // 500 vectors
    val e = Tables(spark, sf, "embeddings").withColumn("nrm", floatNorm(col("embedding")))
    // below the threshold: the anchor map answers, no probe pass
    assert(sim.Similarity.annParamsFor(e, 500L) == sim.Similarity.annParams(500L))
    // threshold lowered under the corpus: the SAME resolution path the
    // registered entries call must route to the measured-retention
    // solver and return its family
    sys.props("graft.ann.calibratedMaxRows") = "400"
    try {
      val routed = sim.Similarity.annParamsFor(e, 500L)
      val solved = sim.Similarity.annParamsProbed(spark, sf)
      assert(routed == solved,
        s"annParamsFor returned $routed, solver says $solved")
    } finally { sys.props.remove("graft.ann.calibratedMaxRows"): Unit }
  }

  test("a >2^17 corpus routes through the probed solver in the registered build path") {
    // The map hard-caps at (16, 192); past 2^17 rows the registered
    // entries (annGraphTable behind s06/s07, SignLshIndex.build) must
    // run the retention-probe solver instead. Drive a 2^18+1-vector
    // synthetic corpus through SignLshIndex.build — the registered
    // index entry — and assert the PINNED family is the solver's, with
    // bits past the map's cap. The corpus is CLUSTERED (5 near-
    // duplicates per center, tiny deterministic noise) so true
    // neighbors retain their signatures in almost every table and the
    // solved L lands low on the ladder — which keeps the build's
    // signing pass (n × L rows) testable on the 4-thread session while
    // the expensive part under test (the exact-probe + retention
    // measurement at 262k vectors) runs for real.
    val n = (1L << 18) + 1
    val vecs = spark.range(n).select(col("id").as("vec_id"))
      .withColumn("embedding", expr(
        """transform(sequence(0, 63), j ->
             cast(sin((vec_id div 5) * 64 + j) + 0.001d * sin(vec_id * 64 + j) as float))"""))
    val dir = java.nio.file.Files.createTempDirectory("graft_probed_idx").toString
    val idx = new sim.SignLshIndex(spark, dir)
    idx.build(vecs)
    val (bits, tables) = idx.params
    info(s"pinned family at n=$n: ($bits, $tables)")
    // occupancy rule without the map's cap: floor(log2(2^18+1)) - 1 = 17
    assert(bits == 17, s"expected occupancy bits 17 past the map's 16-bit cap, got $bits")
    assert(sim.Similarity.AnnTableLadder.contains(tables),
      s"tables $tables not a ladder rung")
    assert((bits, tables) != sim.Similarity.annParams(n),
      "the capped map family was pinned — the probed route did not fire")
  }

  test("sf1 scale evidence: bucketed ANN graph bit-equal to broadcast, zero broadcasts, at the calibrated family") {
    // Gated on the dev-generated sf1 corpus: the equality must hold at
    // 20k vectors under the sf1-calibrated (bits, tables) — the family
    // the registered s06/d12 would run right below the envelope switch.
    assume(new java.io.File("/tmp/graft_testdata/sf1/embeddings.parquet").exists(),
      "sf1 corpus not generated on this host")
    assertBucketedEqualsBroadcast("/tmp/graft_testdata/sf1")
  }
}
