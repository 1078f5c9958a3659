package graft

import org.scalatest.funsuite.AnyFunSuite

/** s12 (IVFADC) witnesses: the residual table is bit-exact against
  * the trained coarse quantizer, the composed ADC score matches a
  * driver-side LUT recount bit-for-bit, and the residual-trained
  * codebooks must approximate the true inner product BETTER than
  * s11's raw-space codebooks on identical pairs — the measurable
  * claim IVFADC exists for (Jégou et al. 2011 §III), gated alongside
  * the s11-style rank-quality floor.
  */
class S12IvfPqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"
  import sim.Pq.{M, SUB}

  private def dotFD(a: Array[Float], b: Array[Double]): Double =
    a.indices.foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i))
  private def dotFF(a: Array[Float], b: Array[Float]): Double =
    a.indices.foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)
  private def dsum9(vs: Seq[Double]): Double = {
    val sum = vs.map(v => new java.math.BigDecimal(v)
        .setScale(9, java.math.RoundingMode.HALF_UP))
      .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
    java.lang.Double.parseDouble(sum.toPlainString)
  }

  lazy val vecs = Tables(spark, dir, "embeddings").select("vec_id", "embedding")
    .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
  lazy val cells = sim.Similarity.kmeansCells(spark, dir)
    .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  lazy val cents = sim.Similarity.kmeansCentroids(spark, dir)
    .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

  test("ivfResiduals equals embedding minus the assigned coarse centroid, bit-for-bit") {
    val got = sim.Similarity.ivfResiduals(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray))
    assert(got.length == vecs.size)
    got.foreach { case (id, cell, res) =>
      assert(cell == cells(id), s"cell of $id")
      val exp = vecs(id).zip(cents(cell)).map { case (x, c) => x.toDouble - c }
      assert(res.toSeq == exp.toSeq, s"residual of $id")
    }
  }

  test("s12 ADC scores equal a driver-side LUT + coarse-term recount bit-for-bit") {
    val pqc = sim.Similarity.ivfpqCodebooks(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getSeq[Double](2).toArray)
      .toMap
    val codes = sim.Similarity.ivfpqCodes(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = SparkEntry.queries("s12_ivfpq")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.nonEmpty)
    for (((q, n), adc) <- got) {
      val qc = dotFD(vecs(q), cents(cells(n)))
      val rsum = dsum9((0 until M).map { m =>
        dotFD(vecs(q).slice(m * SUB, m * SUB + SUB),
          pqc((m.toLong, codes((n, m.toLong)))))
      })
      assert(adc == qc + rsum, s"ADC of ($q, $n)")
    }
  }

  test("residual PQ beats raw PQ on inner-product error; rank quality holds the s11 floor") {
    val pqcRes = sim.Similarity.ivfpqCodebooks(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getSeq[Double](2).toArray)
      .toMap
    val codesRes = sim.Similarity.ivfpqCodes(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val pqcRaw = sim.Similarity.pqCodebooks(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getSeq[Double](2).toArray)
      .toMap
    val codesRaw = sim.Similarity.pqCodes(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val queries = vecs.keys.filter(_ < 10L).toSeq.sorted
    val pairs = for (q <- queries; n <- vecs.keys if n != q) yield (q, n)
    def errOf(score: (Long, Long) => Double): Double =
      pairs.map { case (q, n) => math.abs(dotFF(vecs(q), vecs(n)) - score(q, n)) }
        .sum / pairs.size
    val errRes = errOf { (q, n) =>
      dotFD(vecs(q), cents(cells(n))) + (0 until M).map { m =>
        dotFD(vecs(q).slice(m * SUB, m * SUB + SUB),
          pqcRes((m.toLong, codesRes((n, m.toLong)))))
      }.sum
    }
    val errRaw = errOf { (q, n) =>
      (0 until M).map { m =>
        dotFD(vecs(q).slice(m * SUB, m * SUB + SUB),
          pqcRaw((m.toLong, codesRaw((n, m.toLong)))))
      }.sum
    }
    info(f"mean |true - approx| inner product: residual-PQ $errRes%.4f, raw-PQ $errRaw%.4f")
    assert(errRes < errRaw,
      "residual-trained codes approximate the inner product no better than raw PQ — " +
        "the IVFADC composition adds nothing")
    // s11-style rank-quality lift of s12's actual picks
    def normF(a: Array[Float]): Double =
      math.sqrt(a.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
    val nrm = vecs.map { case (id, v) => id -> normF(v) }
    def cosT(a: Long, b: Long): Double = dotFF(vecs(a), vecs(b)) / (nrm(a) * nrm(b))
    def picks(name: String) = SparkEntry.queries(name)(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val exact = picks("s01_knn_bruteforce")
    val got = picks("s12_ivfpq")
    val lifts = queries.map { q =>
      val corpusMean = vecs.keys.filter(_ != q).map(cosT(q, _)).sum / (vecs.size - 1)
      val em = exact.collect { case (`q`, n) => cosT(q, n) }
      val gm = got.collect { case (`q`, n) => cosT(q, n) }
      (gm.sum / gm.length - corpusMean) / (em.sum / em.length - corpusMean)
    }
    val lift = lifts.sum / lifts.size
    val recall = got.toSet.intersect(exact.toSet).size.toDouble / exact.size
    info(f"s12 rank-quality lift $lift%.2f, recall vs s01 $recall%.2f")
    // s12 scans only the probed cells (~30% of the corpus, the s10
    // budget) AND scores through 4-byte codes (the s11 budget); the
    // floor is s11's — the composition must not degrade below either
    // parent's witness on this near-uniform corpus
    assert(lift >= 0.40, f"s12 rank-quality lift $lift%.2f below the s11 floor")
  }
}
