package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** t21_quality_classifier: the distributed GD training loop must equal
  * an independent imperative recount BIT-EXACTLY (weights, scores,
  * decisions), the distillation must actually work (decisions recover
  * the weak-label rule), and training must make progress (squared loss
  * strictly decreases across the 8 epochs).
  */
class QualityClassifierSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  // hardcoded on purpose — the recount must not read the operator's list
  private val stop = Set("the", "a", "of", "and", "to", "in", "is")
  private val punct = "[!?,.;:]".r

  /** Imperative feature derivation straight from the raw text —
    * independent of the Spark expression tree but the same fixed-order
    * double arithmetic (that order is the operator's contract).
    */
  private def feats(dir: String): Array[(Long, Double, Double, Double, Double)] =
    Tables(spark, dir, "documents").select("doc_id", "text").collect().map { r =>
      val (id, textS) = (r.getLong(0), r.getString(1))
      val toks = textS.split(" ").filter(_.nonEmpty)
      val nTok = toks.length
      val x1 = if (nTok == 0) 0.0 else toks.count(stop).toDouble / nTok.toDouble
      val x2 = if (nTok == 0) 0.0 else toks.distinct.length.toDouble / nTok.toDouble
      val x3 = math.min(nTok.toDouble / 100.0, 1.0)
      val pr = if (textS.isEmpty) 0.0
        else punct.findAllIn(textS).length.toDouble / textS.length.toDouble
      val y = if (0.4 * x1 + 0.4 * (1.0 - pr) + 0.2 * x3 >=
        text.QualityClassifier.TAU) 1.0 else 0.0
      (id, x1, x2, x3, y)
    }

  /** The reference GD loop: same fixed-point gradient quantization,
    * sums in arbitrary order (exact integer math — order must not
    * matter), returns the per-epoch mean squared losses alongside the
    * final weights.
    */
  private def gd(fs: Array[(Long, Double, Double, Double, Double)])
      : (Array[Double], Seq[Double]) = {
    val n = fs.length.toDouble
    val w = Array(0.0, 0.0, 0.0, 0.0)
    val losses = Seq.newBuilder[Double]
    for (_ <- 1 to text.QualityClassifier.EPOCHS) {
      val s = Array(0L, 0L, 0L, 0L)
      var loss = 0.0
      fs.foreach { case (_, x1, x2, x3, y) =>
        val r = y - ((w(0) + (w(1) * x1)) + (w(2) * x2) + (w(3) * x3))
        loss += r * r
        s(0) += math.floor(r * 1e12).toLong
        s(1) += math.floor((r * x1) * 1e12).toLong
        s(2) += math.floor((r * x2) * 1e12).toLong
        s(3) += math.floor((r * x3) * 1e12).toLong
      }
      losses += loss / n
      for (k <- 0 to 3)
        w(k) = w(k) + text.QualityClassifier.LR * (s(k).toDouble / 1e12 / n)
    }
    (w, losses.result())
  }

  test("t21 training equals the imperative GD recount bit-exactly " +
      "(weights, scores, decisions) and loss strictly decreases") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val fs = feats(dir)
      val (w, losses) = gd(fs)
      val got = text.QualityClassifier.weights(spark, dir)
      assert(got.toSeq == w.toSeq,
        s"$dir: weights diverge: spark=${got.toSeq} recount=${w.toSeq}")
      assert(losses.zip(losses.tail).forall { case (a, b) => b < a },
        s"$dir: loss not strictly decreasing: $losses")

      val expected = fs.map { case (id, x1, x2, x3, y) =>
        val sc = (w(0) + (w(1) * x1)) + (w(2) * x2) + (w(3) * x3)
        (id, sc, if (sc >= text.QualityClassifier.CUT) 1L else 0L, y.toLong)
      }.toSet
      val rows = SparkEntry.queries("t21_quality_classifier")(spark, dir)
        .collect().map(r =>
          (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSet
      assert(rows == expected,
        s"$dir: score rows diverge; sample=${(rows.diff(expected) ++
          expected.diff(rows)).take(2)}")
    }
  }

  test("t21 distillation recovers the weak-label rule on >=90% of docs " +
      "with both classes present") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = SparkEntry.queries("t21_quality_classifier")(spark, dir)
        .collect().map(r => (r.getLong(2), r.getLong(3)))
      val agree = rows.count { case (k, y) => k == y }.toDouble / rows.length
      assert(agree >= 0.90, s"$dir: agreement $agree below the 0.90 floor")
      assert(rows.exists(_._2 == 1L) && rows.exists(_._2 == 0L),
        s"$dir: degenerate weak labels")
      assert(rows.exists(_._1 == 1L) && rows.exists(_._1 == 0L),
        s"$dir: degenerate decisions")
    }
  }

  test("qualityScoreStream scores crawl batches under frozen weights: " +
      "chunked ingest == batch t21 bit-exactly, in-trigger dup ids " +
      "collapse, replay re-emits identically") {
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
      .localCheckpoint()
    val w = text.QualityClassifier.weights(spark, dir)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSeq
    // two arrival chunks; frozen weights mean chunked == whole-corpus
    val b1 = docs.filter(col("doc_id") % 2 === 0)
    val b2 = docs.filter(col("doc_id") % 2 === 1)
    var out = Seq.empty[(Long, Double, Long, Long)]
    streaming.StreamOps.qualityScoreBatch(b1, w)(d => out ++= rows(d))
    streaming.StreamOps.qualityScoreBatch(b2, w)(d => out ++= rows(d))
    val batch = rows(SparkEntry.queries("t21_quality_classifier")(spark, dir))
    assert(out.toSet == batch.toSet, "streamed scores diverge from batch t21")
    assert(out.size == batch.size, "row-count drift (lost or doubled docs)")
    // in-trigger duplicate ids collapse to one decision per document
    var dup = Seq.empty[(Long, Double, Long, Long)]
    streaming.StreamOps.qualityScoreBatch(b1.unionAll(b1), w)(d => dup ++= rows(d))
    assert(dup.toSet == rows(
      SparkEntry.queries("t21_quality_classifier")(spark, dir))
        .filter(_._1 % 2 == 0).toSet)
    assert(dup.size == dup.map(_._1).distinct.size)
    // replay: same batch re-emits identical rows (stateless idempotence)
    var replay = Seq.empty[(Long, Double, Long, Long)]
    streaming.StreamOps.qualityScoreBatch(b1, w)(d => replay ++= rows(d))
    assert(replay.toSet == dup.toSet)
    // the per-batch mean score is the drift signal — recount it
    val mean1 = dup.map(_._2).sum / dup.size
    assert(!mean1.isNaN && dup.nonEmpty)
  }

  test("t21 plans join-free: training scans aggregate to scalars and " +
      "the scoring pass is a projection with the weights as literals") {
    val df = SparkEntry.queries("t21_quality_classifier")(
      spark, "/root/testdata/sf0.001")
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.toLowerCase.contains("join"), s"unexpected join:\n$phys")
  }
}
