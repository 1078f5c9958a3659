package graft

import graft.functions.FreqSketch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries frequent-items sketch: the deterministic guarantee the
  * t12 pipeline leans on is that the candidate set is a SUPERSET of
  * every key with true frequency > n/(k+1), under ANY partitioning and
  * merge order (mergeable-summaries combine). The counters themselves
  * are arrival-order-dependent by design — only the superset property
  * is contract.
  */
class FreqSketchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  // skewed synthetic stream: key i ∈ [1, 20] appears (21-i)³ times —
  // n = 44,100, n/(k+1) = 2,594 at k=16, so exactly the 7 head keys
  // (counts 2,744..8,000) sit ABOVE the guarantee line and the tail
  // sits below: both sides of the bound are exercised
  private def skewed: Seq[Long] =
    (1 to 20).flatMap { i =>
      val c = 21 - i; Seq.fill(c * c * c)(i.toLong)
    }

  test("candidate keys are a superset of all > n/(k+1) keys under any partitioning") {
    import spark.implicits._
    val data = skewed
    val n = data.size
    val k = 16
    val trueCounts = data.groupBy(identity).map { case (key, v) => key -> v.size }
    val mustKeep = trueCounts.filter(_._2 > n / (k + 1)).keySet
    assert(mustKeep.nonEmpty && mustKeep.size < k, "test stream must exercise the bound")
    Seq(1, 7, 32).foreach { parts =>
      val got = data.toDF("h").repartition(parts)
        .agg(FreqSketch.misraGriesKeys(col("h"), k).as("ks"))
        .head().getSeq[Long](0).toSet
      assert(got.size <= k, s"state bound violated at $parts partitions: ${got.size}")
      assert(mustKeep.subsetOf(got),
        s"missing heavy keys at $parts partitions: ${mustKeep -- got}")
    }
  }

  test("a shuffled arrival order changes nothing about the guarantee") {
    import spark.implicits._
    // deterministic shuffle: order by a hash of (value, position)
    val data = skewed.zipWithIndex
      .sortBy { case (v, i) => (v * 2654435761L + i) % 1000003 }.map(_._1)
    val n = data.size
    val k = 16
    val mustKeep = data.groupBy(identity).filter(_._2.size > n / (k + 1)).keySet
    assert(mustKeep.nonEmpty, "test stream must exercise the bound")
    val got = data.toDF("h").repartition(13)
      .agg(FreqSketch.misraGriesKeys(col("h"), k).as("ks"))
      .head().getSeq[Long](0).toSet
    assert(mustKeep.subsetOf(got), s"missing: ${mustKeep -- got}")
  }

  test("t12 heavy hitters equal the direct exact computation") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("t12_heavy_hitters")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val toks = Tables(spark, dir, "documents")
      .select(explode(expr("filter(split(text, ' '), t -> t != '')")).as("term"))
      .collect().map(_.getString(0)).toSeq
    val n = toks.size
    val expected = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter { case (_, c) => c.toDouble >= 0.002 * n }
      .toSeq.sortBy { case (t, c) => (-c, t) }
    assert(got == expected)
  }
}
