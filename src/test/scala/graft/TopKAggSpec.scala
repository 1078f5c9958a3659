package graft

import graft.functions.{TopKAggregate, TopKBuffer}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The windowless top-k: [[graft.functions.TopKScored]] must select
  * exactly the rows `row_number() OVER (ORDER BY score DESC, payload)`
  * would — same rows, same ranks — because the DuckDB oracles for the
  * similarity tier are written in the window form.
  */
class TopKAggSpec extends AnyFunSuite {
  private lazy val s = SparkTestSession.spark
  import s.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id")
    df.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"neighbor_id", $"cos", $"rank")
  }

  private def aggTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy($"query_id")
      .agg(TopKAggregate.topKScored($"cos", $"neighbor_id", k).as("top"))
      .select($"query_id", posexplode($"top").as(Seq("pos", "sn")))
      .select($"query_id", $"sn.payload".as("neighbor_id"),
        $"sn.score".as("cos"), ($"pos" + lit(1)).as("rank"))

  test("distinct-payload variant equals distinct()-then-window on a duplicated stream") {
    val rnd = new scala.util.Random(11)
    val base = for (q <- 0L until 25L; n <- 0L until 40L if n != q)
      yield (q, n, rnd.nextInt(6).toDouble / 5.0)
    // replicate rows 1-4x — the raw-candidate-stream shape (same pair
    // always carries the same score, as in the LSH multi-probe hits)
    val dup = base.flatMap(r => Seq.fill(1 + rnd.nextInt(4))(r))
    val df = dup.toDF("query_id", "neighbor_id", "cos").repartition(11)
    for (k <- Seq(1, 3)) {
      val expect = windowTopK(df.distinct(), k).collect().map(_.toSeq).toSet
      val got = df.groupBy($"query_id")
        .agg(TopKAggregate.topKScoredDistinct($"cos", $"neighbor_id", k).as("top"))
        .select($"query_id", posexplode($"top").as(Seq("pos", "sn")))
        .select($"query_id", $"sn.payload".as("neighbor_id"),
          $"sn.score".as("cos"), ($"pos" + lit(1)).as("rank"))
        .collect().map(_.toSeq).toSet
      assert(got == expect, s"k=$k distinct-payload mismatch")
    }
    // general semantics: same payload with DIFFERENT scores keeps the
    // best entry per payload
    val buf = new TopKBuffer(3, distinctPayloads = true)
    buf.insert(0.5, 7L); buf.insert(0.9, 7L); buf.insert(0.7, 8L); buf.insert(0.2, 7L)
    assert(buf.size == 2 && buf.scores(0) == 0.9 && buf.payloads(0) == 7L &&
      buf.scores(1) == 0.7 && buf.payloads(1) == 8L)
  }

  test("matches the row_number window on random data with ties") {
    val rnd = new scala.util.Random(7)
    // heavy tie density: scores drawn from just 8 distinct values
    val rows = for (q <- 0L until 40L; n <- 0L until 60L if n != q)
      yield (q, n, rnd.nextInt(8).toDouble / 7.0)
    // many small partitions so partial buffers serialize + merge
    val df = rows.toDF("query_id", "neighbor_id", "cos").repartition(13)
    for (k <- Seq(1, 3, 5)) {
      val expect = windowTopK(df, k).collect().map(_.toSeq).toSet
      val got = aggTopK(df, k).collect().map(_.toSeq).toSet
      assert(got == expect, s"k=$k mismatch")
    }
  }

  test("groups smaller than k, and k larger than any group") {
    val df = Seq((1L, 10L, 0.5), (1L, 11L, 0.9), (2L, 12L, 0.1))
      .toDF("query_id", "neighbor_id", "cos")
    val got = aggTopK(df, 5).orderBy($"query_id", $"rank").collect().map(_.toSeq)
    assert(got.toSeq == Seq(
      Seq(1L, 11L, 0.9, 1), Seq(1L, 10L, 0.5, 2), Seq(2L, 12L, 0.1, 1)))
  }

  test("NaN sorts largest, like Spark's DESC ordering") {
    val df = Seq((1L, 10L, 0.5), (1L, 11L, Double.NaN), (1L, 12L, 0.9))
      .toDF("query_id", "neighbor_id", "cos")
    // NaN != NaN breaks plain Seq equality: compare on the raw bits
    def norm(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getInt(3))
    }.toSet
    val expect = norm(windowTopK(df, 2).collect())
    val got = norm(aggTopK(df, 2).collect())
    assert(got == expect)
    assert(got.exists { r => r._2 == 11L && r._4 == 1 }) // NaN ranked first
  }

  test("-0.0 ties with 0.0 and falls to the payload tiebreak") {
    val df = Seq((1L, 20L, 0.0), (1L, 10L, -0.0), (1L, 30L, -1.0))
      .toDF("query_id", "neighbor_id", "cos")
    val got = aggTopK(df, 2).orderBy($"rank").collect().map(_.getLong(1))
    // SQL ORDER BY treats -0.0 = 0.0, so neighbor 10 beats 20 on id
    assert(got.toSeq == Seq(10L, 20L))
  }

  test("null scores are skipped, not ranked") {
    val df = Seq((1L, 10L, Some(0.5)), (1L, 11L, None), (1L, 12L, Some(0.1)))
      .toDF("query_id", "neighbor_id", "cos")
    val got = aggTopK(df, 3).orderBy($"rank").collect().map(_.getLong(1))
    assert(got.toSeq == Seq(10L, 12L))
  }

  test("buffer insert/merge keeps the k best in order") {
    val b = new TopKBuffer(3)
    Seq((0.1, 5L), (0.9, 9L), (0.5, 2L), (0.9, 1L), (0.2, 7L))
      .foreach { case (sc, p) => b.insert(sc, p) }
    assert(b.size == 3)
    assert(b.scores.take(3).toSeq == Seq(0.9, 0.9, 0.5))
    assert(b.payloads.take(3).toSeq == Seq(1L, 9L, 2L))
    val other = new TopKBuffer(3)
    other.insert(0.95, 4L)
    other.insert(0.05, 6L)
    b.mergeFrom(other)
    assert(b.scores.take(3).toSeq == Seq(0.95, 0.9, 0.9))
    assert(b.payloads.take(3).toSeq == Seq(4L, 1L, 9L))
  }
}
