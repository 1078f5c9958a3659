package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Independent re-computation checks for the round-13 additions (d16
  * radius-2 fuzzy names, the parameterized interval-count operator):
  * each distributed plan is compared against a plain-Scala
  * single-threaded re-implementation of the same contract — a
  * different algorithm shape, so a shared bug can't hide on both
  * sides. The DuckDB oracle is the third leg.
  */
class R13OpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val t = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = t
      }
    }
    dp(a.length)
  }

  test("d16 radius-2 pairs equal brute-force levenshtein<=2 over distinct names") {
    // sf0.01, not sf0.001: the tiny corpus' 10 supplier names differ
    // only in their last digit — every pair is ed 1 and the radius-2
    // ring is empty, so it can't witness the wider radius at all
    val names = Tables(spark, "/root/testdata/sf0.01", "supplier").select("s_name")
      .distinct().collect().map(_.getString(0)).sorted
    val expected = (for {
      i <- names.indices; j <- (i + 1) until names.length
      if lev(names(i), names(j)) <= 2
    } yield (names(i), names(j), lev(names(i), names(j)).toLong)).toSet
    val got = SparkEntry.queries("d16_fuzzy_names_ed2")(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expected, s"got ${got.size} pairs, expected ${expected.size}")
    // the wider radius must actually widen: strictly more pairs than ed<=1
    val ed1 = expected.count(_._3 <= 1)
    assert(expected.size > ed1, "corpus yields no distance-2 pair — degenerate")
  }

  test("fuzzyKeyPairs radius-2 is complete on adversarial keys (runs, transpositions, length skew)") {
    import spark.implicits._
    // equal-char runs (the variant-dedup case), adjacent transpositions
    // (shared only at depth 2), double insert/delete, and pure subs
    val keys = Seq("aaaa", "aaab", "abaa", "ab", "ba", "abcd", "abdc",
      "abcdef", "abcdefgh", "xbcdef", "abucef", "a", "ax", "axy")
    val df = keys.toDF("k").distinct()
    val exp = (for {
      i <- keys.indices; j <- (i + 1) until keys.size
      a = if (keys(i) < keys(j)) keys(i) else keys(j)
      b = if (keys(i) < keys(j)) keys(j) else keys(i)
      if lev(a, b) <= 2
    } yield (a, b, lev(a, b).toLong)).toSet
    val got = graft.dedup.Dedup.fuzzyKeyPairs(df, "k", 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == exp)
  }

  test("interval counts hold across (window, bucket) shapes: recount + no quadratic plan") {
    val ev = ops.Events.withEpoch(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("es"))
    val rows = ev.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val clicksByUser = rows.filter(_._3 == "click").groupBy(_._2)
      .map { case (u, rs) => u -> rs.map(_._4) }
    // W = B (e13's shape), W > B (e14's 4x), W not a multiple of B
    for ((w, b) <- Seq((1800L, 1800L), (7200L, 1800L), (3600L, 900L), (2500L, 600L))) {
      val expected = rows.filter(_._3 == "purchase").map { case (id, u, _, es) =>
        id -> clicksByUser.getOrElse(u, Array.empty[Long])
          .count(c => c >= es - w && c < es).toLong
      }.toMap
      val df = ops.Events.intervalCounts(ev, w, b, "n_clicks")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"($w, $b) planned quadratic:\n$plan")
      val got = df.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(got.keySet == expected.keySet, s"($w, $b) purchase coverage")
      expected.foreach { case (id, n) => assert(got(id) == n, s"($w, $b) purchase $id") }
    }
  }

  test("d17 semantic clusters equal a union-find recount over the d12 pair table") {
    // independent leg: driver-side union-find over the oracle-checked
    // d12 pairs, min-id canonical labels
    val pairs = SparkEntry.queries("d12_neardup_ann")(spark, dir)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "corpus yields near-dup pairs")
    val vecs = Tables(spark, dir, "embeddings").select("vec_id")
      .collect().map(_.getLong(0))
    val parent = scala.collection.mutable.Map(vecs.map(v => v -> v): _*)
    def find(v: Long): Long = {
      var r = v
      while (parent(r) != r) r = parent(r)
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val label = vecs.map(v => v -> find(v)).toMap
    val sizes = label.values.groupBy(identity).map { case (c, vs) => c -> vs.size.toLong }
    val got = SparkEntry.queries("d17_semantic_clusters")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
    assert(got.map(_._1).toSeq == vecs.sorted.toSeq, "every vector labeled, ordered")
    got.foreach { case (v, (c, n, keep)) =>
      assert(c == label(v), s"vec $v cluster")
      assert(n == sizes(label(v)), s"vec $v size")
      assert(keep == (if (v == c) 1L else 0L), s"vec $v keeper")
    }
    // non-degenerate: at least one multi-vector cluster, and keepers
    // number exactly the cluster count
    assert(sizes.values.max > 1)
    assert(got.count(_._2._3 == 1L).toLong == sizes.size.toLong)
  }

  test("d17 census plan is groupBy+join, never a window over the skewed cluster_id") {
    // cluster sizes are power-law: a count-over-window partitioned by
    // cluster_id would shuffle the whole corpus onto one skewed key
    // and sort the giant cluster in a single task at 100 TB
    val plan = SparkEntry.queries("d17_semantic_clusters")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"WindowExec in d17 plan:\n$plan")
  }

  test("e14 matches a driver recount at its registered width") {
    val rows = ops.Events.withEpoch(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("es"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val clicksByUser = rows.filter(_._3 == "click").groupBy(_._2)
      .map { case (u, rs) => u -> rs.map(_._4) }
    val expected = rows.filter(_._3 == "purchase").map { case (id, u, _, es) =>
      id -> clicksByUser.getOrElse(u, Array.empty[Long])
        .count(c => c >= es - 7200 && c < es).toLong
    }.toMap
    val got = SparkEntry.queries("e14_interval_counts_2h")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == expected)
    // the wider window must see strictly more clicks than the 30-min one
    val got30 = SparkEntry.queries("e13_interval_counts")(spark, dir)
      .collect().map(r => r.getLong(3)).sum
    assert(got.values.sum > got30, "2h window adds nothing over 30m — degenerate")
  }
}
