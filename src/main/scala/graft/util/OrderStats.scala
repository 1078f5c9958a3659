package graft.util

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT order statistics (selection) — the scale-safe
  * replacement for `percentile_cont`, whose physical plan buffers
  * every group's full value list in the aggregate (one group = a
  * single reduce task sorting every row, measured 5.6× growth at 10×
  * data on q16; bounded groups still grow their per-group buffers
  * linearly with the data, q11/e10).
  *
  * Method: iterative histogram refinement, generalized over groups.
  * Each round is ONE fully-parallel aggregation over the values; the
  * driver only ever sees per-(group, rank, bucket) summaries —
  * O(groups × ranks) rows per round, bounded by construction and
  * independent of n. The group cardinality itself must be bounded
  * (the q11/e10/q16 envelope: return flags, event types, one global
  * group); rows PER group are unbounded and never buffered anywhere.
  *
  *  1. Every requested (group, rank) starts with the group's global
  *     [min, max] range and its 0-based target index.
  *  2. A round histograms each unresolved range into B buckets and
  *     keeps, per bucket, (count, min, max). The bucket containing
  *     the target index becomes the new range — crucially the new
  *     bounds are the bucket's ACTUAL min/max values, so the
  *     closed-interval membership test `lo <= v AND v <= hi` is exact
  *     (bucket assignment is monotone in v, so the interval [min_b,
  *     max_b] contains exactly the bucket's rows — no float-boundary
  *     drift between the histogram and the next round's filter).
  *  3. A range resolves when it collapses to a single value (lo == hi
  *     — duplicates can't be split, but then every order statistic in
  *     the range IS that value) or its row count drops to at most
  *     `tailK`, where a final bounded top-k aggregate
  *     ([[graft.functions.TopKAggregate]], k ≤ tailK per group —
  *     map-side partial, no sort) selects the exact value.
  *
  * Rounds shrink a range's width by ~B per pass, so double precision
  * (2^53 distinct mantissa steps) bounds the loop at ~6 rounds of
  * B=1024 regardless of n or value distribution.
  */
object OrderStats {

  /** Input-rows envelope under which callers prefer the built-in
    * single-pass percentile aggregate: its per-group state is a
    * (value → count) map — safe while distinct values stay far under
    * the envelope — and it costs ONE job where the selection path
    * costs ~4 driver-synchronized jobs (measured 0.1 s vs 1.4 s on
    * q11 at sf0.1). Past the envelope the selection path wins
    * outright: near-unique double columns make the buffer O(rows per
    * group), and the one-job advantage drowns in the buffered sort.
    * Both paths are bit-equal (OrderStatsSpec), so the switch changes
    * the PLAN, never the answer — the standard adaptive-execution
    * trade, made on a deterministic row count.
    */
  val BuiltinEnvelopeRows: Long = 4L * 1000 * 1000

  /** Exact 0-based order statistics of `valueCol`, per group.
    *
    * @param v     two columns: `g` (string group) and `v` (double)
    * @param ranks requested 0-based ranks per group value
    * @return (group, rank) -> value
    */
  private def groupedStats(v: DataFrame, ranks: Map[String, Seq[Long]],
      buckets: Int, tailK: Int): Map[(String, Long), Double] = {
    val spark = v.sparkSession

    // state per (group, rank): range known to contain it, target index
    // within the range, rows in range
    final case class St(g: String, lo: Double, hi: Double, t: Long, cnt: Long)
    val heads = v.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("mn"), max(col("v")).as("mx"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    var state: Map[(String, Long), St] = ranks.toSeq.flatMap { case (g, rs) =>
      val (n, mn, mx) = heads.getOrElse(g,
        throw new IllegalArgumentException(s"group '$g' has no rows"))
      rs.distinct.map { r =>
        require(r >= 0 && r < n, s"rank $r out of [0, $n) for group '$g'")
        (g, r) -> St(g, mn, mx, r, n)
      }
    }.toMap
    var resolved = Map.empty[(String, Long), Double]
    var rounds = 0

    while ({
      val (done, open) = state.partition { case (_, st) => st.lo == st.hi }
      resolved ++= done.map { case (k, st) => k -> st.lo }
      state = open
      state.nonEmpty && state.values.exists(_.cnt > tailK)
    }) {
      rounds += 1
      require(rounds <= 64, "orderStatistics failed to converge (impossible for finite doubles)")
      val active = state.filter(_._2.cnt > tailK).toSeq
      val rids = active.zipWithIndex.map { case ((k, st), i) => (i, k, st) }
      val ranges = spark.createDataFrame(rids.map { case (i, _, st) =>
        (i, st.g, st.lo, st.hi)
      }).toDF("rid", "rg", "lo", "hi")
      // one parallel pass: per (rid, bucket) count/min/max; the
      // broadcast range join only replicates rows into the (few)
      // ranges that still contain them. Width is guarded away from
      // 0.0 (a sub-subnormal hi−lo would make the division NaN for
      // v == lo); any positive width keeps the assignment monotone in
      // v, which is all exactness needs.
      val hist = v.join(broadcast(ranges),
          col("g") === col("rg") && col("v") >= col("lo") && col("v") <= col("hi"))
        .withColumn("w", greatest((col("hi") - col("lo")) / buckets,
          lit(java.lang.Double.MIN_VALUE)))
        .withColumn("b", least(greatest(
          floor((col("v") - col("lo")) / col("w")), lit(0)),
          lit(buckets - 1)).cast("int"))
        .groupBy(col("rid"), col("b"))
        .agg(count(lit(1)).as("cnt"), min(col("v")).as("bmn"), max(col("v")).as("bmx"))
      // pick each range's target bucket with a window over the tiny
      // (rid × bucket) summary — the driver receives one row per rid
      val wcum = Window.partitionBy(col("rid")).orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val tExpr = rids.foldLeft(lit(null).cast("bigint")) { case (acc, (i, _, st)) =>
        when(col("rid") === lit(i), lit(st.t)).otherwise(acc)
      }
      val picked = hist
        .withColumn("cum", coalesce(sum(col("cnt")).over(wcum), lit(0L)))
        .withColumn("t", tExpr)
        .filter(col("cum") <= col("t") && col("t") < col("cum") + col("cnt"))
        .select(col("rid"), col("bmn"), col("bmx"), (col("t") - col("cum")).as("t2"),
          col("cnt"))
        .collect()
      val byRid = rids.map { case (i, k, st) => i -> ((k, st)) }.toMap
      state = state ++ picked.map { case Row(rid: Int, bmn: Double, bmx: Double,
          t2: Long, cnt: Long) =>
        val (k, st) = byRid(rid)
        k -> St(st.g, bmn, bmx, t2, cnt)
      }
    }

    // final bounded selection: per remaining range, the t-th smallest
    // value via the windowless top-k aggregate (k <= tailK, map-side
    // partial buffers — no sort, no big collect)
    if (state.nonEmpty) {
      val rids = state.toSeq.zipWithIndex.map { case ((k, st), i) => (i, k, st) }
      val ranges = spark.createDataFrame(rids.map { case (i, _, st) =>
        (i, st.g, st.lo, st.hi, st.t)
      }).toDF("rid", "rg", "lo", "hi", "t")
      val kMax = (rids.map(_._3.t).max + 1).toInt
      val got = v.join(broadcast(ranges),
          col("g") === col("rg") && col("v") >= col("lo") && col("v") <= col("hi"))
        .groupBy(col("rid"), col("t"))
        .agg(graft.functions.TopKAggregate.topKScored(
          -col("v"), col("v").cast("long"), kMax).as("top"))
        .select(col("rid"),
          (-element_at(col("top"), (col("t") + 1).cast("int")).getField("score")).as("ov"))
        .collect()
      val byRid = rids.map { case (i, k, _) => i -> k }.toMap
      resolved ++= got.map { case Row(rid: Int, ov: Double) => byRid(rid) -> ov }
    }
    resolved
  }

  /** Exact 0-based order statistics of `col` in `df` (one global
    * group).
    *
    * @return rank -> value, for each requested rank (ranks must be in
    *         [0, n); duplicates in `ranks` are fine)
    */
  def orderStatistics(df: DataFrame, valueCol: String, ranks: Seq[Long],
      buckets: Int = 1024, tailK: Int = 1024): Map[Long, Double] = {
    require(ranks.nonEmpty, "no ranks requested")
    val v = df.select(lit("").as("g"), col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    groupedStats(v, Map("" -> ranks), buckets, tailK).map { case ((_, r), x) => r -> x }
  }

  /** `percentile_cont(p)` of `col` computed through
    * [[orderStatistics]] — same linear-interpolation semantics as the
    * SQL aggregate (position p·(n−1), interpolate
    * (hi−pos)·v[lo] + (pos−lo)·v[hi]), but with a distributed plan.
    */
  def percentileCont(df: DataFrame, valueCol: String,
      percentages: Seq[Double]): Map[Double, Double] = {
    val g = groupedPercentileCont(
      df.select(lit("").as("gpc_g"), col(valueCol)), "gpc_g", valueCol, percentages)
    percentages.map(p => p -> g(("", p))).toMap
  }

  /** Per-group `percentile_cont`, distributed: group cardinality must
    * be bounded (group values pass through the driver as strings);
    * rows per group are unbounded and never buffered. Replaces the
    * built-in aggregate whose per-group buffer holds every value.
    *
    * @return (group value as string, percentage) -> interpolated value
    */
  def groupedPercentileCont(df: DataFrame, groupCol: String, valueCol: String,
      percentages: Seq[Double], buckets: Int = 1024,
      tailK: Int = 1024): Map[(String, Double), Double] = {
    require(percentages.nonEmpty, "no percentages requested")
    val v = df.select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull && col("g").isNotNull)
    val counts = v.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val positions = counts.map { case (g, n) =>
      g -> percentages.map(p => p -> p * (n - 1)).toMap
    }
    val ranks = positions.map { case (g, ps) =>
      g -> ps.values.flatMap(pos =>
        Seq(math.floor(pos).toLong, math.ceil(pos).toLong)).toSeq.distinct
    }
    val stats = groupedStats(v, ranks, buckets, tailK)
    positions.toSeq.flatMap { case (g, ps) =>
      ps.map { case (p, pos) =>
        val (lo, hi) = (math.floor(pos).toLong, math.ceil(pos).toLong)
        val value =
          if (lo == hi) stats((g, lo))
          else (hi - pos) * stats((g, lo)) + (pos - lo) * stats((g, hi))
        (g, p) -> value
      }
    }.toMap
  }
}
