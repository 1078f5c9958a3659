package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, explode, size, udf}
import org.apache.spark.util.sketch.BloomFilter

/** Per-segment bloom sidecar machinery shared by the incremental
  * indexes ([[graft.dedup.MinHashIndex]]: doc_id + band-key blooms;
  * [[graft.sim.SignLshIndex]]: vec_id blooms) — ONE implementation so
  * a sizing or probe fix lands in every index (the same
  * drift-by-duplication risk the shared ANN pipeline closed).
  *
  * Contract: a segment's bloom has NO false negatives over the keys
  * it was built from, so "no bloom claims this key" proves absence
  * from the whole store, and per-trigger membership reads collapse to
  * the delta-sized sidecars plus an exact confirm against only the
  * CLAIMING segments (true hits + ~fpp false positives).
  *
  * Envelope, priced honestly: sidecar TOTAL is ~2.4 B/key — 100-odd
  * times under the rows they stand in for, but still linear in corpus
  * lifetime (24 GB at 10^10 keys), and the probe broadcasts them.
  * Two structural mitigations, both preserved by this design: segment
  * COMPACTION (the indexes' `compact()`) keeps the sidecar count
  * bounded so the per-trigger open/footer cost doesn't grow with
  * ingest count, and because membership is per-segment with no false
  * negatives, the probe can be sharded (each executor holding a
  * subset of blooms, keys routed by segment) without changing any
  * answer when the broadcast form stops fitting.
  */
object BloomSidecars {

  /** False-positive rate. Expected spurious segment reads per trigger
    * are ~fpp × probe keys × segments — at 1e-4 and a 10^3-key
    * trigger against a year of segments, ~0.04; the sidecar costs
    * 19.2 bits ≈ 2.4 B per key.
    */
  val Fpp: Double = 0.0001

  /** Bloom over `column` of `df` (`n` = row estimate; `n == 0` yields
    * an empty never-matching bloom — the sketch aggregate returns
    * null on zero rows).
    */
  def build(df: DataFrame, column: String, n: Long): BloomFilter =
    if (n == 0) BloomFilter.create(1, Fpp)
    else df.stat.bloomFilter(column, n, Fpp)

  def write(fs: FileSystem, p: Path, bf: BloomFilter): Unit = {
    val out = fs.create(p, true)
    try bf.writeTo(out) finally out.close()
  }

  /** null when the sidecar is missing (a segment predating blooms) —
    * callers treat that segment as always-suspect, preserving the
    * no-false-negative contract.
    */
  def read(fs: FileSystem, p: Path): BloomFilter =
    if (!fs.exists(p)) null
    else {
      val in = fs.open(p)
      try BloomFilter.readFrom(in) finally in.close()
    }

  /** The subset of `ids` (one LONG `keyCol` column) present in a
    * segmented store — the shared membership probe behind
    * `MinHashIndex.knownIds` and `SignLshIndex.knownIds` (one
    * implementation, so a probe fix cannot land in one index and not
    * the other): per-segment blooms rule segments out with no false
    * negatives; only keys some bloom claims (true members plus ~fpp
    * false positives) pay an exact semi-join, against ONLY the
    * claiming segments' key columns.
    *
    * @param bloomPaths segment bloom sidecars, parallel to
    *                   `tablePaths` (missing sidecar = that segment is
    *                   always suspect)
    * @param tablePaths the segments' parquet tables carrying `keyCol`
    */
  def knownKeys(spark: org.apache.spark.sql.SparkSession, ids: DataFrame,
      keyCol: String, fs: FileSystem, bloomPaths: Seq[Path],
      tablePaths: Seq[Path]): DataFrame =
    knownKeysBy(spark, ids, keyCol, fs, bloomPaths, tablePaths, longHits)

  /** [[knownKeys]] for a STRING `keyCol` (e.g. [[graft.dedup.GramIndex]]'s
    * 16-hex gram digests) — same contract, probed via [[stringHits]].
    */
  def knownStringKeys(spark: org.apache.spark.sql.SparkSession, ids: DataFrame,
      keyCol: String, fs: FileSystem, bloomPaths: Seq[Path],
      tablePaths: Seq[Path]): DataFrame =
    knownKeysBy(spark, ids, keyCol, fs, bloomPaths, tablePaths, stringHits)

  private def knownKeysBy(spark: org.apache.spark.sql.SparkSession, ids: DataFrame,
      keyCol: String, fs: FileSystem, bloomPaths: Seq[Path], tablePaths: Seq[Path],
      hits: org.apache.spark.broadcast.Broadcast[Array[BloomFilter]] => Column => Column)
      : DataFrame = {
    require(bloomPaths.size == tablePaths.size, "segment lists must align")
    val bc = spark.sparkContext.broadcast(
      bloomPaths.map(read(fs, _)).toArray)
    val suspects = ids.select(col(keyCol)).distinct()
      .withColumn("segi", hits(bc)(col(keyCol)))
      .filter(size(col("segi")) > 0)
      .localCheckpoint()
    val segIdx = suspects.select(explode(col("segi")).as("i"))
      .distinct().collect().map(_.getInt(0)).sorted
    if (segIdx.isEmpty) suspects.select(col(keyCol)).limit(0)
    else {
      val segTable = spark.read.parquet(segIdx.map(tablePaths(_).toString).toSeq: _*)
      suspects.select(col(keyCol))
        .join(segTable.select(col(keyCol)), Seq(keyCol), "left_semi")
    }
  }

  /** Column of segment indices whose bloom might contain the LONG key
    * in `key` (missing blooms always match). Blooms ride a broadcast
    * — shipped once per executor, not per task closure.
    */
  def longHits(bc: org.apache.spark.broadcast.Broadcast[Array[BloomFilter]])(
      key: Column): Column = {
    val f = udf((id: Long) => {
      val a = bc.value
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i < a.length) {
        if (a(i) == null || a(i).mightContainLong(id)) out += i
        i += 1
      }
      out.toSeq
    })
    f(key)
  }

  /** Column of segment indices whose bloom might contain the STRING
    * key in `key` (missing blooms always match).
    */
  def stringHits(bc: org.apache.spark.broadcast.Broadcast[Array[BloomFilter]])(
      key: Column): Column = {
    val f = udf((k: String) => {
      val a = bc.value
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i < a.length) {
        if (a(i) == null || a(i).mightContainString(k)) out += i
        i += 1
      }
      out.toSeq
    })
    f(key)
  }
}
