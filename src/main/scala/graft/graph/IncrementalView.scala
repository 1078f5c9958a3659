package graft.graph

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incrementally-maintained distinct-key view of a [[GraphStore]]
  * graph — the "database half" updating a derived index without
  * recomputing it from the base table.
  *
  * Maintains the distinct (src, dst) key set of a stored graph across
  * [[applyDelta]] calls as `new = (old ∖ deleted_keys) ∪ added_keys`.
  * That is correct without multiplicity bookkeeping because GraphStore
  * deltas delete by KEY — [[GraphStore.applyDelta]]'s anti-join
  * removes every base row of a deleted (src, dst) — so a key
  * surviving the anti-join provably still has ≥ 1 base row, and an
  * added key gains one. Refresh cost is O(|view| + |delta|),
  * independent of the base edge count: at 100 TB the win is never
  * rescanning the fact table to keep the pair index current (the
  * rescan bipartitePairs pays per session).
  *
  * View snapshots are immutable parquet directories `v<k>` where k is
  * the GRAPH version the view reflects, so freshness is one version
  * compare and time-travel works for the view exactly as for the
  * graph. Single-writer per view, like the store's per-graph writer
  * model.
  */
final class DistinctPairView(spark: SparkSession, store: GraphStore,
    graph: String, viewDir: String) {
  private val hadoopConf = spark.sparkContext.hadoopConfiguration
  private def dir = new Path(viewDir)
  private def fs = dir.getFileSystem(hadoopConf)

  /** Graph version the newest materialized view reflects, if any. */
  def version: Option[Long] = {
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("v")).map(_.stripPrefix("v").toLong)
      .sorted.lastOption
  }

  def isFresh: Boolean = version.nonEmpty && version == store.currentVersion(graph)

  def read(): DataFrame = {
    val v = version.getOrElse(
      throw new java.util.NoSuchElementException(s"view of $graph never built"))
    spark.read.parquet(new Path(dir, s"v$v").toString)
  }

  private def write(df: DataFrame, v: Long): Unit =
    df.select(df("src"), df("dst"))
      .write.mode("overwrite").parquet(new Path(dir, s"v$v").toString)

  /** Full build from the current graph snapshot — initialization and
    * the recovery path when the store was modified behind the view's
    * back (version mismatch).
    */
  def rebuild(): Unit = {
    val v = store.currentVersion(graph).getOrElse(
      throw new java.util.NoSuchElementException(s"no graph named $graph"))
    write(store.read(graph).select("src", "dst").distinct(), v)
  }

  /** Publish the delta to the store AND refresh the view from its own
    * previous materialization plus the delta only — the base table is
    * never rescanned. Falls back to [[rebuild]] if the view is stale
    * (someone wrote the graph without going through this view).
    */
  def applyDelta(additions: DataFrame, deletions: DataFrame): Unit = {
    val wasFresh = isFresh
    store.applyDelta(graph, additions, deletions)
    if (!wasFresh) { rebuild(); return }
    val prev = read()
    val next = prev
      .join(deletions.select(deletions("src"), deletions("dst")).distinct(),
        Seq("src", "dst"), "left_anti")
      .unionByName(additions.select(additions("src"), additions("dst")).distinct())
      .distinct()
    write(next, store.currentVersion(graph).get)
  }
}
