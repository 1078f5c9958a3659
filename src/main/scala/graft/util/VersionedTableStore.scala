package graft.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The versioned-snapshot machinery shared by every derived-table
  * artifact in the engine — [[graft.graph.DistinctPairView]],
  * [[graft.graph.DegreeView]], [[graft.dedup.MinHashIndex]] — which
  * each previously hand-rolled (and had already let diverge once:
  * `_SUCCESS` vs `_VIEW_OK` vs `_INDEX_OK`).
  *
  * Layout contract (unchanged from the hand-rolled copies, so existing
  * on-disk artifacts keep working):
  *
  *   - a snapshot is an immutable directory `baseDir/v<k>`;
  *   - a snapshot only COUNTS once `v<k>/<marker>` exists, and the
  *     marker is created only after every table in the snapshot has
  *     committed — a writer that crashes mid-publish leaves a
  *     markerless `v<k>` that [[version]] and every read ignore, so
  *     readers keep serving the previous snapshot;
  *   - single writer per store dir (the GraphStore writer model);
  *     readers of retained snapshots are never disturbed because a new
  *     version means new files, never an in-place overwrite.
  *
  * Tables live at `v<k>/<table>`; the table name `""` means the
  * snapshot directory itself is the (single) parquet table, the
  * DistinctPairView layout where the parquet committer's own
  * `_SUCCESS` doubles as the marker.
  */
final class VersionedTableStore(spark: SparkSession, baseDir: String,
    marker: String) {
  private val hadoopConf = spark.sparkContext.hadoopConfiguration
  def dir = new Path(baseDir)
  def fs = dir.getFileSystem(hadoopConf)

  /** Every `v<k>` directory, markerless crash leftovers included. */
  def allVersions: Seq[Long] = {
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("v")).map(_.stripPrefix("v").toLong).toSeq.sorted
  }

  /** Versions whose marker exists — the ones a reader may serve. */
  def completeVersions: Seq[Long] =
    allVersions.filter(v => fs.exists(new Path(dir, s"v$v/$marker")))

  /** Newest COMPLETE snapshot version, if any. */
  def version: Option[Long] = completeVersions.lastOption

  def versionPath(v: Long): Path = new Path(dir, s"v$v")

  def tablePath(v: Long, table: String): Path =
    if (table.isEmpty) versionPath(v) else new Path(versionPath(v), table)

  /** Read `table` from the newest complete snapshot; `missing` is the
    * error message when no snapshot was ever published.
    */
  def readTable(table: String, missing: => String): DataFrame = {
    val v = version.getOrElse(
      throw new java.util.NoSuchElementException(missing))
    spark.read.parquet(tablePath(v, table).toString)
  }

  /** Publish snapshot `v`: run `write` (which must commit every table
    * under [[tablePath]](v, _)), then create the marker. If `write`
    * throws, no marker is created and the partial `v<k>` stays
    * invisible. Creating the marker when the parquet committer already
    * wrote it (the `""`-table `_SUCCESS` layout) truncates a
    * zero-length file — a no-op.
    */
  def publish(v: Long)(write: Long => Unit): Unit = {
    write(v)
    fs.create(new Path(versionPath(v), marker), true).close()
  }

  /** Drop all but the newest `keepLast` complete snapshots (the served
    * one always retained) plus markerless crash leftovers. Single
    * writer per store, so no snapshot write is in flight during a
    * vacuum. Returns the dropped versions.
    */
  def vacuum(keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val all = allVersions
    if (all.isEmpty) return Seq.empty
    val keep = completeVersions.takeRight(keepLast).toSet
    val dropped = all.filterNot(keep)
    dropped.foreach(v => fs.delete(versionPath(v), true))
    dropped
  }

  /** Write a small text file (e.g. a segment manifest) atomically
    * enough for the single-writer model: content is fully written and
    * the stream closed before the caller publishes a marker over it.
    */
  def writeTextFile(p: Path, content: String): Unit = {
    val out = fs.create(p, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def readTextFile(p: Path): String = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }
}
