package graft.dedup

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.util.BloomSidecars

/** Incrementally-maintained train-gram decontamination index — the
  * third member of the incremental-index family ([[MinHashIndex]] for
  * near-dup candidates, [[graft.sim.SignLshIndex]] for ANN), and the
  * store a production decontaminator actually keeps: the distinct
  * 8-gram digest set of a training snapshot is materialized ONCE, then
  * APPENDED per crawl batch — only the NEW documents are ever
  * shingled, and only grams the corpus has never seen are written.
  * d13's registered audit serves its train side from this index (built
  * once per session/corpus through the MatStore memo); the flat
  * recompute remains the DuckDB oracle.
  *
  * One logical table: `grams` (g64) — the corpus-lifetime DISTINCT
  * gram digest set, 16-hex md5 prefixes ([[Dedup.docGrams8]], the same
  * digest d13 keys its audit join on).
  *
  * WRITES are O(batch): each append persists one delta SEGMENT
  * (`seg/s<k>/grams` — the batch's grams NOT present in any earlier
  * segment) plus a delta-sized g64 bloom sidecar, and publishes a tiny
  * manifest. READS during append are O(batch + bloom bytes): the
  * already-known probe runs through the per-segment blooms
  * ([[BloomSidecars.knownStringKeys]] — no false negatives, exact
  * confirm against only the claiming segments), never a scan of the
  * corpus-lifetime gram column. Segment contents are therefore
  * DISJOINT by construction, so the multi-path read needs no distinct
  * and chained appends equal a full rebuild exactly (GramIndexSpec).
  *
  * Versioning, crash behavior (markerless dirs invisible, orphan
  * segments swept), [[compact]] and [[vacuum]] are the shared
  * [[graft.util.VersionedTableStore]] contract, as in the two sibling
  * indexes. Single writer per index dir.
  */
final class GramIndex(spark: SparkSession, indexDir: String) {
  private val snaps = new graft.util.VersionedTableStore(spark, indexDir, "_INDEX_OK")
  private def segRoot = new Path(snaps.dir, "seg")
  private def fs = snaps.fs

  /** Newest COMPLETE index version (manifest + marker), if any. */
  def version: Option[Long] = snaps.version

  /** The corpus-lifetime distinct gram digest set: (g64). */
  def grams(): DataFrame = {
    val paths = segmentsOf(requireVersion())
      .map(s => new Path(segRoot, s"$s/grams").toString)
    spark.read.parquet(paths: _*)
  }

  private def requireVersion(): Long = version.getOrElse(
    throw new java.util.NoSuchElementException(
      s"index at $indexDir never built — call build() first"))

  private def segmentsOf(v: Long): Seq[String] =
    snaps.readTextFile(new Path(snaps.versionPath(v), "segments"))
      .split("\n").map(_.trim).filter(_.nonEmpty).toSeq

  /** The caller-supplied tag version `v` was published with, if any —
    * the streaming decontaminator's batch journal (one tiny file per
    * version), the same replay-detection contract as
    * [[MinHashIndex.tagOf]].
    */
  def tagOf(v: Long): Option[String] = {
    val p = new Path(snaps.versionPath(v), "tag")
    if (fs.exists(p)) Some(snaps.readTextFile(p).trim) else None
  }

  /** Newest complete version carrying `tag` — scans all retained
    * versions newest-first (tiny manifest reads, bounded by vacuum
    * retention) so an interleaved [[compact]] can't hide a crashed
    * batch's journal entry.
    */
  def versionTagged(tag: String): Option[Long] =
    snaps.completeVersions.sorted.reverse.find(tagOf(_).contains(tag))

  /** The gram set as it stood BEFORE version `v`'s own delta — the
    * union of `v`'s manifest minus its delta segment (equivalently:
    * the previous version's segments, but read through `v`'s manifest
    * so it stays answerable after older manifests are vacuumed).
    * This is the versioned pre-batch train set a replayed
    * decontamination trigger re-audits against; only meaningful for
    * append-published versions (a compacted version's single merged
    * segment IS its delta).
    */
  def gramsBefore(v: Long): DataFrame = {
    val paths = segmentsOf(v).filterNot(_ == s"s$v")
      .map(s => new Path(segRoot, s"$s/grams").toString)
    if (paths.isEmpty) grams().limit(0)
    else spark.read.parquet(paths: _*)
  }

  /** The subset of `g64s` (a g64 column) ALREADY in the store — the
    * bloom-pruned membership probe: per-segment sidecars rule segments
    * out with no false negatives, so a quiet crawl batch against a
    * year of gram history reads blooms plus only the truly-colliding
    * segments.
    */
  def knownGrams(g64s: DataFrame): DataFrame = {
    val segs = segmentsOf(requireVersion())
    BloomSidecars.knownStringKeys(spark, g64s, "g64", fs,
      segs.map(s => new Path(segRoot, s"$s/grams_bloom")),
      segs.map(s => new Path(segRoot, s"$s/grams")))
  }

  /** Write the delta segment (grams parquet + delta-sized bloom), then
    * publish `v` as the previous segments plus it — segment first,
    * manifest+marker last, the shared crash contract.
    *
    * `grams` must be materialized by the caller (it is consumed twice:
    * parquet write + bloom build over the written parquet).
    */
  private def writeDelta(grams: DataFrame, v: Long,
      prevSegments: Seq[String], tag: Option[String] = None): Unit = {
    val seg = s"s$v"
    val gramsPath = new Path(segRoot, s"$seg/grams").toString
    grams.select(col("g64")).write.mode("overwrite").parquet(gramsPath)
    // bloom from the just-written parquet: stable storage, no second
    // evaluation of the (possibly expensive) delta plan
    val written = spark.read.parquet(gramsPath)
    BloomSidecars.write(fs, new Path(segRoot, s"$seg/grams_bloom"),
      BloomSidecars.build(written, "g64", written.count()))
    snaps.publish(v) { v =>
      snaps.writeTextFile(new Path(snaps.versionPath(v), "segments"),
        (prevSegments :+ seg).mkString("\n"))
      tag.foreach(t =>
        snaps.writeTextFile(new Path(snaps.versionPath(v), "tag"), t))
    }
  }

  /** Full build from a corpus (docs: doc_id, text) — the once-per-
    * training-snapshot materialization.
    */
  def build(docs: DataFrame): Unit =
    writeDelta(Dedup.docGrams8(docs).select(col("g64")).distinct(),
      version.getOrElse(0L) + 1, Seq.empty)

  /** Delta refresh for appended documents: shingle the NEW docs only,
    * keep only grams absent from every earlier segment (bloom-pruned
    * membership, exact-confirmed), write one delta segment. Replaying
    * an overlapping batch appends the empty set — idempotent.
    */
  def append(newDocs: DataFrame, tag: Option[String] = None): Unit = {
    val v = requireVersion()
    val batch = Dedup.docGrams8(newDocs).select(col("g64")).distinct()
    val fresh = batch.join(knownGrams(batch), Seq("g64"), "left_anti")
    writeDelta(fresh, v + 1, segmentsOf(v), tag)
  }

  /** Merge the current version's segments into ONE and publish it as a
    * new version. Read-equality is free (segments disjoint); the
    * O(corpus) rewrite is the amortized price that bounds per-append
    * sidecar/footer reads, as in the sibling indexes. Reads straight
    * from the segment-union parquet (stable until [[vacuum]]) — no
    * full-store pin.
    */
  def compact(): Long = {
    val v = requireVersion()
    writeDelta(grams(), v + 1, Seq.empty)
    v + 1
  }

  /** Drop all but the newest `keepLast` complete versions plus
    * markerless crash leftovers, then delete every segment no retained
    * version references. Returns the dropped versions.
    */
  def vacuum(keepLast: Int): Seq[Long] = {
    val dropped = snaps.vacuum(keepLast)
    val live = snaps.completeVersions.flatMap(segmentsOf).toSet
    if (fs.exists(segRoot)) {
      fs.listStatus(segRoot).map(_.getPath)
        .filterNot(p => live.contains(p.getName))
        .foreach(p => fs.delete(p, true))
    }
    dropped
  }
}
