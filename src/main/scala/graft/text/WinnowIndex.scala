package graft.text

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.BloomSidecars

/** Incrementally-maintained duplicated-span census — the fourth member
  * of the incremental-index family ([[graft.dedup.MinHashIndex]]:
  * near-dup candidates, [[graft.dedup.GramIndex]]: decontamination
  * grams, [[graft.sim.SignLshIndex]]: ANN), and the store a daily
  * crawl needs to run t14/t16 against HISTORY without re-shingling
  * the corpus: the winnowing-fingerprint census (fp → number of
  * holding documents) is materialized once, then APPENDED per crawl
  * batch — only the batch's documents are ever shingled.
  *
  * One logical table: `census` (fp, n_docs) — how many distinct
  * documents hold each winnowing fingerprint (t14's census contract:
  * n_docs ≥ 2 means the fp's 6-token span is corpus-duplicated).
  * Unlike GramIndex's distinct-set segments, census deltas are
  * ADDITIVE: the corpus census is the per-fp SUM over segments, so
  * segments never need cross-segment dedup — but documents must
  * count at most once, so appends are restricted to id-FRESH docs
  * (per-segment doc_id tables + blooms, [[graft.dedup.MinHashIndex]]'s
  * first-writer-wins rule), and a replayed batch appends the empty
  * delta.
  *
  * WRITES are O(batch): one delta segment (census + ingested ids) +
  * two delta-sized bloom sidecars + a tiny manifest. READS during a
  * trigger are O(batch + bloom bytes): id freshness and the
  * historical census probe both run through per-segment blooms (no
  * false negatives; exact reads touch only claiming segments), never
  * a corpus-lifetime column scan.
  *
  * Versioning, crash behavior, [[compact]]/[[vacuum]], and the tag
  * journal are the shared [[graft.util.VersionedTableStore]] contract
  * of the three sibling indexes. Single writer per index dir.
  */
final class WinnowIndex(spark: SparkSession, indexDir: String) {
  private val snaps = new graft.util.VersionedTableStore(spark, indexDir, "_INDEX_OK")
  private def segRoot = new Path(snaps.dir, "seg")
  private def fs = snaps.fs

  /** Newest COMPLETE index version (manifest + marker), if any. */
  def version: Option[Long] = snaps.version

  private def requireVersion(): Long = version.getOrElse(
    throw new java.util.NoSuchElementException(
      s"index at $indexDir never built — call build() first"))

  private def segmentsOf(v: Long): Seq[String] =
    snaps.readTextFile(new Path(snaps.versionPath(v), "segments"))
      .split("\n").map(_.trim).filter(_.nonEmpty).toSeq

  private def emptyCensus(): DataFrame =
    spark.range(0).select(col("id").as("fp"), col("id").as("n_docs"))

  private def censusOf(segs: Seq[String]): DataFrame =
    if (segs.isEmpty) emptyCensus()
    else spark.read
      .parquet(segs.map(s => new Path(segRoot, s"$s/census").toString): _*)
      .groupBy(col("fp")).agg(sum(col("n_docs")).as("n_docs"))

  /** The corpus-lifetime census: (fp, n_docs) summed over segments. */
  def census(): DataFrame = censusOf(segmentsOf(requireVersion()))

  /** The census as it stood BEFORE version `v`'s own delta — the
    * versioned pre-batch state a replayed streaming trigger re-audits
    * against (the [[graft.dedup.GramIndex.gramsBefore]] contract).
    */
  def censusBefore(v: Long): DataFrame =
    censusOf(segmentsOf(v).filterNot(_ == s"s$v"))

  /** [[censusBefore]] restricted to the probe fingerprints, read
    * bloom-pruned: per-segment fp blooms rule segments out with no
    * false negatives (so the per-fp SUM over claiming segments is the
    * complete pre-batch count), and only claiming segments' census
    * parquet is opened — O(batch + bloom bytes) per trigger against a
    * year of history.
    */
  def censusBeforeFor(v: Long, fps: DataFrame): DataFrame = {
    val segs = segmentsOf(v).filterNot(_ == s"s$v")
    if (segs.isEmpty) return emptyCensus()
    val bc = spark.sparkContext.broadcast(
      segs.map(s => BloomSidecars.read(fs, new Path(segRoot, s"$s/census_bloom")))
        .toArray)
    val suspects = fps.select(col("fp")).distinct()
      .withColumn("segi", BloomSidecars.longHits(bc)(col("fp")))
      .filter(size(col("segi")) > 0)
      .localCheckpoint()
    val segIdx = suspects.select(explode(col("segi")).as("i"))
      .distinct().collect().map(_.getInt(0)).sorted
    if (segIdx.isEmpty) emptyCensus()
    else spark.read
      .parquet(segIdx.map(i => new Path(segRoot, s"${segs(i)}/census").toString)
        .toSeq: _*)
      .join(suspects.select(col("fp")), Seq("fp"), "left_semi")
      .groupBy(col("fp")).agg(sum(col("n_docs")).as("n_docs"))
  }

  /** The doc_ids first ingested at version `v` — the version's delta
    * segment, an O(batch) read (the replay path's fresh set).
    */
  def idsAddedAt(v: Long): DataFrame = {
    require(snaps.completeVersions.contains(v), s"no complete version $v")
    spark.read.parquet(new Path(segRoot, s"s$v/docs").toString)
  }

  /** The subset of `ids` (a doc_id column) ALREADY ingested —
    * bloom-pruned, exact-confirmed (first-writer-wins membership).
    */
  def knownDocs(ids: DataFrame): DataFrame = {
    val segs = segmentsOf(requireVersion())
    BloomSidecars.knownKeys(spark, ids, "doc_id", fs,
      segs.map(s => new Path(segRoot, s"$s/docs_bloom")),
      segs.map(s => new Path(segRoot, s"$s/docs")))
  }

  /** The caller-supplied tag version `v` was published with — the
    * streaming batch journal (the sibling indexes' replay contract).
    */
  def tagOf(v: Long): Option[String] = {
    val p = new Path(snaps.versionPath(v), "tag")
    if (fs.exists(p)) Some(snaps.readTextFile(p).trim) else None
  }

  /** Newest complete version carrying `tag` — scans all retained
    * versions newest-first so an interleaved [[compact]] can't hide a
    * crashed batch's journal entry.
    */
  def versionTagged(tag: String): Option[Long] =
    snaps.completeVersions.sorted.reverse.find(tagOf(_).contains(tag))

  /** Write the delta segment (census + ids parquet, blooms built from
    * the written files so the delta plan evaluates once), then publish
    * `v` — segment first, manifest+marker last, the shared crash
    * contract.
    */
  private def writeDelta(census: DataFrame, docIds: DataFrame, v: Long,
      prevSegments: Seq[String], tag: Option[String] = None): Unit = {
    val seg = s"s$v"
    val censusPath = new Path(segRoot, s"$seg/census").toString
    census.select(col("fp"), col("n_docs"))
      .write.mode("overwrite").parquet(censusPath)
    val docsPath = new Path(segRoot, s"$seg/docs").toString
    docIds.select(col("doc_id")).write.mode("overwrite").parquet(docsPath)
    val wc = spark.read.parquet(censusPath)
    BloomSidecars.write(fs, new Path(segRoot, s"$seg/census_bloom"),
      BloomSidecars.build(wc, "fp", wc.count()))
    val wd = spark.read.parquet(docsPath)
    BloomSidecars.write(fs, new Path(segRoot, s"$seg/docs_bloom"),
      BloomSidecars.build(wd, "doc_id", wd.count()))
    snaps.publish(v) { v =>
      snaps.writeTextFile(new Path(snaps.versionPath(v), "segments"),
        (prevSegments :+ seg).mkString("\n"))
      tag.foreach(t =>
        snaps.writeTextFile(new Path(snaps.versionPath(v), "tag"), t))
    }
  }

  private def censusFrom(docs: DataFrame): DataFrame =
    censusFromWindows(TextOps.winnowWindows(docs))

  private def censusFromWindows(wins: DataFrame): DataFrame =
    wins.select(col("doc_id"), col("fp")).distinct()
      .groupBy(col("fp")).agg(count(lit(1)).as("n_docs"))

  /** Full build from a corpus (docs: doc_id, text) — the once-per-
    * corpus materialization. Duplicate ids collapse first (one vote
    * per document, the census invariant).
    */
  def build(docs: DataFrame): Unit = {
    val b = docs.dropDuplicates("doc_id").localCheckpoint()
    writeDelta(censusFrom(b), b.select(col("doc_id")),
      version.getOrElse(0L) + 1, Seq.empty)
  }

  /** Delta refresh: shingle only the id-FRESH documents of the batch,
    * write their census delta + ids as one segment. Replaying an
    * overlapping batch appends the empty delta — idempotent, and no
    * document ever double-counts.
    */
  def append(newDocs: DataFrame, tag: Option[String] = None): Unit = {
    val fresh = freshDocs(newDocs).localCheckpoint()
    appendShingled(fresh, TextOps.winnowWindows(fresh), tag)
  }

  /** The id-FRESH subset of `newDocs` (duplicate ids collapsed, then
    * already-ingested ids dropped via the bloom-pruned membership
    * probe) — [[append]]'s freshness rule, factored out so a caller
    * that also needs the fresh docs' winnowing windows (the streaming
    * span-dedup trigger audits against them) can shingle ONCE and
    * hand the windows to [[appendShingled]] instead of paying the
    * dominant per-trigger shingling cost twice.
    */
  def freshDocs(newDocs: DataFrame): DataFrame = {
    val b = newDocs.dropDuplicates("doc_id")
    b.join(knownDocs(b.select(col("doc_id"))), Seq("doc_id"), "left_anti")
  }

  /** [[append]] with the shingling already done: `windows` MUST be
    * `TextOps.winnowWindows(fresh)` for `fresh` ==
    * [[freshDocs]] of the batch (package-private so the invariant
    * stays inside graft — the census is still derived here, so a
    * caller cannot hand in a census that violates the one-vote-per-
    * document contract, only mismatched windows).
    */
  private[graft] def appendShingled(fresh: DataFrame, windows: DataFrame,
      tag: Option[String] = None): Unit = {
    val v = requireVersion()
    writeDelta(censusFromWindows(windows), fresh.select(col("doc_id")),
      v + 1, segmentsOf(v), tag)
  }

  /** Merge the current segments into ONE (the pre-aggregated census +
    * the disjoint id union) and publish as a new version — the
    * amortized bound on per-append sidecar/footer reads, as in the
    * sibling indexes.
    */
  def compact(): Long = {
    val v = requireVersion()
    val segs = segmentsOf(v)
    val ids = spark.read
      .parquet(segs.map(s => new Path(segRoot, s"$s/docs").toString): _*)
    writeDelta(census(), ids, v + 1, Seq.empty)
    v + 1
  }

  /** Drop all but the newest `keepLast` complete versions plus
    * markerless crash leftovers, then delete unreferenced segments.
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
