package graft.dedup

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, concat_ws, explode, greatest, least}

import graft.util.BloomSidecars

/** Incrementally-maintained MinHash/LSH dedup index — the LLM-pipeline
  * analog of [[graft.graph.DegreeView]], and the operator a daily crawl
  * actually runs: when new documents are APPENDED to a corpus, refresh
  * the signature store and the candidate-pair set without ever
  * re-shingling the old corpus.
  *
  * Maintains two logical tables:
  *
  *   - `sig`  (doc_id, mh0..mh8): the MinHash signature store
  *   - `cand` (doc_a, doc_b): LSH band-collision candidate pairs
  *
  * [[append]] computes signatures for the NEW documents only (the only
  * corpus-sized work, linear in the delta), then extends the candidate
  * set by new-vs-all band matches: bands are a per-row projection of
  * the signature table (three md5 calls per doc — index-sized, cheap),
  * so the join is delta-bands × stored-bands, never a re-shingle and
  * never the old-vs-old self-join again — and "stored" is BLOOM-PRUNED
  * to the segments whose band-key bloom might contain one of the
  * delta's keys, so a quiet day's crawl against a year of history
  * reads sidecar blooms plus the truly colliding segments, not the
  * year's signature store (no false negatives, so the candidate set
  * is exactly the unpruned join's). Old-vs-old collisions are already
  * in `cand` by induction, so the refreshed index equals a full
  * rebuild on the appended corpus (spec-proven).
  *
  * WRITES are O(delta) too, not just compute: each append persists only
  * a delta SEGMENT (`seg/s<k>/{sig,cand}` — the new docs' signatures
  * and the new candidate pairs), and a version publishes a tiny
  * manifest (`v<k>/segments`) listing the segments it is the union of.
  * Reading a table is a multi-path parquet scan over the manifest's
  * segments — no distinct needed, because segment contents are provably
  * disjoint: signatures by the first-writer-wins anti-join, candidate
  * pairs because every pair emitted at version k involves ≥ 1 doc first
  * ingested at k (an old-vs-old pair can never re-surface). Without
  * this, a daily 100 TB crawl would rewrite the whole candidate table
  * per ingest — the exact bottleneck the operator exists to avoid.
  *
  * At sf0.1 the full d02 index build is the bench's biggest cold cost
  * (~9.5 s); this is the delta path that amortizes it across ingests.
  *
  * Versioning is the shared [[graft.util.VersionedTableStore]]
  * contract: immutable `v<k>` dirs published with a completion marker
  * written after the manifest commits (a crash mid-publish leaves an
  * invisible markerless dir, and a crash between the segment write and
  * the publish leaves an orphan segment that [[vacuum]] sweeps), plus
  * `vacuum(keepLast)` retention that also deletes segments no retained
  * version references. Single writer per index dir.
  *
  * Append is first-writer-wins per doc_id: a re-ingested doc_id keeps
  * its original signature (the delta is anti-joined against the stored
  * store), so replaying an overlapping crawl batch is idempotent.
  */
final class MinHashIndex(spark: SparkSession, indexDir: String) {
  private val snaps = new graft.util.VersionedTableStore(spark, indexDir, "_INDEX_OK")
  private def segRoot = new Path(snaps.dir, "seg")
  private def fs = snaps.fs

  /** Newest COMPLETE index version (manifest + marker), if any. */
  def version: Option[Long] = snaps.version

  /** The signature store: (doc_id, mh0..mh8). */
  def signatures(): DataFrame = readTable("sig")

  /** The candidate-pair set: (doc_a, doc_b), doc_a < doc_b. */
  def candidates(): DataFrame = readTable("cand")

  /** The candidate pairs ADDED at version `v` — exactly the pairs with
    * at least one endpoint first ingested by that version's delta
    * (segment contents are disjoint by construction, see the class
    * doc). This is the O(batch)-sized read the streaming crawl-dedup
    * needs: the dup decision for one ingest touches the ingest's own
    * collisions, never the full corpus-lifetime pair set.
    */
  def candidatesAddedAt(v: Long): DataFrame = {
    require(snaps.completeVersions.contains(v), s"no complete version $v")
    spark.read.parquet(new Path(segRoot, s"s$v/cand").toString)
  }

  /** The doc_ids first ingested at version `v` — the version's delta
    * segment, an O(batch) read.
    */
  def idsAddedAt(v: Long): DataFrame = {
    require(snaps.completeVersions.contains(v), s"no complete version $v")
    spark.read.parquet(new Path(segRoot, s"s$v/sig").toString)
      .select(col("doc_id"))
  }

  /** The caller-supplied tag version `v` was published with, if any —
    * the streaming crawl's batch journal (one tiny file per version).
    */
  def tagOf(v: Long): Option[String] = {
    val p = new Path(snaps.versionPath(v), "tag")
    if (fs.exists(p)) Some(snaps.readTextFile(p).trim) else None
  }

  /** Newest complete version carrying `tag` — the replay detector.
    * Scans ALL retained versions (newest first, tiny manifest reads,
    * count bounded by [[vacuum]] retention) rather than only the
    * newest, so a maintenance [[compact]] published between a crashed
    * append and its replay cannot hide the batch's journal entry.
    */
  def versionTagged(tag: String): Option[Long] =
    snaps.completeVersions.sorted.reverse.find(tagOf(_).contains(tag))

  // ---- bloom sidecars: O(batch)-read membership ----------------------
  // (machinery shared with SignLshIndex via graft.util.BloomSidecars;
  // fpp trade documented there — the 0.001 setting measured 1-2
  // false-positive segment reads per trigger as spikes in the
  // read-flatness spec, 1e-4 retires them)

  /** The subset of `ids` (a doc_id column) ALREADY in the signature
    * store — the first-writer-wins membership probe, reading O(batch +
    * bloom bytes) instead of the store's full doc_id column: each
    * segment's id bloom is delta-sized (~2.4 B/doc) and rules the
    * segment out with no false negatives; only ids some bloom claims
    * (true re-ingestions plus ~fpp false positives) pay an exact
    * semi-join, against ONLY the claiming segments.
    */
  def knownIds(ids: DataFrame): DataFrame = {
    val segs = currentSegments()
    BloomSidecars.knownKeys(spark, ids, "doc_id", fs,
      segs.map(s => new Path(segRoot, s"$s/ids_bloom")),
      segs.map(s => new Path(segRoot, s"$s/sig")))
  }

  /** Combined LSH band key (band || bkey) as one bloom-able string. */
  private def bandKey = concat_ws(":", col("band"), col("bkey"))

  /** Indices (into `segs`) of segments whose band bloom might contain
    * any of `nb`'s band keys — the segments a delta's candidate join
    * must actually read. No false negatives: a segment whose bloom
    * rejects every delta band key cannot hold a band collision.
    */
  private def bandHitSegments(nb: DataFrame, segs: Seq[String]): Seq[Int] = {
    val bc = spark.sparkContext.broadcast(segs.map(s =>
      BloomSidecars.read(fs, new Path(segRoot, s"$s/bands_bloom"))).toArray)
    nb.select(explode(BloomSidecars.stringHits(bc)(bandKey)).as("i"))
      .distinct().collect().map(_.getInt(0)).sorted.toSeq
  }

  /** Segment names the newest complete version is the union of. */
  private def currentSegments(): Seq[String] = {
    val v = version.getOrElse(
      throw new java.util.NoSuchElementException(s"index at $indexDir never built"))
    segmentsOf(v)
  }

  private def segmentsOf(v: Long): Seq[String] =
    snaps.readTextFile(new Path(snaps.versionPath(v), "segments"))
      .split("\n").map(_.trim).filter(_.nonEmpty).toSeq

  private def readTable(which: String): DataFrame = {
    val paths = currentSegments().map(s => new Path(segRoot, s"$s/$which").toString)
    spark.read.parquet(paths: _*)
  }

  /** Write the delta segment for version `v` (sig + cand parquet plus
    * the two bloom sidecars — `ids_bloom` over the delta's doc_ids,
    * `bands_bloom` over its LSH band keys, both delta-sized), then
    * publish `v` as the previous segments plus it. Segment first,
    * manifest+marker last — a crash in between leaves an orphan
    * segment no version references.
    *
    * `sig` must be materialized (checkpointed) by the caller: it is
    * consumed three times here (parquet write, two bloom builds).
    */
  private def writeDelta(sig: DataFrame, cand: DataFrame, v: Long,
      prevSegments: Seq[String], tag: Option[String]): Unit = {
    val seg = s"s$v"
    sig.write.mode("overwrite").parquet(new Path(segRoot, s"$seg/sig").toString)
    cand.select(col("doc_a"), col("doc_b"))
      .write.mode("overwrite").parquet(new Path(segRoot, s"$seg/cand").toString)
    val n = sig.count()
    BloomSidecars.write(fs, new Path(segRoot, s"$seg/ids_bloom"),
      BloomSidecars.build(sig, "doc_id", n))
    BloomSidecars.write(fs, new Path(segRoot, s"$seg/bands_bloom"),
      BloomSidecars.build(
        Dedup.bands(sig).select(bandKey.as("bk")), "bk", n * Dedup.BANDS))
    snaps.publish(v) { v =>
      snaps.writeTextFile(new Path(snaps.versionPath(v), "segments"),
        (prevSegments :+ seg).mkString("\n"))
      tag.foreach(t =>
        snaps.writeTextFile(new Path(snaps.versionPath(v), "tag"), t))
    }
  }

  /** Full build from a corpus (docs: doc_id, text) — initialization. */
  def build(docs: DataFrame): Unit = {
    val sig = Dedup.minhashes(docs).localCheckpoint()
    writeDelta(sig, Dedup.candidates(sig), version.getOrElse(0L) + 1,
      Seq.empty, None)
  }

  /** Delta refresh for appended documents: shingle/minhash the NEW
    * docs only, union into the signature store, and extend the
    * candidate set by new-vs-all band matches. The old corpus text is
    * never touched, and the INDEX-sized reads are bloom-pruned too:
    *
    *  - first-writer-wins membership runs through [[knownIds]]
    *    (per-segment id blooms), not a full doc_id column scan;
    *  - the new-vs-all band join reads ONLY the segments whose band
    *    bloom might contain one of the delta's band keys
    *    ([[bandHitSegments]] — no false negatives, so the candidate
    *    set equals the unpruned join's exactly). A quiet day's crawl
    *    against a year of history reads blooms plus the few truly
    *    colliding segments, not the year's signature store.
    *
    * Only the delta segment (plus its blooms) is written.
    *
    * @param tag optional journal tag published with the version (see
    *            [[tagOf]]) — the streaming crawl's replay detector
    */
  def append(newDocs: DataFrame, tag: Option[String] = None): Unit =
    // first-writer-wins: drop re-ingested doc_ids before shingling
    appendFresh(newDocs.join(knownIds(newDocs.select(col("doc_id"))),
      Seq("doc_id"), "left_anti"), tag)

  /** [[append]] minus the membership probe — for callers (the
    * streaming crawl) that already ran [[knownIds]] this trigger and
    * hold the anti-joined result. `fresh` MUST contain no stored
    * doc_id and no duplicate doc_id, or segment disjointness breaks.
    */
  private[graft] def appendFresh(fresh: DataFrame,
      tag: Option[String] = None): Unit = {
    val v = version.getOrElse(
      throw new java.util.NoSuchElementException(
        s"index at $indexDir never built — call build() first"))
    val segs = segmentsOf(v)
    val newSig = Dedup.minhashes(fresh).localCheckpoint()

    // new-vs-all band collisions over the bloom-surviving segments
    // (plus new-vs-new via the delta's own bands); canonicalize (a<b)
    // then dedup — a new-new pair surfaces from both sides of the
    // join, and a pair sharing several bands surfaces once per band
    val nb = Dedup.bands(newSig)
      .select(col("doc_id").as("doc_n"), col("band"), col("bkey"))
      .localCheckpoint()
    val hit = bandHitSegments(nb, segs)
    val oldRelevant =
      if (hit.isEmpty) newSig.limit(0)
      else spark.read.parquet(
        hit.map(i => new Path(segRoot, s"${segs(i)}/sig").toString): _*)
    val ab = Dedup.bands(oldRelevant.unionByName(newSig))
      .select(col("doc_id").as("doc_o"), col("band").as("band_o"), col("bkey").as("bkey_o"))
    val newCand = nb.join(ab,
        col("band") === col("band_o") && col("bkey") === col("bkey_o") &&
          col("doc_n") =!= col("doc_o"))
      .select(least(col("doc_n"), col("doc_o")).as("doc_a"),
        greatest(col("doc_n"), col("doc_o")).as("doc_b"))
      .distinct()

    // delta fully computed from v<k> inputs before v<k+1> is written;
    // the manifest+marker publish it atomically-enough
    writeDelta(newSig, newCand, v + 1, segs, tag)
  }

  /** Merge the current version's segments into ONE and publish it as
    * a new version (tagged `compaction`, which no crawl batch tag can
    * collide with). Read-equality is free — segments are disjoint, so
    * the merged tables are exactly the union the old manifest served —
    * and the rewrite is O(corpus), amortized: a per-trigger append
    * adds a segment, and segment COUNT is what grows per-trigger
    * sidecar/footer reads and bloom-probe width, so a periodic
    * compact (weekly, against a day-granularity crawl) bounds it.
    * Old versions still reference the pre-compaction segments until
    * [[vacuum]] retires them; run compaction from the same
    * single-writer maintenance loop as appends, never between an
    * append and its streaming sink's completion ([[versionTagged]]
    * keeps replay detection correct across a compaction, but a
    * vacuumed-away tagged version cannot be replayed — retain ≥ 1
    * version of slack).
    *
    * @return the published compaction version
    */
  def compact(): Long = {
    val v = version.getOrElse(
      throw new java.util.NoSuchElementException(
        s"index at $indexDir never built — call build() first"))
    // No pin (cf. writeDelta's materialization contract, which is for
    // COMPUTED deltas): signatures() is a parquet read over the old
    // segments, which stay on disk until a later vacuum() — the
    // multiple consumptions re-scan stable storage instead of holding
    // a full-store localCheckpoint copy alongside the rewrite.
    writeDelta(signatures(), candidates(), v + 1, Seq.empty, Some("compaction"))
    v + 1
  }

  /** Drop all but the newest `keepLast` complete index versions (the
    * served one always retained) plus markerless crash leftovers, then
    * delete every segment no retained complete version references
    * (including orphans from a crash between segment write and
    * publish). Returns the dropped versions.
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
