package graft.dedup

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, greatest, least}

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
  * so the join is delta-bands × all-bands, never a re-shingle and
  * never the old-vs-old self-join again. Old-vs-old collisions are
  * already in `cand` by induction, so the refreshed index equals a
  * full rebuild on the appended corpus (spec-proven).
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

  /** Write the delta segment for version `v`, then publish `v` as the
    * previous segments plus it. Segment first, manifest+marker last —
    * a crash in between leaves an orphan segment no version references.
    */
  private def writeDelta(sig: DataFrame, cand: DataFrame, v: Long,
      prevSegments: Seq[String]): Unit = {
    val seg = s"s$v"
    sig.write.mode("overwrite").parquet(new Path(segRoot, s"$seg/sig").toString)
    cand.select(col("doc_a"), col("doc_b"))
      .write.mode("overwrite").parquet(new Path(segRoot, s"$seg/cand").toString)
    snaps.publish(v) { v =>
      snaps.writeTextFile(new Path(snaps.versionPath(v), "segments"),
        (prevSegments :+ seg).mkString("\n"))
    }
  }

  /** Full build from a corpus (docs: doc_id, text) — initialization. */
  def build(docs: DataFrame): Unit = {
    val sig = Dedup.minhashes(docs)
    writeDelta(sig, Dedup.candidates(sig), version.getOrElse(0L) + 1, Seq.empty)
  }

  /** Delta refresh for appended documents: shingle/minhash the NEW
    * docs only, union into the signature store, and extend the
    * candidate set by new-vs-all band matches. The old corpus text is
    * never touched — only the (index-sized) stored tables are read —
    * and only the delta segment is written.
    */
  def append(newDocs: DataFrame): Unit = {
    val v = version.getOrElse(
      throw new java.util.NoSuchElementException(
        s"index at $indexDir never built — call build() first"))
    val oldSig = signatures()
    // first-writer-wins: drop re-ingested doc_ids before shingling
    val fresh = newDocs.join(oldSig.select(col("doc_id")), Seq("doc_id"), "left_anti")
    val newSig = Dedup.minhashes(fresh)
    val allSig = oldSig.unionByName(newSig)

    // new-vs-all band collisions; canonicalize (a<b) then dedup — a
    // new-new pair surfaces from both sides of the join, and a pair
    // sharing several bands surfaces once per band
    val nb = Dedup.bands(newSig)
      .select(col("doc_id").as("doc_n"), col("band"), col("bkey"))
    val ab = Dedup.bands(allSig)
      .select(col("doc_id").as("doc_o"), col("band").as("band_o"), col("bkey").as("bkey_o"))
    val newCand = nb.join(ab,
        col("band") === col("band_o") && col("bkey") === col("bkey_o") &&
          col("doc_n") =!= col("doc_o"))
      .select(least(col("doc_n"), col("doc_o")).as("doc_a"),
        greatest(col("doc_n"), col("doc_o")).as("doc_b"))
      .distinct()

    // delta fully computed from v<k> inputs before v<k+1> is written;
    // the manifest+marker publish it atomically-enough
    writeDelta(newSig, newCand, v + 1, segmentsOf(v))
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
