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
  * Maintains two tables per version:
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
  * At sf0.1 the full d02 index build is the bench's biggest cold cost
  * (~9.5 s); this is the delta path that amortizes it across ingests.
  *
  * Versioning mirrors the graph views: immutable `v<k>` snapshot dirs
  * published with a completion marker written after BOTH tables commit
  * (a crash mid-publish leaves an invisible markerless dir), plus
  * `vacuum(keepLast)` retention. Single writer per index dir.
  *
  * Append is first-writer-wins per doc_id: a re-ingested doc_id keeps
  * its original signature (the delta is anti-joined against the stored
  * store), so replaying an overlapping crawl batch is idempotent.
  */
final class MinHashIndex(spark: SparkSession, indexDir: String) {
  private val hadoopConf = spark.sparkContext.hadoopConfiguration
  private def dir = new Path(indexDir)
  private def fs = dir.getFileSystem(hadoopConf)
  private val Marker = "_INDEX_OK"

  /** Newest COMPLETE index version (both tables + marker), if any. */
  def version: Option[Long] = {
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("v")).map(_.stripPrefix("v").toLong)
      .filter(v => fs.exists(new Path(dir, s"v$v/$Marker")))
      .sorted.lastOption
  }

  /** The signature store: (doc_id, mh0..mh8). */
  def signatures(): DataFrame = readTable("sig")

  /** The candidate-pair set: (doc_a, doc_b), doc_a < doc_b. */
  def candidates(): DataFrame = readTable("cand")

  private def readTable(which: String): DataFrame = {
    val v = version.getOrElse(
      throw new java.util.NoSuchElementException(s"index at $indexDir never built"))
    spark.read.parquet(new Path(dir, s"v$v/$which").toString)
  }

  private def write(sig: DataFrame, cand: DataFrame, v: Long): Unit = {
    sig.write.mode("overwrite").parquet(new Path(dir, s"v$v/sig").toString)
    cand.select(col("doc_a"), col("doc_b"))
      .write.mode("overwrite").parquet(new Path(dir, s"v$v/cand").toString)
    fs.create(new Path(dir, s"v$v/$Marker"), true).close()
  }

  /** Full build from a corpus (docs: doc_id, text) — initialization. */
  def build(docs: DataFrame): Unit = {
    val sig = Dedup.minhashes(docs)
    write(sig, Dedup.candidates(sig), version.getOrElse(0L) + 1)
  }

  /** Delta refresh for appended documents: shingle/minhash the NEW
    * docs only, union into the signature store, and extend the
    * candidate set by new-vs-all band matches. The old corpus text is
    * never touched — only the (index-sized) stored tables are read.
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
    val allCand = candidates().unionByName(newCand).distinct()

    // both snapshots fully computed from v<k> inputs before v<k+1> is
    // written; the marker publishes them atomically-enough
    write(allSig, allCand, v + 1)
  }

  /** Drop all but the newest `keepLast` complete index snapshots (the
    * served one always retained) plus markerless crash leftovers.
    */
  def vacuum(keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    if (!fs.exists(dir)) return Seq.empty
    val all = fs.listStatus(dir).filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("v")).map(_.stripPrefix("v").toLong).toSeq.sorted
    val complete = all.filter(v => fs.exists(new Path(dir, s"v$v/$Marker")))
    val keep = complete.takeRight(keepLast).toSet
    val dropped = all.filterNot(keep)
    dropped.foreach(v => fs.delete(new Path(dir, s"v$v"), true))
    dropped
  }
}
