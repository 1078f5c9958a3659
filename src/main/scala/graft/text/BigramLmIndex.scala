package graft.text

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.BloomSidecars

/** Incrementally-maintained bigram language-model census — the SIXTH
  * member of the incremental-index family ([[graft.dedup.MinHashIndex]]:
  * near-dup candidates, [[graft.dedup.GramIndex]]: decontamination
  * grams, [[graft.sim.SignLshIndex]]: ANN, [[WinnowIndex]]: span
  * census, [[graft.sim.PqIndex]]: IVFADC codes), and the store a
  * production crawl keeps to run t20's coherence scoring at ingest
  * without re-tokenizing history: the corpus bigram census and its
  * left-context marginal are materialized once, then APPENDED per
  * crawl batch — only the batch's documents are ever tokenized.
  *
  * Two logical tables, both ADDITIVE over segments (the WinnowIndex
  * census rule — no cross-segment dedup, the corpus count is the
  * per-key SUM):
  *  - `census` (bigram, c)  — occurrences of each adjacent token pair
  *    across the corpus token stream ([[TextOps.bigramStream]], the
  *    same extraction t20 registers);
  *  - `lefts`  (w1, c)      — occurrences of each token as LEFT
  *    context (= Σ census over its continuations), stored
  *    pre-aggregated per segment because the left-context probe keys
  *    by w1: a bigram-keyed bloom cannot prune a w1 probe, and
  *    deriving c(w1·) at probe time would need EVERY segment's census
  *    rows for that w1, not just the probed bigrams'.
  * Counts are occurrences, so a document must be ingested exactly
  * once: appends are restricted to id-FRESH docs (per-segment doc_id
  * tables + blooms, the family's first-writer-wins rule) and a
  * replayed batch appends the empty delta.
  *
  * WRITES are O(batch): one delta segment (census + lefts + ids,
  * Heaps'-bounded in the batch) + three delta-sized blooms + a tiny
  * manifest. The scoring probes ([[censusAtFor]]/[[leftsAtFor]]) are
  * bloom-pruned partial sums: per-segment sidecars rule segments out
  * with no false negatives — so the per-key sum over claiming
  * segments is the complete count — and only claiming segments'
  * parquet is opened. A batch's own keys always claim its own
  * segment, so every probed ratio has c ≥ 1 (the self-inclusive
  * census t20's self-scoring defines; no smoothing needed).
  *
  * Drift note: the census is FROZEN history — an earlier doc's score
  * is never revised when later crawls shift the distribution (the
  * crawlDedup arrival-time rule). The trajectory of per-batch mean
  * surprise over versions IS the domain-drift signal
  * (StreamingSpec exercises it through [[graft.streaming.StreamOps.lmScoreStream]]).
  *
  * Versioning, crash behavior, [[compact]]/[[vacuum]], and the tag
  * journal are the shared [[graft.util.VersionedTableStore]] contract
  * of the five sibling indexes. Single writer per index dir.
  */
final class BigramLmIndex(spark: SparkSession, indexDir: String) {
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

  private def emptyCounts(key: String): DataFrame =
    spark.range(0).select(col("id").cast("string").as(key), col("id").as("c"))

  private def countsOf(segs: Seq[String], table: String, key: String): DataFrame =
    if (segs.isEmpty) emptyCounts(key)
    else spark.read
      .parquet(segs.map(s => new Path(segRoot, s"$s/$table").toString): _*)
      .groupBy(col(key)).agg(sum(col("c")).as("c"))

  /** The corpus-lifetime bigram census: (bigram, c) summed over segments. */
  def census(): DataFrame = countsOf(segmentsOf(requireVersion()), "census", "bigram")

  /** The corpus-lifetime left-context marginal: (w1, c). */
  def lefts(): DataFrame = countsOf(segmentsOf(requireVersion()), "lefts", "w1")

  /** Bloom-pruned partial-sum probe of `table` (keyed by `key`) as of
    * version `v` — INCLUDING v's own delta (the self-inclusive census
    * scoring reads). Complete per key: blooms have no false negatives,
    * so non-claiming segments contribute zero by proof, not by hope.
    */
  private def countsAtFor(v: Long, table: String, key: String,
      keys: DataFrame): DataFrame = {
    val segs = segmentsOf(v)
    if (segs.isEmpty) return emptyCounts(key)
    val bc = spark.sparkContext.broadcast(
      segs.map(s => BloomSidecars.read(fs, new Path(segRoot, s"$s/${table}_bloom")))
        .toArray)
    val suspects = keys.select(col(key)).distinct()
      .withColumn("segi", BloomSidecars.stringHits(bc)(col(key)))
      .filter(size(col("segi")) > 0)
      .localCheckpoint()
    val segIdx = suspects.select(explode(col("segi")).as("i"))
      .distinct().collect().map(_.getInt(0)).sorted
    if (segIdx.isEmpty) emptyCounts(key)
    else spark.read
      .parquet(segIdx.map(i => new Path(segRoot, s"${segs(i)}/$table").toString)
        .toSeq: _*)
      .join(suspects.select(col(key)), Seq(key), "left_semi")
      .groupBy(col(key)).agg(sum(col("c")).as("c"))
  }

  /** (bigram, c) as of version `v`, restricted to the probe bigrams. */
  def censusAtFor(v: Long, bigrams: DataFrame): DataFrame =
    countsAtFor(v, "census", "bigram", bigrams)

  /** (w1, c) as of version `v`, restricted to the probe left tokens. */
  def leftsAtFor(v: Long, w1s: DataFrame): DataFrame =
    countsAtFor(v, "lefts", "w1", w1s)

  /** The doc_ids first ingested at version `v` — the version's delta
    * segment, an O(batch) read (the replay path's fresh set).
    */
  def idsAddedAt(v: Long): DataFrame = {
    require(snaps.completeVersions.contains(v), s"no complete version $v")
    spark.read.parquet(new Path(segRoot, s"s$v/docs").toString)
  }

  /** The subset of `ids` ALREADY ingested — bloom-pruned, exact-
    * confirmed (first-writer-wins membership).
    */
  def knownDocs(ids: DataFrame): DataFrame = {
    val segs = segmentsOf(requireVersion())
    BloomSidecars.knownKeys(spark, ids, "doc_id", fs,
      segs.map(s => new Path(segRoot, s"$s/docs_bloom")),
      segs.map(s => new Path(segRoot, s"$s/docs")))
  }

  /** The id-FRESH subset of `newDocs` (duplicate ids collapsed, then
    * already-ingested ids dropped) — [[append]]'s freshness rule,
    * factored out so the streaming driver can tokenize the fresh docs
    * ONCE and share the bigram stream with [[appendBigrams]].
    */
  def freshDocs(newDocs: DataFrame): DataFrame = {
    val b = newDocs.dropDuplicates("doc_id")
    b.join(knownDocs(b.select(col("doc_id"))), Seq("doc_id"), "left_anti")
  }

  def tagOf(v: Long): Option[String] = {
    val p = new Path(snaps.versionPath(v), "tag")
    if (fs.exists(p)) Some(snaps.readTextFile(p).trim) else None
  }

  /** Newest complete version carrying `tag` — newest-first so an
    * interleaved [[compact]] can't hide a crashed batch's journal.
    */
  def versionTagged(tag: String): Option[Long] =
    snaps.completeVersions.sorted.reverse.find(tagOf(_).contains(tag))

  /** Write the delta segment (census + lefts + ids, blooms built from
    * the written parquet so the delta plan evaluates once), publish
    * `v` — segment first, manifest+marker last, the crash contract.
    */
  private def writeDelta(census: DataFrame, docIds: DataFrame, v: Long,
      prevSegments: Seq[String], tag: Option[String] = None): Unit = {
    val seg = s"s$v"
    def writeBloomed(df: DataFrame, table: String, key: String): DataFrame = {
      val p = new Path(segRoot, s"$seg/$table").toString
      df.write.mode("overwrite").parquet(p)
      val w = spark.read.parquet(p)
      BloomSidecars.write(fs, new Path(segRoot, s"$seg/${table}_bloom"),
        BloomSidecars.build(w, key, w.count()))
      w
    }
    // lefts derive from the WRITTEN census parquet — stable storage, so
    // the (possibly expensive) delta plan evaluates exactly once
    val wc = writeBloomed(census.select(col("bigram"), col("c")), "census", "bigram")
    writeBloomed(wc
      .groupBy(expr("split_part(bigram, ' ', 1)").as("w1"))
      .agg(sum(col("c")).as("c")), "lefts", "w1")
    writeBloomed(docIds.select(col("doc_id")), "docs", "doc_id")
    snaps.publish(v) { v =>
      snaps.writeTextFile(new Path(snaps.versionPath(v), "segments"),
        (prevSegments :+ seg).mkString("\n"))
      tag.foreach(t =>
        snaps.writeTextFile(new Path(snaps.versionPath(v), "tag"), t))
    }
  }

  private def censusFromBigrams(big: DataFrame): DataFrame =
    big.groupBy(col("bigram")).agg(count(lit(1)).as("c"))

  /** Full build from a corpus (docs: doc_id, text). */
  def build(docs: DataFrame): Unit = {
    val b = docs.dropDuplicates("doc_id").localCheckpoint()
    writeDelta(censusFromBigrams(TextOps.bigramStream(b)),
      b.select(col("doc_id")), version.getOrElse(0L) + 1, Seq.empty)
  }

  /** Delta refresh: tokenize only the id-FRESH documents, append their
    * census delta + ids as one segment. A replayed batch appends the
    * empty delta — no occurrence ever double-counts.
    */
  def append(newDocs: DataFrame, tag: Option[String] = None): Unit = {
    val fresh = freshDocs(newDocs).localCheckpoint()
    appendBigrams(fresh, TextOps.bigramStream(fresh), tag)
  }

  /** [[append]] with tokenization already done: `big` MUST be
    * `TextOps.bigramStream(fresh)` for `fresh` == [[freshDocs]] of the
    * batch (package-private; the census is still derived here, so a
    * caller can only hand in mismatched streams, not a forged census).
    */
  private[graft] def appendBigrams(fresh: DataFrame, big: DataFrame,
      tag: Option[String] = None): Unit = {
    val v = requireVersion()
    writeDelta(censusFromBigrams(big), fresh.select(col("doc_id")),
      v + 1, segmentsOf(v), tag)
  }

  /** Merge the current segments into ONE (pre-summed census + disjoint
    * id union) and publish as a new version.
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
