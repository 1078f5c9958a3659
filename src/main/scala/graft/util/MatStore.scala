package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-session materialized parquet tables (derived "index" stores —
  * MinHash signatures, trade-graph edge lists).
  *
  * Parquet temp dirs, NOT cache()/localCheckpoint(), because the
  * harness unpersists all blocks between queries. Sessions are keyed
  * by a stable UUID held in a WeakHashMap — identityHashCode can be
  * reused after a session is GC'd, which could have served a stale
  * table to a different session — and every dir is deleted by a JVM
  * shutdown hook, so repeated sessions in one process can't leak disk
  * unboundedly.
  */
object MatStore {
  private val sessionIds = new java.util.WeakHashMap[SparkSession, String]()
  private val dirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def sessionId(s: SparkSession): String = sessionIds.synchronized {
    Option(sessionIds.get(s)).getOrElse {
      val id = java.util.UUID.randomUUID().toString
      sessionIds.put(s, id)
      id
    }
  }

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    dirs.values().forEach(d => deleteRecursively(new java.io.File(d)))
  }))

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** The materialized table for (session, key); `build` runs at most
    * once per key per session and its result is persisted as parquet.
    *
    * `build` runs under a per-key lock, NOT inside a ConcurrentHashMap
    * mapping function: builds here are nested (clustersTable →
    * candidatesTable → minhashTable all re-enter `table`), and CHM's
    * computeIfAbsent contract forbids the mapping function touching
    * other mappings — a nested key landing in the in-flight bin throws
    * IllegalStateException("Recursive update"). The lock map's own
    * computeIfAbsent is safe: its mapping function allocates a plain
    * Object and never touches the map.
    */
  def table(s: SparkSession, key: String, prefix: String)(build: => DataFrame): DataFrame = {
    val k = s"${sessionId(s)}:$key"
    var path = dirs.get(k)
    if (path == null) {
      locks.computeIfAbsent(k, _ => new Object).synchronized {
        path = dirs.get(k)
        if (path == null) {
          val p = java.nio.file.Files.createTempDirectory(prefix).toString
          build.write.mode("overwrite").parquet(p)
          dirs.put(k, p)
          path = p
        }
      }
    }
    s.read.parquet(path)
  }

  private val tableNames = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val nameSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Like [[table]], but persisted as a catalog table bucketed (and
    * sorted) on `bucketCol` — downstream joins and aggregations keyed
    * on `bucketCol` read co-located buckets and plan without an
    * Exchange (see BucketingSpec). The files live in a tracked temp
    * dir (external table), so the shutdown hook reclaims them; the
    * catalog entry itself is session-scoped.
    */
  def bucketedTable(s: SparkSession, key: String, prefix: String,
      bucketCol: String, nBuckets: Int)(build: => DataFrame): DataFrame = {
    val k = s"${sessionId(s)}:$key"
    var name = tableNames.get(k)
    if (name == null) {
      locks.computeIfAbsent(k, _ => new Object).synchronized {
        name = tableNames.get(k)
        if (name == null) {
          val n = s"graft_bkt_${nameSeq.incrementAndGet()}"
          val p = java.nio.file.Files.createTempDirectory(prefix).toString
          build.write.mode("overwrite").option("path", p)
            .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
            .saveAsTable(n)
          dirs.put(k, p)
          tableNames.put(k, n)
          name = n
        }
      }
    }
    s.table(name)
  }
}
