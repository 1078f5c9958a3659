package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated parquet star schema (TESTDATA.md).
  *
  * Scale note: `spark.read.parquet` gives Catalyst a relation it can
  * push filters/projections into — every operator in this library
  * starts from these scans so pruning reaches the file footer level.
  * On a real cluster the same paths would be s3/hdfs URIs; nothing
  * here assumes local files.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.util.Par.readParquet(spark, s"$dir/$name.parquet")

  /** The table as a session-bucketed catalog table, bucketed AND
    * sorted on `key` — the ingest-time layout a 100 TB deployment
    * maintains for its fact tables. Every join or aggregation keyed on
    * the bucket column then plans without an Exchange (BucketingSpec
    * proves the shape; the orderkey spine build and the OLAP
    * fact-fact joins q03/q05 consume it). Built at most once per
    * (session, corpus, table, key): the one bucketing shuffle replaces
    * the per-query join shuffles of every consumer. Column pruning and
    * filter pushdown still reach the bucketed parquet scan. A table
    * may be laid out under SEVERAL keys (orders on o_orderkey for the
    * lineitem spine, on o_custkey for the customer join) — the
    * standard multi-layout ingest trade: each extra layout costs one
    * ingest shuffle and once the workload joins the table on that key
    * more than once, it pays for itself.
    */
  def bucketed(spark: SparkSession, dir: String, name: String, key: String): DataFrame =
    graft.util.MatStore.bucketedTable(spark, s"bktfact_${name}_$key:$dir",
      s"graft_bf_$name", key,
      graft.util.Par.shufflePartitions(spark))(apply(spark, dir, name))
}
