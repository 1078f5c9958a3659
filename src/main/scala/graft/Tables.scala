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
    spark.read.parquet(s"$dir/$name.parquet")
}
