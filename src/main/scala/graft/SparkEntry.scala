package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The trade-graph build is the engine's signature move:
    * four-table star join distilled into the weighted edge list every
    * graph operator consumes.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("g01_build_edges")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(op => op.name -> op.run).toMap

  /** DuckDB-runnable oracle SQL per query (same parquet tables). */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(op => op.oracle.map(op.name -> _)).toMap
}
