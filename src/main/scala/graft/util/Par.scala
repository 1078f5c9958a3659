package graft.util

import org.apache.spark.sql.SparkSession

/** Session parallelism lookup shared by every operator that sizes an
  * explicit repartition or bucket count from the shuffle-partition
  * conf. `spark.sql.shuffle.partitions` is not guaranteed numeric on
  * every deployment (e.g. "auto" under some vendors' AQE modes), so a
  * non-numeric value falls back to the scheduler's default parallelism
  * instead of throwing NumberFormatException mid-query.
  */
object Par {
  def shufflePartitions(s: SparkSession): Int =
    try s.conf.get("spark.sql.shuffle.partitions").toInt
    catch { case _: NumberFormatException => s.sparkContext.defaultParallelism }
}
