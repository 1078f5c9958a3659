package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Evidence for the SURVEY §5 co-location claim: two tables bucketed
  * on the join key join with ZERO exchanges — the plan shape that
  * turns a 100 TB fact-fact join from a full shuffle into a local
  * merge per bucket.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("bucketed co-located join plans without a shuffle") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      (1 to 1000).map(i => (i.toLong, s"left_$i")).toDF("k", "lv")
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_left")
      (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "rv")
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_right")
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free plan, got:\n$plan")
      assert(joined.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
