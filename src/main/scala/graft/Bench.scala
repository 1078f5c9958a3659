package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every registered operator at the
  * driver-chosen scale factor and emits one JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM + parquet footers so per-query numbers measure the
    // plans, not first-touch class loading.
    SparkEntry.queries("q06_forecast_filter")(spark, sfDir).count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // A failed operator reports -1, not its elapsed time — a broken
      // query must not look like a fast success in the bench JSON.
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable => System.err.println(s"BENCH FAIL $name: $e"); false
      }
      val dt = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      // free cached/localCheckpoint blocks so one query's iteration
      // state can't pressure the next query's heap; the explicit GC
      // kicks ContextCleaner, which only releases old broadcast and
      // shuffle state on collection (a large heap may never collect
      // on its own, and 30+ accumulated broadcasts slow later joins)
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      System.gc()
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // Short summary line FIRST: the harness captures a bounded tail of
    // stdout, and the full per-query line (70+ entries) is long enough
    // that its head gets truncated mid-line, leaving nothing parseable.
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir"}""")
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(full)
    // Also persist the full JSON where truncation can't reach it.
    java.nio.file.Files.write(
      java.nio.file.Paths.get("bench.json"),
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
