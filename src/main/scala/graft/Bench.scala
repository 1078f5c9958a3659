package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every registered operator at the
  * driver-chosen scale factor and emits one JSON line.
  *
  * Self-defending against a noisy host: each query is timed three
  * times and the MEDIAN is reported (a one-off scheduler stall can't
  * triple a query's number), and /proc/loadavg is sampled before and
  * after the run so a contended machine is visible in the artifact
  * itself rather than looking like a code regression.
  */
object Bench {
  private def loadavg(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
    catch { case _: Throwable => "" }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val loadStart = loadavg()
    val tStart = java.time.Instant.now().toString
    // Warm the JVM + parquet footers so per-query numbers measure the
    // plans, not first-touch class loading.
    SparkEntry.queries("q06_forecast_filter")(spark, sfDir).count()

    def freeState(): Unit = {
      // free cached/localCheckpoint blocks so one query's iteration
      // state can't pressure the next query's heap
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        // A failed operator reports -1, not its elapsed time — a broken
        // query must not look like a fast success in the bench JSON.
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable => System.err.println(s"BENCH FAIL $name: $e"); false
        }
        val dt = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        freeState()
        dt
      }
      // One explicit GC per QUERY (not per rep — reps x queries gc
      // pauses cost ~1 min of wall clock): kicks ContextCleaner, which
      // only releases old broadcast and shuffle state on collection (a
      // large heap may never collect on its own, and 30+ accumulated
      // broadcasts slow later joins)
      System.gc()
      val dt =
        if (times.contains(-1.0)) -1.0
        else times.sorted.apply(times.size / 2)
      (name, dt, times)
    }
    val loadEnd = loadavg()
    val tEnd = java.time.Instant.now().toString
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // Per-rep times, in execution order. Rep 1 is the COLD run: for the
    // operators backed by MatStore's session-level memoization (shared
    // signature/edge/sketch/KNN index tables) it includes the one-time
    // index build; later reps re-read the memoized parquet. The median
    // therefore measures steady-state session cost, cold_value measures
    // first-touch cost — both are real, so both are reported instead of
    // letting the median silently hide the builds.
    val qreps = results.map { case (k, _, ts) =>
      "\"" + k + "\":" + ts.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val coldTotal = results.map(_._3.head).filter(_ >= 0).sum
    val note = "rep 1 is cold (includes one-time MatStore index builds " +
      "shared across operators); reps 2+ re-use session-memoized index " +
      "tables; value=sum of per-query medians, cold_value=sum of rep-1 times"
    val env =
      s""""reps":$reps,"loadavg_start":"$loadStart","loadavg_end":"$loadEnd","t_start":"$tStart","t_end":"$tEnd""""
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","cold_value":$coldTotal,"queries":$qs,"queries_reps":$qreps,"note":"$note",$env,"sf":"$sfDir"}"""
    // Long per-query line first; persist a copy where truncation can't
    // reach it; SHORT summary line LAST — the harness captures a
    // bounded TAIL of stdout, so whatever must survive goes at the end.
    println(full)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("bench.json"),
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    println(s"""{"metric":"total","value":$total,"unit":"sec","cold_value":$coldTotal,"reps":$reps,"loadavg_end":"$loadEnd","sf":"$sfDir"}""")
  }
}
