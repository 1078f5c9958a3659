package graft

import graft.util.MatStore
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class MatStoreSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("persistent mode serves across sessions and rebuilds on content change") {
    val root = java.nio.file.Files.createTempDirectory("graftidx").toString
    val src = java.nio.file.Files.createTempDirectory("graftsrc").toString
    Seq((1, "a"), (2, "b")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$src/t")
    var builds = 0
    def serve() = MatStore.table(spark, s"idx:$src", "graft_test") {
      builds += 1
      spark.read.parquet(s"$src/t")
    }
    sys.props("graft.index.dir") = root
    try {
      assert(serve().count() == 2 && builds == 1)
      // persistent mode has NO session memo: a second resolve re-reads
      // the published table exactly as a fresh JVM would — no rebuild
      assert(serve().count() == 2 && builds == 1)
      // source content change -> new fingerprint -> stale detected,
      // index rebuilt mid-session
      Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
        .write.mode("overwrite").parquet(s"$src/t")
      assert(serve().count() == 3 && builds == 2)
      assert(serve().count() == 3 && builds == 2)
      // the sweep is AGE-GATED: the superseded fingerprint (published
      // seconds ago) survives this publish — a reader mid-query on it
      // in another JVM must not get its files yanked
      val keyDirs = new java.io.File(root).listFiles().filter(_.isDirectory)
      assert(keyDirs.length == 1)
      assert(keyDirs.head.listFiles().count(_.isDirectory) == 2)
      // once past the grace period, the next publish sweeps it
      sys.props("graft.index.sweepGraceMs") = "0"
      Seq((4, "d")).toDF("id", "v")
        .write.mode("overwrite").parquet(s"$src/t")
      assert(serve().count() == 1 && builds == 3)
      assert(keyDirs.head.listFiles().count(_.isDirectory) == 1)
    } finally {
      sys.props.remove("graft.index.dir")
      sys.props.remove("graft.index.sweepGraceMs"): Unit
    }
  }

  test("a source changed mid-build is served session-scoped, not published") {
    val root = java.nio.file.Files.createTempDirectory("graftidx3").toString
    val src = java.nio.file.Files.createTempDirectory("graftsrc3").toString
    Seq((1, "a")).toDF("id", "v").write.mode("overwrite").parquet(s"$src/t")
    sys.props("graft.index.dir") = root
    try {
      var builds = 0
      def serve() = MatStore.table(spark, s"idx3:$src", "graft_test") {
        builds += 1
        if (builds == 1) {
          // simulate a writer racing the index job: the corpus is
          // rewritten while the build is reading it
          Seq((1, "a"), (2, "b")).toDF("id", "v")
            .write.mode("overwrite").parquet(s"$src/t")
        }
        spark.read.parquet(s"$src/t")
      }
      def publishedDirs() = new java.io.File(root).listFiles()
        .filter(_.isDirectory).find(_.getName.startsWith("idx3_"))
        .map(_.listFiles().filter(d => d.isDirectory &&
          !d.getName.startsWith(".build_") &&
          new java.io.File(d, "_SUCCESS").exists()).length).getOrElse(0)
      // the racy build serves its result for this session...
      assert(serve().count() == 2 && builds == 1)
      // ...but the post-build fingerprint no longer matches the
      // pre-build one, so nothing was published as fresh
      assert(publishedDirs() == 0)
      // the next resolve sees the settled source, rebuilds, publishes
      assert(serve().count() == 2 && builds == 2)
      assert(publishedDirs() == 1)
      assert(serve().count() == 2 && builds == 2)
    } finally sys.props.remove("graft.index.dir"): Unit
  }

  test("without a persist root, tables stay session-scoped and memoized") {
    val src = java.nio.file.Files.createTempDirectory("graftsrc2").toString
    Seq((1, "a")).toDF("id", "v").write.mode("overwrite").parquet(s"$src/t")
    var builds = 0
    def serve() = MatStore.table(spark, s"idx2:$src", "graft_test") {
      builds += 1
      spark.read.parquet(s"$src/t")
    }
    assert(serve().count() == 1 && builds == 1)
    assert(serve().count() == 1 && builds == 1) // session memo, no rebuild
  }
}
