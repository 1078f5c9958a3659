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
      // the stale fingerprint was swept on publish; one key dir with
      // exactly one live fingerprint remains
      val keyDirs = new java.io.File(root).listFiles().filter(_.isDirectory)
      assert(keyDirs.length == 1)
      assert(keyDirs.head.listFiles().count(_.isDirectory) == 1)
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
