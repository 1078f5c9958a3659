package graft

import graft.sources.{CsvIO, GraphTextIO, JsonlIO}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("G.txt roundtrip through the file source/sink") {
    val dir = java.nio.file.Files.createTempDirectory("gtxt")
    val edges = Seq((0, 1), (1, 2), (2, 0), (2, 3)).toDF("src", "dst")
    GraphTextIO.write(edges, n = 4, path = s"$dir/G1.txt")
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/G1.txt")), "UTF-8")
    assert(text == "4\n0 1 0 0\n0 0 1 0\n1 0 0 1\n0 0 0 0\n")
    val back = GraphTextIO.read(spark, s"$dir/G1.txt")
    assert(back.select("graph").distinct().collect().map(_.getString(0)).toSeq == Seq("G1"))
    val pairs = back.select("src", "dst").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(pairs == Set((0, 1), (1, 2), (2, 0), (2, 3)))
  }

  test("reading a directory of graph files keeps them separate") {
    val dir = java.nio.file.Files.createTempDirectory("gtxts")
    GraphTextIO.write(Seq((0, 1)).toDF("src", "dst"), 2, s"$dir/G1.txt")
    GraphTextIO.write(Seq((1, 0)).toDF("src", "dst"), 2, s"$dir/G2.txt")
    val all = GraphTextIO.read(spark, dir.toString)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(all == Set(("G1", 0, 1), ("G2", 1, 0)))
  }

  test("JSONL corpus roundtrip with pinned schema and corrupt-line capture") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    JsonlIO.write(docs, s"$dir/docs")
    // caching first: Spark disallows queries touching only the corrupt
    // column directly over raw JSON files
    val back = JsonlIO.read(spark, s"$dir/docs", docs.schema).cache()
    assert(back.filter(back("_corrupt").isNotNull).count() == 0)
    val a = docs.orderBy("doc_id").collect().toSeq
    val b = back.drop("_corrupt").select(docs.columns.map(back(_)): _*)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    // unpersist first: a logically-equal cached plan (same path +
    // schema) would otherwise serve the pre-corruption data
    back.unpersist()
    // a malformed line degrades to a _corrupt row, not a failed read
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/docs/zz_bad.json"), "{not json\n")
    val dirty = JsonlIO.read(spark, s"$dir/docs", docs.schema).cache()
    assert(dirty.filter(dirty("_corrupt").isNotNull).count() == 1)
    assert(dirty.filter(dirty("_corrupt").isNull).count() == a.size)
    dirty.unpersist()
  }

  test("CSV roundtrip with pinned schema and corrupt-row capture") {
    val dir = java.nio.file.Files.createTempDirectory("csvio").toString
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "source", "lang", "text") // CSV has no array columns
    CsvIO.write(docs, s"$dir/docs")
    val back = CsvIO.read(spark, s"$dir/docs", docs.schema).cache()
    assert(back.filter(back("_corrupt").isNotNull).count() == 0)
    val a = docs.orderBy("doc_id").collect().toSeq
    val b = back.drop("_corrupt").select(docs.columns.map(back(_)): _*)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    back.unpersist()
    // a wrong-type row degrades to _corrupt, not a failed read; CSV
    // part files carry a header line, so the bad file needs one too
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/docs/zz_bad.csv"),
      "doc_id,source,lang,text\nnot_a_number,web,en,hello\n")
    val dirty = CsvIO.read(spark, s"$dir/docs", docs.schema).cache()
    assert(dirty.filter(dirty("_corrupt").isNotNull).count() == 1)
    assert(dirty.filter(dirty("_corrupt").isNull).count() == a.size)
    dirty.unpersist()
  }

  test("CSV roundtrip survives embedded newlines, commas, quotes, and null vs empty") {
    val dir = java.nio.file.Files.createTempDirectory("csvhostile").toString
    val rows = Seq(
      (1L, "line one\nline two", "a,b,c"),
      (2L, "she said \"hi\"", null.asInstanceOf[String]),
      (3L, "", "plain"),
      (4L, "tab\there, and a trailing newline\n", "\"quoted,comma\"\nnext"),
      // the null-sentinel family: literal \N content must survive as a
      // STRING (not collapse to SQL NULL), and the escape must be a
      // bijection one level up (\\N) and leave near-misses alone
      (5L, "\\N", "\\\\N"),
      (6L, "back\\slash and \\N inside", "\\Nx"))
      .toDF("id", "text", "extra")
    CsvIO.write(rows, s"$dir/rows")
    val back = CsvIO.read(spark, s"$dir/rows", rows.schema).cache()
    assert(back.filter(back("_corrupt").isNotNull).count() == 0)
    val a = rows.orderBy("id").collect().toSeq
    val b = back.drop("_corrupt").select(rows.columns.map(back(_)): _*)
      .orderBy("id").collect().toSeq
    assert(a == b) // Row equality distinguishes null from "" per field
    back.unpersist()
  }

  test("CSV decodeSentinel=false ingests foreign files' backslash-N literally") {
    // a CSV written by another tool never had the writer's sentinel
    // escape applied: a quoted "\\N" field is literal content, not an
    // escape — opting out of the decode must preserve its bytes
    val dir = java.nio.file.Files.createTempDirectory("csvforeign").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/f"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/f/part.csv"),
      "id,text\n1,\\\\N\n2,\\N\n3,plain\n".getBytes("UTF-8"))
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("text", "string")
    val foreign = CsvIO.read(spark, s"$dir/f", schema, decodeSentinel = false)
      .orderBy("id").collect().map(r => if (r.isNullAt(1)) null else r.getString(1))
    assert(foreign.toSeq == Seq("\\\\N", null, "plain"))
    // default (writer-paired) mode on the same bytes strips one level
    val paired = CsvIO.read(spark, s"$dir/f", schema)
      .orderBy("id").collect().map(r => if (r.isNullAt(1)) null else r.getString(1))
    assert(paired.toSeq == Seq("\\N", null, "plain"))
  }

  test("GraftExtensions registers SQL vector functions") {
    // make sure we don't get handed the shared extension-less session
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    try testSql(s2)
    finally {
      SparkSession.clearActiveSession()
      prev.foreach(SparkSession.setDefaultSession)
    }
  }

  private def testSql(s2: SparkSession): Unit = {
    val df = s2.sql(
      """SELECT float_vec_dot(cast(array(1.0, 2.0) as array<float>),
        |                     cast(array(3.0, 4.0) as array<float>)) AS d,
        |       float_vec_norm(cast(array(3.0, 4.0) as array<float>)) AS n""".stripMargin)
    val r = df.collect()(0)
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 5.0)
    val topk = s2.sql(
      """SELECT g, top_k_scored(s, p, 2) AS top FROM VALUES
        |  (1, 0.5D, 10L), (1, 0.9D, 11L), (1, 0.9D, 7L), (2, 0.1D, 3L)
        |  AS t(g, s, p)
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    val g1 = topk(0).getSeq[org.apache.spark.sql.Row](1)
    assert(g1.map(r2 => (r2.getDouble(0), r2.getLong(1))) == Seq((0.9, 7L), (0.9, 11L)))
    assert(topk(1).getSeq[org.apache.spark.sql.Row](1).size == 1)
  }
}
