package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Every registered operator must at least run and return rows at
  * sf0.001 (the driver's t1 smoke contract); oracle-exactness is the
  * separate t2 gate via tools/check.py.
  */
class SmokeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  Registry.all.foreach { op =>
    test(s"${op.name} returns rows at sf0.001") {
      assert(op.run(spark, dir).count() > 0)
    }
  }

  test("every oracle name has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("registry names are unique and every query is oracle-checked") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate op names: ${names.diff(names.distinct)}")
    // the round-3 invariant: zero rows-only checks
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet)
  }
}
