package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, HigherOrderFunction}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Permanent gate for the round-14 pushdown-inlining hazard:
  * Catalyst's PushPredicateThroughProject/CollapseProject substitute a
  * projected alias into consumers with NO cost model, and
  * InferFiltersFromGenerate adds a `size(col) > 0` filter below every
  * non-outer explode — when the alias is an interpreted-HOF chain
  * (transform/aggregate/filter never enter codegen), the chain lands
  * inlined SEVERAL times in one Filter/Project and re-evaluates per
  * row on the narrowest stage (measured 10-250x on t14 before its
  * MatStore barrier; unfinishable at sf1).
  *
  * The detector walks every registered query's OPTIMIZED physical
  * plan and, per plan node, counts occurrences of the same
  * canonicalized HigherOrderFunction subtree across that node's
  * expressions. The hazard signature is the same heavy subtree
  * inlined >= [[HofInliningSpec.MaxDup]]+1 times in ONE node; a
  * seeded reconstruction of the t14 bug must trip it, and no
  * registered query may.
  */
class HofInliningSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** Max tolerated copies of one canonicalized HOF subtree within a
    * single plan node. 2 admits the benign compare-two-columns shape
    * (e.g. a norm evaluated for both join sides bound in one
    * projection); the t14 bug class inlines the chain once per
    * downstream consumer and lands at 3+ immediately.
    */
  private val MaxDup = 2

  /** (worst duplication count, offending node string) over the plan. */
  private def worstHofDup(plan: SparkPlan): (Int, String) = {
    var worst = (0, "")
    plan.foreach { node =>
      val hofs: Seq[Expression] =
        node.expressions.flatMap(_.collect { case h: HigherOrderFunction => h })
      if (hofs.nonEmpty) {
        val dup = hofs.groupBy(_.canonicalized).values.map(_.size).max
        if (dup > worst._1) worst = (dup, node.nodeName + ": " +
          node.simpleString(200))
      }
    }
    worst
  }

  test("the detector catches a seeded reconstruction of the t14 inlining bug") {
    // the bug shape: heavy HOF alias -> repartition -> filter + explode
    // WITHOUT a materialization barrier; pushdown inlines the chain
    // into the inferred/explicit filters and every consumer
    val df = Tables(spark, dir, "documents")
      .repartition(4)
      .withColumn("toks", expr("filter(split(text, ' '), t -> t != '')"))
      .withColumn("hs", expr(
        """transform(toks, g -> aggregate(sequence(1, length(g)), cast(0 as bigint),
           (acc, i) -> acc + ascii(substring(g, i, 1))))"""))
      .filter(expr("size(hs) >= 4"))
      .select(col("doc_id"), explode(col("hs")).as("h"), size(col("hs")).as("n"))
    val (dup, where) = worstHofDup(df.queryExecution.sparkPlan)
    assert(dup > MaxDup,
      s"seeded t14-bug plan not detected (max dup $dup) — the gate is blind:\n$where")
  }

  Registry.all.foreach { op =>
    test(s"${op.name} never inlines one HOF subtree > $MaxDup times in a node") {
      val (dup, where) = worstHofDup(
        op.run(spark, dir).queryExecution.sparkPlan)
      assert(dup <= MaxDup,
        s"${op.name} re-evaluates an interpreted HOF chain $dup times in one node " +
          s"(the t14 pushdown-inlining hazard) — materialize the derived column " +
          s"before filtering/exploding it:\n$where")
    }
  }
}
