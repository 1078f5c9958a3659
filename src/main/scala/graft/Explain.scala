package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: prints the formatted physical plan for the named
  * queries (or all) so pushdown (`PushedFilters`), column pruning
  * (`ReadSchema`), broadcast choices, and WholeStageCodegen spans can
  * be reviewed without a debugger.
  *
  * Usage: graft.Explain <sfDir> [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.explain("formatted")
      // whole-stage-codegen evidence: distinct `*(id)` spans in the
      // executed plan — AQE only inserts WholeStageCodegen at stage
      // execution, and it must be THIS df's plan that runs (count()
      // executes a different query and leaves this one unfinalized)
      df.collect()
      val simple = df.queryExecution.executedPlan.toString
      val spans = "\\*\\((\\d+)\\)".r.findAllMatchIn(simple).map(_.group(1)).toSet.size
      // worst per-node duplication of one canonicalized HOF subtree —
      // the t14 pushdown-inlining signature (HofInliningSpec is the
      // hard gate; this surfaces the number in plan audits)
      var hofDup = 0
      df.queryExecution.sparkPlan.foreach { node =>
        val hofs = node.expressions.flatMap(_.collect {
          case h: org.apache.spark.sql.catalyst.expressions.HigherOrderFunction => h
        })
        if (hofs.nonEmpty) {
          val d = hofs.groupBy(_.canonicalized).values.map(_.size).max
          if (d > hofDup) hofDup = d
        }
      }
      println(s"[audit] $n codegen_spans=$spans hof_dup=$hofDup")
    }
    spark.stop()
  }
}
