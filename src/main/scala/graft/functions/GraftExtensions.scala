package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions so `spark.sql("... float_vec_dot(a,b)
  * ...")` works in any session built with
  * `.withExtensions(new GraftExtensions)` or via
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("float_vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "float_vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FloatVecDot(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("float_vec_norm"),
      new ExpressionInfo(classOf[FloatVecNorm].getName, "float_vec_norm"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FloatVecNorm(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SortedIntersectCount(exprs(0), exprs(1))))
    // aggregate: analysis wraps a raw AggregateFunction in
    // AggregateExpression, so returning the function itself is correct
    e.injectFunction((
      FunctionIdentifier("top_k_scored"),
      new ExpressionInfo(classOf[TopKScored].getName, "top_k_scored"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (exprs.size != 3) throw new IllegalArgumentException(
          s"top_k_scored(score, payload, k) takes 3 arguments, got ${exprs.size}")
        val k = exprs(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _)
              if v > 0 && v <= Int.MaxValue => v.toInt
          case other => throw new IllegalArgumentException(
            s"top_k_scored: k must be an integer literal, got $other")
        }
        TopKScored(exprs(0), exprs(1), k)
      }))
  }
}
