package graft

/** Central inventory of every operator the engine exposes — the
  * SparkEntry contract is assembled from this list, and SURVEY.md §2 is
  * its documentation.
  */
object Registry {
  def all: Seq[Op] =
    ops.Olap.ops ++ ops.Events.ops
}
