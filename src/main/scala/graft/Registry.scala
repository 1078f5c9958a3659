package graft

/** Central inventory of every operator the engine exposes — the
  * SparkEntry contract is assembled from this list, and SURVEY.md §2 is
  * its documentation.
  */
object Registry {
  def all: Seq[Op] =
    graph.GraphOps.ops ++ graph.Traversals.ops ++ graph.Components.ops ++
      graph.Triangles.ops ++ graph.PageRank.ops ++ graph.AdjacencyCodec.ops ++
      graph.ReachSketch.ops ++ graph.Betweenness.ops ++
      ops.Olap.ops ++ ops.Events.ops ++
      dedup.Dedup.ops ++ sim.Similarity.ops ++ text.TextOps.ops ++ text.Bpe.ops ++
      text.QualityClassifier.ops ++ mm.Multimodal.ops
}
