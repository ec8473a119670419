package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** General graph primitives. The dedup pipeline's canonicalization
  * (Dedup.minhashCanonicalize) is min-label propagation specialized to
  * LSH-bucket cliques; this is the same kernel over an ARBITRARY edge
  * list, exposed as a first-class operator for entity graphs
  * (co-purchase, co-citation, shared-identifier resolution).
  */
object Graph {

  /** Connected components of the undirected graph given as an edge
    * list: one row per node that appears in an edge, labeled with its
    * component id = the MINIMUM node id in its component (deterministic,
    * engine-independent). Isolated nodes never enter an edge list —
    * callers wanting them keep-all left-join the result and coalesce to
    * the node's own id (the same convention as canonicalize's
    * too-short-to-shingle docs).
    *
    * Min-label propagation, one round = each node takes the min of its
    * own and its neighbors' labels: converges in O(diameter) rounds,
    * each round two joins co-partitioned on the edge key plus a
    * map-side-combined min — the Pregel-style shape that scales to
    * 100 TB edge lists (labels only ever shrink; the early-exit check
    * is one narrow join, so post-convergence rounds cost nothing).
    * Per-round localCheckpoint truncates the iterative lineage
    * (canonicalize's discipline — without it the final action replays
    * a 2×rounds-shuffle DAG). */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIterations: Int = 50): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(col("src"))
      .localCheckpoint()
    var labels = und.select(col("src").as("node")).distinct()
      .withColumn("component", col("node"))
      .localCheckpoint()
    var round = 0
    var converged = false
    while (round < maxIterations && !converged) {
      val nbrMin = und
        .join(labels.select(col("node").as("dst"),
          col("component").as("dst_comp")), "dst")
        .groupBy("src").agg(min("dst_comp").as("nbr_min"))
      val next = labels
        .join(nbrMin.withColumnRenamed("src", "node"), "node")
        .select(col("node"),
          least(col("component"), col("nbr_min")).as("component"))
        .localCheckpoint()
      // checked EVERY round (unlike canonicalize's fixed-iteration
      // heuristic): the result is only the true component labeling at
      // the fixpoint, so an unconverged exit must fail loudly
      converged = next
        .join(labels.withColumnRenamed("component", "prev"), "node")
        .filter(col("component") =!= col("prev"))
        .isEmpty
      labels = next
      round += 1
    }
    require(converged,
      s"connectedComponents: not converged after $maxIterations rounds " +
        "(graph diameter exceeds maxIterations)")
    labels
  }
}
