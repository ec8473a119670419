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
      // the convergence signal rides along in the checkpointed frame
      // (changed ⟺ a neighbor label undercuts the node's own), so each
      // round costs ONE materializing job; the isEmpty below scans the
      // checkpoint blocks instead of re-running a join (was a second
      // full join job per round)
      val next = labels
        .join(nbrMin.withColumnRenamed("src", "node"), "node")
        .select(col("node"),
          least(col("component"), col("nbr_min")).as("component"),
          (col("nbr_min") < col("component")).as("changed"))
        .localCheckpoint()
      // checked EVERY round (unlike canonicalize's fixed-iteration
      // heuristic): the result is only the true component labeling at
      // the fixpoint, so an unconverged exit must fail loudly
      converged = next.filter(col("changed")).isEmpty
      labels = next.drop("changed")
      round += 1
    }
    require(converged,
      s"connectedComponents: not converged after $maxIterations rounds " +
        "(graph diameter exceeds maxIterations)")
    labels
  }

  /** BFS levels from a source set over the undirected graph: one row
    * per node reachable within `maxRounds` hops, labeled with its true
    * shortest-path distance (BFS discovers every node first at its
    * minimum level). Frontier expansion Pregel-style: each round one
    * co-partitioned join frontier⋈edges plus an anti-join against the
    * seen set; per-round localCheckpoint truncates lineage
    * ([[connectedComponents]]'s discipline) and the empty-frontier exit
    * makes post-diameter rounds free. The round cap bounds level ≤
    * maxRounds — the SAME cap the recursive-SQL oracle twin states, so
    * both engines cut the frontier identically on high-diameter
    * graphs. */
  def bfsLevels(edges: DataFrame, srcCol: String, dstCol: String,
                sources: DataFrame, maxRounds: Int = 10): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(col("src"))
      .localCheckpoint()
    var levels = sources.select(col("node")).distinct()
      .select(col("node"), lit(0L).as("level"))
      .localCheckpoint()
    var frontier = levels
    var round = 0
    var done = false
    while (round < maxRounds && !done) {
      round += 1
      val next = frontier
        .join(und, frontier("node") === und("src"))
        .select(und("dst").as("node"), lit(round.toLong).as("level"))
        .distinct()
        .join(levels.select(col("node").as("seen")),
          col("node") === col("seen"), "left_anti")
        .localCheckpoint()
      if (next.isEmpty) done = true
      else {
        levels = levels.union(next).localCheckpoint()
        frontier = next
      }
    }
    levels
  }

  /** Fixed-iteration PageRank in scaled-INTEGER arithmetic (Page et al.
    * 1999, the public PageRank paper — damping 0.85, uniform teleport).
    *
    * Ranks are longs in millionths: rank0 = 1_000_000 per node; each
    * round every node sends `rank DIV degree` to each neighbor and
    * resets to `150_000 + (85 × Σ incoming) DIV 100`. Integer division
    * sheds sub-millionth mass — a DECLARED semantic, not an
    * approximation bug: it makes every round exact and order-independent
    * (long sums commute), so a DuckDB oracle reproduces the result
    * bit-for-bit where a float PageRank would drift by fold order.
    * Ranking quality is unaffected at this scale (ulp-level mass loss).
    *
    * Each round is one join (edges ⋈ ranks, co-partitioned on src) and
    * one map-side-combined sum — the Pregel shape; K rounds = K shuffles
    * on the same key. Long overflow bound: 85 × Σ ranks ≤ 85 × n × 10⁶
    * stays inside 2⁶³ up to n ≈ 10¹¹ nodes. Callers pass SYMMETRIC or
    * already-directed edges; every node that appears as a src has
    * degree ≥ 1 (dangling mass simply evaporates, mirrored exactly in
    * the oracle). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 5): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .repartition(col("src"))
      .localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = e.select(col("src").as("node")).distinct()
    var ranks = nodes.withColumn("pr", lit(1000000L)).localCheckpoint()
    for (_ <- 1 to iterations) {
      val contrib = ranks
        .join(deg.withColumnRenamed("src", "node"), "node")
        .withColumn("c", expr("pr DIV deg"))
        .join(e.withColumnRenamed("src", "node"), "node")
        .groupBy(col("dst").as("node"))
        .agg(sum("c").as("in_mass"))
      ranks = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + expr("85 * coalesce(in_mass, 0L) DIV 100")).as("pr"))
        .localCheckpoint()
    }
    ranks
  }

  /** Triangle counting by degree orientation (the compact-forward /
    * Chiba–Nishizeki kernel, public literature): orient each undirected
    * edge from its lower-(degree, id) endpoint to the higher one, then a
    * triangle (a≺b≺c) is exactly one pair of oriented wedges a→b, a→c
    * with the closing oriented edge b→c. Each triangle is counted ONCE,
    * and the wedge fanout per node is bounded by its ORIENTED out-degree
    * ≤ O(√m) on any graph — the hub-explosion guard that plain id
    * orientation lacks. Three hash joins, all on node keys; at 100 TB
    * the wedge join is the big shuffle and its skew is capped by the
    * orientation.
    *
    * Input: symmetric or one-per-pair edge list; self-loops dropped.
    * Output: one row per node appearing in ≥1 triangle, with its
    * triangle count. */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst"))
    val und = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val deg = und.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    // total order ≺ = (deg, id); orient src→dst iff src ≺ dst
    val withDeg = und
      .join(deg.withColumnRenamed("node", "src").withColumnRenamed("deg", "sdeg"), "src")
      .join(deg.withColumnRenamed("node", "dst").withColumnRenamed("deg", "ddeg"), "dst")
    val oriented = withDeg.filter(
        col("sdeg") < col("ddeg") ||
          (col("sdeg") === col("ddeg") && col("src") < col("dst")))
      .select("src", "dst")
      .localCheckpoint()  // reused three times below; cut the join lineage
    // A triangle {a,b,c} has a unique ≺-minimum vertex `a` carrying both
    // oriented wedge edges a→b and a→c, and exactly ONE of b→c / c→b is
    // oriented — so probing wedges against the oriented edge list counts
    // each triangle exactly once, with no ordering filter needed.
    val tri = oriented.as("w1")
      .join(oriented.as("w2"), col("w1.src") === col("w2.src"))
      .filter(col("w1.dst") =!= col("w2.dst"))
      .join(oriented.as("cl"),
        col("w1.dst") === col("cl.src") && col("w2.dst") === col("cl.dst"))
      .select(col("w1.src").as("a"), col("w1.dst").as("b"), col("w2.dst").as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node")
      .agg(count(lit(1)).as("triangles"))
  }
}
