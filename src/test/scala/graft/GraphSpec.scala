package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Connected components: structural laws on known graphs (exact
  * component structure, convergence on paths longer than one round's
  * reach, edge-direction invariance) — properties the q78 hash check
  * can't localize to the operator. */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  test("known graph: two chains and a triangle resolve exactly") {
    // components: {1,2,3,4} (path), {10,11,12} (triangle), {20,21} (edge)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (12L, 10L), (20L, 21L)).toDF("src", "dst")
    val got = Graph.connectedComponents(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("bfs levels: multi-source distances on a known graph") {
    // path 1-2-3-4-5 and separate edge 10-11; seeds {1, 10}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("src", "dst")
    val sources = Seq(1L, 10L, 10L).toDF("node") // dup seed must not double rows
    val got = Graph.bfsLevels(edges, "src", "dst", sources)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L,
      10L -> 0L, 11L -> 1L))
  }

  test("bfs levels: the round cap truncates the frontier, edge-direction free") {
    val edges = (0L until 29L).map(i => (i + 1, i)).toDF("src", "dst")
    val sources = Seq(0L).toDF("node")
    val got = Graph.bfsLevels(edges, "src", "dst", sources, maxRounds = 5)
      .as[(Long, Long)].collect().toMap
    assert(got == (0L to 5L).map(i => i -> i).toMap)
  }

  test("long path converges past single-round reach (30 nodes, diameter 29)") {
    val edges = (0L until 29L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Graph.connectedComponents(edges, "src", "dst")
      .as[(Long, Long)].collect()
    assert(got.length == 30 && got.forall(_._2 == 0L))
  }

  test("component labels are edge-direction and edge-order invariant") {
    val edges = Seq((5L, 3L), (3L, 9L), (7L, 8L)).toDF("src", "dst")
    val flipped = edges.select(col("dst").as("src"), col("src").as("dst"))
      .orderBy(rand(42))
    val a = Graph.connectedComponents(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    val b = Graph.connectedComponents(flipped, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a == Map(5L -> 3L, 3L -> 3L, 9L -> 3L, 7L -> 7L, 8L -> 7L))
  }

  /** Run `body` with the small-graph fast path disabled, so the
    * distributed Pregel loop is what executes. */
  private def distributedPath[T](body: => T): T =
    Graph.SmallGraphEdgeThreshold.withValue(-1L)(body)

  test("unconverged exit fails loudly instead of returning wrong labels") {
    // the cap only exists on the distributed round loop — the small-path
    // union-find always reaches the fixpoint
    val edges = (0L until 10L).map(i => (i, i + 1)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      distributedPath {
        Graph.connectedComponents(edges, "src", "dst", maxIterations = 2)
          .collect()
      }
    }
  }

  test("small path ≡ distributed path on all four kernels") {
    // deterministic pseudo-random graph: ~60 nodes, md5-derived edges —
    // multiple components, triangles, uneven degrees
    val edges = ((0 until 150).map { i =>
      val a = (i * 2654435761L % 61) + 1
      val b = (i * 40503L % 61) + 1
      (math.min(a, b), math.max(a, b))
    } ++ Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L)))
      .filter { case (a, b) => a != b }.distinct.toDF("src", "dst")
    val sources = Seq(1L, 7L, 13L).toDF("node")

    val ccS = Graph.connectedComponents(edges, "src", "dst")
      .as[(Long, Long)].collect().toSet
    val bfsS = Graph.bfsLevels(edges, "src", "dst", sources, maxRounds = 6)
      .as[(Long, Long)].collect().toSet
    val prS = Graph.pageRank(edges, "src", "dst", iterations = 4,
      symmetrize = true).as[(Long, Long)].collect().toSet
    val triS = Graph.triangleCounts(edges, "src", "dst")
      .as[(Long, Long)].collect().toSet

    val (ccD, bfsD, prD, triD) = distributedPath {
      (Graph.connectedComponents(edges, "src", "dst")
         .as[(Long, Long)].collect().toSet,
       Graph.bfsLevels(edges, "src", "dst", sources, maxRounds = 6)
         .as[(Long, Long)].collect().toSet,
       Graph.pageRank(edges, "src", "dst", iterations = 4, symmetrize = true)
         .as[(Long, Long)].collect().toSet,
       Graph.triangleCounts(edges, "src", "dst")
         .as[(Long, Long)].collect().toSet)
    }
    assert(ccS == ccD)
    assert(bfsS == bfsD)
    assert(prS == prD)
    assert(triS == triD)
    assert(ccS.nonEmpty && bfsS.nonEmpty && prS.nonEmpty && triS.nonEmpty)
  }

  test("pageRank symmetrize=true equals caller-side union+distinct") {
    val e0 = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (1L, 2L))
      .toDF("src", "dst")
    val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val a = Graph.pageRank(e0, "src", "dst", iterations = 3, symmetrize = true)
      .as[(Long, Long)].collect().toSet
    val b = Graph.pageRank(sym, "src", "dst", iterations = 3)
      .as[(Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
