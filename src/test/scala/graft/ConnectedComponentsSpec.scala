package graft

import org.apache.spark.sql.functions._
import graft.functions.Dedup

/** Connected-components clustering: multi-hop transitivity, chains longer
  * than one propagation round, disjoint components, loud non-convergence.
  */
class ConnectedComponentsSpec extends SparkSpec {

  private def comps(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain A-B-C-D collapses to one component labeled min id") {
    val got = comps(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("long path (20 nodes) converges despite diameter > 2") {
    val got = comps((1L until 20L).map(i => (i, i + 1)))
    assert(got.values.toSet == Set(1L))
    assert(got.size == 20)
  }

  test("disjoint components keep separate min labels; direction ignored") {
    val got = comps(Seq((5L, 2L), (7L, 9L), (9L, 8L)))
    assert(got == Map(2L -> 2L, 5L -> 2L, 7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("maxIter exceeded fails loudly instead of silently truncating") {
    import spark.implicits._
    val edges = (1L until 12L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      // force the distributed loop: the small-graph fast path (r6) would
      // solve this driver-side and never iterate
      Dedup.connectedComponents(edges, "a", "b", maxIter = 2, smallGraphEdges = 0L)
    }
    assert(e.getMessage.contains("not converged"))
  }

  test("small-graph fast path == distributed loop on chains, cliques, crossovers") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val edges = (
      (1L until 40L).map(i => (i, i + 1)) ++                 // one long chain
      (100L until 110L).flatMap(a => (a + 1 until 110L).map((a, _))) ++ // clique
      (0 until 60).map(_ => (200L + rnd.nextInt(30), 200L + rnd.nextInt(30))) ++
      Seq((39L, 109L))                                        // chain-clique bridge
    ).toDF("a", "b")
    val fast = Dedup.connectedComponents(edges, "a", "b")
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val loop = Dedup.connectedComponents(edges, "a", "b", smallGraphEdges = 0L)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(fast == loop, s"fast path diverged from the loop:\n$fast\n$loop")
  }

  test("dupClusters: docs without pairs are singleton canonical clusters") {
    import spark.implicits._
    // three identical token sets (1,2,3 shingle-equal) + one disjoint doc
    val df = Seq(
      (10L, Seq(1, 2, 3, 4, 5)),
      (11L, Seq(1, 2, 3, 4, 5)),
      (12L, Seq(1, 2, 3, 4, 5)),
      (99L, Seq(7, 8, 9, 10, 11))
    ).toDF("doc_id", "tokens")
    val got = Dedup.dupClusters(df, "tokens", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((10L, 10L, 1), (11L, 10L, 0), (12L, 10L, 0), (99L, 99L, 1)))
  }
}
