package graft

import graft.operators.Graph

class GraphTriangleSpec extends SparkSuite {
  import spark.implicits._

  private def census(edges: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
    val r = Graph.triangles(edges.toDF("src", "dst")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("triangle in a 4-node graph with a tail") {
    // triangle 1-2-3 plus pendant edge 3-4: one triangle
    val (n, e, w, t) = census(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)))
    assert((n, e, t) == (4L, 4L, 1L))
    assert(w >= t, "every triangle is a closed wedge")
  }

  test("complete graph K5: C(5,3)=10 triangles, every wedge closes") {
    val edges = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val (n, e, w, t) = census(edges)
    assert((n, e, t) == (5L, 10L, 10L))
    assert(w == 10L, "degree orientation enumerates each triangle exactly once")
  }

  test("duplicates, self-loops and reversed directions collapse") {
    val (n, e, w, t) = census(Seq(
      (1L, 2L), (2L, 1L), (1L, 2L), (1L, 1L), (2L, 3L), (3L, 1L)))
    assert((n, e, t) == (3L, 3L, 1L))
  }

  test("bipartite graph has zero triangles") {
    val edges = for (a <- 1L to 3L; b <- 10L to 12L) yield (a, b)
    val (n, e, w, t) = census(edges)
    assert((n, e, t) == (6L, 9L, 0L))
    assert(w > 0L, "K3,3 has open wedges")
  }

  test("star graph: the hub contributes no apex wedges") {
    // hub 0 connected to 1..20: degree orientation points every edge
    // INTO the hub, so no wedges are enumerated at all
    val edges = (1L to 20L).map(i => (0L, i))
    val (n, e, w, t) = census(edges)
    assert((n, e, w, t) == (21L, 20L, 0L, 0L))
  }

  test("empty edge list yields an all-zero census") {
    assert(census(Seq.empty) == (0L, 0L, 0L, 0L))
  }
}
