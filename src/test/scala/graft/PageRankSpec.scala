package graft

import graft.operators.PageRank
import graft.operators.PageRank.RankUnit

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int) =
    PageRank.ranks(edges.toDF("s", "d"), "s", "d", iters)
      .as[(Long, Long)].collect().toMap

  test("one iteration on a 3-node chain matches the hand-derived formulas") {
    // a(1) -> b(2) -> c(3); n = 3, c is dangling
    val r = ranksOf(Seq((1L, 2L), (2L, 3L)), iters = 1)
    val r0 = RankUnit / 3
    val teleport = 15L * RankUnit / 300L
    assert(r(1L) === teleport)                          // no incoming
    assert(r(2L) === teleport + 85L * (r0 / 1) / 100L)  // from a
    assert(r(3L) === teleport + 85L * (r0 / 1) / 100L)  // from b
  }

  test("a hub out-ranks its spokes after 2 iterations") {
    // undirected star: 1 <-> {2, 3, 4, 5}
    val spokes = (2L to 5L)
    val edges = spokes.flatMap(s => Seq((1L, s), (s, 1L)))
    val r = ranksOf(edges, iters = 2)
    spokes.foreach(s => assert(r(1L) > r(s), s"hub vs spoke $s"))
    // symmetric spokes rank identically
    assert(spokes.map(r).toSet.size === 1)
  }

  test("ranks are deterministic under repartitioning and duplicate edges") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    val a = ranksOf(edges ++ edges, iters = 3) // dups collapse
    val b = PageRank.ranks(
        edges.toDF("s", "d").repartition(7), "s", "d", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("mass is bounded: total rank never exceeds one unit of mass") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val total = ranksOf(edges, iters = 4).values.sum
    // floors only shed mass; a closed cycle keeps nearly all of it
    assert(total <= RankUnit)
    assert(total > RankUnit * 99 / 100)
  }
}
