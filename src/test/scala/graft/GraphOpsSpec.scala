package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphOps

/** GraphOps: degree-ordered triangle counting ≡ brute force, and bounded
  * BFS ≡ a driver-side reference search. */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def edgesDf(es: Seq[(Long, Long)]) = es.toDF("src", "dst")

  private def triMap(es: Seq[(Long, Long)]): Map[Long, Long] =
    GraphOps.triangleCounts(edgesDf(es), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4: four triangles, every corner in three") {
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    assert(triMap(k4) === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("paths and stars have no triangles; one rim edge closes exactly one") {
    assert(triMap(Seq((1L, 2L), (2L, 3L), (3L, 4L))) === Map.empty)
    val star = (2L to 8L).map(i => (1L, i))
    assert(triMap(star) === Map.empty)
    assert(triMap(star :+ (2L, 3L)) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("duplicate, reversed, and self-loop edges normalize away") {
    val noisy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (1L, 3L), (3L, 3L))
    assert(triMap(noisy) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("degree-ordered counts == naive triple join on a generated graph") {
    // deterministic pseudo-random graph: 60 nodes, md5-derived edges
    val es = (for (i <- 0 until 600) yield {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"edge:$i".getBytes("UTF-8"))
      val a = ((h(0) & 0x7f).toLong * 256 + (h(1) & 0xff)) % 60
      val b = ((h(2) & 0x7f).toLong * 256 + (h(3) & 0xff)) % 60
      (a, b)
    }).filter { case (a, b) => a != b }
    val got = triMap(es)
    // naive: canonical a<b edge set, count (a,b,c) with all three present
    val canon = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = canon.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val naive = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      a <- nodes; b <- nodes if a < b && canon((a, b))
      c <- nodes if b < c && canon((b, c)) && canon((a, c))
    } { naive(a) += 1; naive(b) += 1; naive(c) += 1 }
    assert(got === naive.toMap)
    assert(got.nonEmpty, "generated graph must actually contain triangles")
  }

  private def cappedTotal(es: Seq[(Long, Long)], cap: Int): Long =
    GraphOps.triangleCountCapped(edgesDf(es), "src", "dst", cap)
      .collect().head.getLong(0)

  test("capped triangle count: one-sided bias, exact when cap covers max degree") {
    // K4 (nodes 1-4) + a hub (9) wired to 1..6: exact total = 4 K4
    // triangles + 6 hub triangles (one per K4 edge... hub closes with
    // each adjacent pair among 1-4 => C(4,2)=6). Degrees: hub 6,
    // nodes 1-4 each 4, nodes 5-6 each 1.
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val hub = (1L to 6L).map(i => (9L, i))
    val es = k4 ++ hub
    val exact = GraphOps.triangleCount(edgesDf(es), "src", "dst")
      .collect().head.getLong(0)
    assert(exact === 10L)
    // cap 4 removes ONLY the hub (degree 6): exactly the K4 triangles
    // remain — the documented "all three corners <= cap" lower bound
    assert(cappedTotal(es, 4) === 4L)
    // cap 3 also removes nodes 1-4 (original degree 4, hub edges count):
    // nothing left
    assert(cappedTotal(es, 3) === 0L)
    // cap >= true max degree reproduces the exact count bit-for-bit
    assert(cappedTotal(es, 6) === exact)
  }

  test("capped count == naive count on the degree-filtered generated graph") {
    val es = (for (i <- 0 until 600) yield {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"edge:$i".getBytes("UTF-8"))
      val a = ((h(0) & 0x7f).toLong * 256 + (h(1) & 0xff)) % 60
      val b = ((h(2) & 0x7f).toLong * 256 + (h(3) & 0xff)) % 60
      (a, b)
    }).filter { case (a, b) => a != b }
    val canon = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val deg = canon.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (n, xs) => n -> xs.size }
    val cap = 12
    val kept = canon.filter { case (a, b) => deg(a) <= cap && deg(b) <= cap }
    val nodes = kept.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    var naive = 0L
    for {
      a <- nodes; b <- nodes if a < b && kept((a, b))
      c <- nodes if b < c && kept((b, c)) && kept((a, c))
    } naive += 1
    val got = cappedTotal(es, cap)
    assert(got === naive)
    val exact = GraphOps.triangleCount(edgesDf(es), "src", "dst")
      .collect().head.getLong(0)
    assert(got < exact, "cap must actually bite on this graph")
  }

  private def coreMap(es: Seq[(Long, Long)], k: Int): Map[Long, Long] =
    GraphOps.kCore(edgesDf(es), "src", "dst", k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("k-core: a dangling chain peels over multiple rounds, the clique survives") {
    // K5 on 1-5, chain 1-6-7-8-9 dangling off node 1: with k=2 the chain
    // peels one node per round from the tail (4 rounds), never touching
    // the clique
    val k5 = for { a <- 1L to 5L; b <- (a + 1) to 5L } yield (a, b)
    val chain = Seq((1L, 6L), (6L, 7L), (7L, 8L), (8L, 9L))
    val es = k5 ++ chain
    assert(coreMap(es, 2) === (1L to 5L).map(_ -> 4L).toMap)
    // k=4: exactly the clique, every member at degree 4
    assert(coreMap(es, 4) === (1L to 5L).map(_ -> 4L).toMap)
    // k=5: nothing survives
    assert(coreMap(es, 5) === Map.empty)
  }

  test("k-core: within-set degree decides, not raw degree") {
    // a star center has raw degree 6 but its leaves die at k=2, taking
    // the center with them — the spam-account shape kCore exists to drop
    val star = (2L to 7L).map(i => (1L, i))
    assert(coreMap(star, 2) === Map.empty)
    // attach a triangle: only it survives, the high-degree center peels
    val es = star ++ Seq((10L, 11L), (11L, 12L), (10L, 12L))
    assert(coreMap(es, 2) === Map(10L -> 2L, 11L -> 2L, 12L -> 2L))
  }

  test("k-core == driver-side peeling on a generated graph; normalization holds") {
    val es = (for (i <- 0 until 500) yield {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"kcore:$i".getBytes("UTF-8"))
      val a = ((h(0) & 0x7f).toLong * 256 + (h(1) & 0xff)) % 80
      val b = ((h(2) & 0x7f).toLong * 256 + (h(3) & 0xff)) % 80
      (a, b)
    }).filter { case (a, b) => a != b }
    // noisy variant: duplicates, reversals, self-loops must not change it
    val noisy = es ++ es.take(50).map(_.swap) ++ Seq((3L, 3L))
    val canon = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val adj = canon.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    val k = 7
    var alive = adj.keySet
    var changed = true
    while (changed) {
      val next = alive.filter(n => adj(n).count(alive) >= k)
      changed = next.size != alive.size
      alive = next
    }
    val expected = alive.map(n => n -> adj(n).count(alive).toLong).toMap
    assert(coreMap(noisy, k) === expected)
    assert(expected.nonEmpty, "fixture must have a non-trivial core")
  }

  test("label propagation: planted communities converge, ties take the min label, " +
      "unlabeled nodes acquire by frontier") {
    // two K4 cliques bridged by one edge; one seed per clique
    val k4a = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val k4b = for { a <- 11L to 14L; b <- (a + 1) to 14L } yield (a, b)
    val es = (k4a ++ k4b :+ (4L, 11L)).toDF("src", "dst")
    val seeds = Seq((1L, 100L), (14L, 200L)).toDF("node", "label")
    val got = GraphOps.labelPropagation(es, "src", "dst", seeds, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 4L).forall(got(_) == 100L), s"clique A keeps its seed: $got")
    assert((11L to 14L).forall(got(_) == 200L), s"clique B keeps its seed: $got")
    // a node seeing two single-vote labels takes the SMALLER one
    val tri = Seq((1L, 3L), (2L, 3L)).toDF("src", "dst")
    val tieSeeds = Seq((1L, 50L), (2L, 40L)).toDF("node", "label")
    val tie = GraphOps.labelPropagation(tri, "src", "dst", tieSeeds, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tie(3L) === 40L, s"tie must break to the min label: $tie")
    // frontier acquisition: a chain labels one hop per round
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val cs = Seq((1L, 9L)).toDF("node", "label")
    assert(!GraphOps.labelPropagation(chain, "src", "dst", cs, rounds = 2)
      .collect().map(_.getLong(0)).contains(4L),
      "round 2 must not reach three hops out")
    assert(GraphOps.labelPropagation(chain, "src", "dst", cs, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(1L -> 9L, 2L -> 9L, 3L -> 9L, 4L -> 9L))
  }

  test("weighted shortest paths: cheap detour beats direct edge, hop bound binds, " +
      "negative weight fails loudly") {
    // direct 1->4 costs 100; the 3-hop detour 1->2->3->4 costs 3
    val es = Seq((1L, 4L, 100L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L),
      (4L, 5L, 1L)).toDF("src", "dst", "w")
    val src = Seq(1L).toDF("node")
    def dists(maxHops: Int): Map[Long, Long] =
      GraphOps.shortestPaths(es, "src", "dst", "w", src, maxHops)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1 hop: only the direct edges
    assert(dists(1) === Map(1L -> 0L, 4L -> 100L, 2L -> 1L))
    // 3 hops: the detour wins
    assert(dists(3)(4L) === 3L)
    // 4 hops: node 5 reached through the detour
    assert(dists(4) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
    // fixpoint early-exit: a larger bound changes nothing
    assert(dists(10) === dists(4))
    intercept[Exception] {
      GraphOps.shortestPaths(Seq((1L, 2L, -5L)).toDF("src", "dst", "w"),
        "src", "dst", "w", src, 2).collect()
    }
    // fractional weights would silently truncate via cast('long') — reject
    intercept[Exception] {
      GraphOps.shortestPaths(Seq((1L, 2L, 1.5)).toDF("src", "dst", "w"),
        "src", "dst", "w", src, 2).collect()
    }
  }

  test("weighted shortest paths == driver Bellman-Ford on a generated graph") {
    val es = (for (i <- 0 until 400) yield {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"sp:$i".getBytes("UTF-8"))
      val a = ((h(0) & 0x7f).toLong * 256 + (h(1) & 0xff)) % 50
      val b = ((h(2) & 0x7f).toLong * 256 + (h(3) & 0xff)) % 50
      (a, b, 1L + ((h(4) & 0xff) % 9))
    }).filter { case (a, b, _) => a != b }
    val maxHops = 5
    val got = GraphOps.shortestPaths(es.toDF("src", "dst", "w"),
        "src", "dst", "w", Seq(0L).toDF("node"), maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: maxHops rounds of relaxation over a driver map
    var ref = Map(0L -> 0L)
    for (_ <- 1 to maxHops) {
      val relaxed = es.flatMap { case (a, b, w) => ref.get(a).map(d => b -> (d + w)) }
      ref = (ref.toSeq ++ relaxed).groupBy(_._1)
        .map { case (n, ds) => n -> ds.map(_._2).min }
    }
    assert(got === ref)
    assert(got.size > 1, "source must reach something")
  }

  test("bfs on a chain: hop counts, depth bound, unreachable absent") {
    val chain = edgesDf(Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)))
    val got = GraphOps.bfsDistances(chain, "src", "dst",
        Seq(1L).toDF("node"), maxDepth = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  test("bfs maxDepth 0 returns only the sources") {
    val got = GraphOps.bfsDistances(edgesDf(Seq((1L, 2L))), "src", "dst",
        Seq(1L, 5L).toDF("node"), maxDepth = 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 0, 5L -> 0))
  }

  test("multi-source bfs takes the minimum hop count") {
    // 1 -> 2 -> 3 -> 4 and 9 -> 4: node 4 is 1 hop from source 9
    val es = edgesDf(Seq((1L, 2L), (2L, 3L), (3L, 4L), (9L, 4L)))
    val got = GraphOps.bfsDistances(es, "src", "dst",
        Seq(1L, 9L).toDF("node"), maxDepth = 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 0, 9L -> 0, 2L -> 1, 4L -> 1, 3L -> 2))
  }

  test("bfs == driver-side reference on a generated directed graph") {
    val es = (for (i <- 0 until 400) yield {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"bfs:$i".getBytes("UTF-8"))
      val a = ((h(0) & 0x7f).toLong * 256 + (h(1) & 0xff)) % 40
      val b = ((h(2) & 0x7f).toLong * 256 + (h(3) & 0xff)) % 40
      (a, b)
    }).filter { case (a, b) => a != b }
    val depth = 3
    val got = GraphOps.bfsDistances(edgesDf(es), "src", "dst",
        Seq(0L).toDF("node"), maxDepth = depth)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val adj = es.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val ref = scala.collection.mutable.Map(0L -> 0)
    var frontier = Seq(0L)
    for (d <- 1 to depth) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Seq.empty))
        .distinct.filterNot(ref.contains)
      frontier.foreach(n => ref(n) = d)
    }
    assert(got === ref.toMap)
  }

  test("bfs early-exits on an exhausted frontier") {
    // component of size 2, huge depth bound: must terminate quickly and
    // return just the component
    val got = GraphOps.bfsDistances(edgesDf(Seq((1L, 2L), (2L, 1L), (5L, 6L))),
        "src", "dst", Seq(1L).toDF("node"), maxDepth = 50)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 0, 2L -> 1))
  }
}
