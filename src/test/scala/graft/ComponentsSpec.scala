package graft

import org.apache.spark.sql.functions._
import graft.operators.Components

class ComponentsSpec extends SparkSpec {

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain collapses to one component rooted at the minimum") {
    // A~B, B~C, C~D: pairwise near-dups that are NOT all mutually similar
    assert(cc(Seq((4L, 3L), (3L, 2L), (2L, 1L))) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("disjoint components keep separate minimum labels") {
    assert(cc(Seq((1L, 2L), (10L, 11L), (11L, 12L), (20L, 21L))) ===
      Map(1L -> 1L, 2L -> 1L,
        10L -> 10L, 11L -> 10L, 12L -> 10L,
        20L -> 20L, 21L -> 20L))
  }

  test("self-loops and duplicate/reversed edges are harmless") {
    assert(cc(Seq((5L, 5L), (1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L))) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("empty edge set yields empty labels") {
    assert(cc(Seq.empty) === Map.empty)
  }

  test("reliable checkpoint dir: same labels, rounds persist to the dir") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cc_ckpt").toString
    // multi-round shape: a long chain forces > 1 contraction round, so the
    // loop actually cycles through reliable checkpoints, not just the seed
    val chain = (1L until 40L).map(i => (i + 1, i))
    val local = Components.connectedComponents(chain.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reliable = Components.connectedComponents(chain.toDF("a", "b"), "a", "b",
        checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable === local)
    assert(reliable === (1L to 40L).map(_ -> 1L).toMap)
    // the rounds really went through the reliable path: checkpoint data on disk
    def files(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(files) else Seq(f)
    assert(files(new java.io.File(dir)).nonEmpty,
      "reliable checkpoints must write to the provided directory")
  }

  test("star contraction matches brute-force on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val n = 200
    val edges = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    // driver-side union-find ground truth
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .filterNot(x => edges.filter(e => e._1 != e._2).forall(e => e._1 != x && e._2 != x))
      .map(x => x -> {
        // root = min node reachable; union-find parent chain bottoms out there
        find(x.toInt).toLong
      }).toMap
    assert(cc(edges) === expected)
  }

  test("label is the component MINIMUM regardless of edge orientation") {
    val forward = cc(Seq((1L, 9L), (9L, 4L)))
    val backward = cc(Seq((9L, 1L), (4L, 9L)))
    assert(forward === backward)
    assert(forward.values.toSet === Set(1L))
  }

  // ---- keeperByPriority ----

  private def keepers(edges: Seq[(Long, Long)], pri: Seq[(Long, Double)])
      : Map[Long, (Long, Boolean)] = {
    import spark.implicits._
    Components.keeperByPriority(edges.toDF("a", "b"), "a", "b",
        pri.toDF("id", "p"), "id", "p")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(4)))
      .toMap
  }

  test("keeper is the max-priority member of each component") {
    // chain 1~2~3: one component; 3 has the best score
    val m = keepers(Seq((1L, 2L), (2L, 3L)),
      Seq(1L -> 0.2, 2L -> 0.5, 3L -> 0.9))
    assert(m === Map(
      1L -> (3L, false), 2L -> (3L, false), 3L -> (3L, true)))
  }

  test("priority ties break to the LOWEST node id") {
    val m = keepers(Seq((7L, 5L), (5L, 9L)),
      Seq(5L -> 0.5, 7L -> 0.5, 9L -> 0.5))
    assert(m.values.map(_._1).toSet === Set(5L))
    assert(m(5L)._2 && !m(7L)._2 && !m(9L)._2)
  }

  test("components pick keepers independently; edge-free nodes absent") {
    val m = keepers(Seq((1L, 2L), (10L, 11L)),
      // 99 scores best of all but has no edges: it must not appear,
      // and must not attract either component's keeper choice
      Seq(1L -> 0.1, 2L -> 0.9, 10L -> 0.8, 11L -> 0.3, 99L -> 1.0))
    assert(m === Map(
      1L -> (2L, false), 2L -> (2L, true),
      10L -> (10L, true), 11L -> (10L, false)))
  }

  test("clusterWeights: 1/size per member, cluster mass sums to one each") {
    import spark.implicits._
    // {1,2,3} and {10,11}: weights 1/3 and 1/2; 99 edge-free -> absent
    val w = Components.clusterWeights(
        Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(w === Map(
      1L -> (3L, 1.0 / 3), 2L -> (3L, 1.0 / 3), 3L -> (3L, 1.0 / 3),
      10L -> (2L, 0.5), 11L -> (2L, 0.5)))
    assert(math.abs(w.values.map(_._2).sum - 2.0) < 1e-12,
      "total mass == number of clusters")
  }

  test("driver union-find path == star contraction path on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 3) {
      val n = 150
      val edges = Seq.fill(100 + trial * 30)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2).toDF("a", "b")
      val viaDriver = Components.connectedComponents(edges, "a", "b")
        .as[(Long, Long)].collect().toSet
      val viaStars = Components.connectedComponents(edges, "a", "b",
          smallGraphEdges = 0L) // gate disabled -> star contraction
        .as[(Long, Long)].collect().toSet
      assert(viaDriver === viaStars, s"trial $trial: plan paths disagree")
    }
  }

  test("non-long node ids always take the star path (schema stability)") {
    import spark.implicits._
    val intEdges = Seq((1, 2), (2, 3), (5, 6)).toDF("a", "b")
    val labels = Components.connectedComponents(intEdges, "a", "b")
    assert(labels.schema("node").dataType ===
      org.apache.spark.sql.types.IntegerType,
      "int ids keep their type — the driver path must not have widened them")
    assert(labels.as[(Int, Int)].collect().toSet ===
      Set((1, 1), (2, 1), (3, 1), (5, 5), (6, 5)))
  }

  test("keeperByPriority matches brute-force on a random graph") {
    val rnd = new scala.util.Random(13)
    val n = 120
    val edges = Seq.fill(90)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(e => e._1 != e._2)
    val pri = (0L until n).map(i => i -> rnd.nextDouble())
    val priMap = pri.toMap
    // ground truth: union-find components, then argmax (priority, -id)
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val best = nodes.groupBy(x => find(x.toInt))
      .map { case (c, ns) =>
        c -> ns.minBy(x => (-priMap(x), x))
      }
    val expected = nodes.map(x =>
      x -> (best(find(x.toInt)), best(find(x.toInt)) == x)).toMap
    assert(keepers(edges, pri) === expected)
  }
}
