package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.KMeans

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sfDir).cache()

  test("two well-separated planted clusters are recovered exactly") {
    // init = vectors of the two LOWEST ids: one seed lands in each
    // planted cluster only after the first update — iteration 2 must
    // reassign (0,1) back to the origin cluster (see walk-through below)
    val pts = Seq(
      (1L, Array(0.0, 0.0)), (2L, Array(0.0, 1.0)),
      (3L, Array(10.0, 10.0)), (4L, Array(10.0, 11.0)))
      .toDF("id", "v")
    val m = KMeans.fit(pts, "id", "v", k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    // iter1: c0=(0,0) keeps {1}; c1=(0,1) grabs {2,3,4} -> mean (20/3, 22/3)
    // iter2: {1,2} -> c0 (mean (0, .5), n=2); {3,4} -> c1 (mean (10, 10.5), n=2)
    assert(m === Map(
      (0L, 0L) -> (0.0, 2L), (0L, 1L) -> (0.5, 2L),
      (1L, 0L) -> (10.0, 2L), (1L, 1L) -> (10.5, 2L)))
  }

  test("fit is deterministic and partition-invariant on real embeddings") {
    def run(df: org.apache.spark.sql.DataFrame) =
      KMeans.fit(df, "vec_id", "embedding", k = 4, iters = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    val a = run(emb)
    val b = run(emb.repartition(7))
    assert(a === b)
    // memberships cover the corpus: every dim row of a cluster carries the
    // same n, and cluster sizes sum to the corpus size
    val n = emb.count()
    val byCluster = a.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2._2).toSet).toMap
    byCluster.foreach { case (cid, ns) =>
      assert(ns.size === 1, s"cluster $cid: inconsistent n across dims")
    }
    assert(byCluster.values.map(_.head).sum === n)
  }

  test("more iterations do not increase within-cluster SSE") {
    def sse(iters: Int): Double = {
      val model = KMeans.fit(emb, "vec_id", "embedding", k = 4, iters = iters)
      val labeled = KMeans.assign(emb, "embedding", model)
      val centroidArr = model.collect()
        .groupBy(_.getLong(0)).view.mapValues(
          _.sortBy(_.getLong(1)).map(_.getDouble(2))).toMap
      labeled.select($"cluster_id", $"embedding".cast("array<double>"))
        .as[(Long, Seq[Double])].collect()
        .map { case (cid, v) =>
          v.zip(centroidArr(cid)).map { case (x, c) => (x - c) * (x - c) }.sum
        }.sum
    }
    val s1 = sse(1)
    val s2 = sse(2)
    val s3 = sse(3)
    assert(s2 <= s1 + 1e-9, s"SSE rose from $s1 to $s2")
    assert(s3 <= s2 + 1e-9, s"SSE rose from $s2 to $s3")
  }

  test("codegen L2 kernel == composable round(zip_with) argmin, bit for bit") {
    // the q81 oracle was validated against the composable form; the hot
    // path runs the codegen kernel — pin their equivalence on real data
    // plus a planted exact tie (ties must break to the LOWEST cid)
    val cents = emb.orderBy($"vec_id").limit(5)
      .select($"embedding".cast("array<double>")).as[Seq[Double]]
      .collect().zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }.toSeq
    val dup = cents.head._2 // centroid 0 duplicated as centroid 5: always tied
    val withTie = cents :+ (5L, dup)
    val both = emb.select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("kernel", graft.functions.expressions.VectorExpressions
        .nearest_centroid_l2($"v", withTie.map(_._2.toSeq)))
      .withColumn("kernel_cid",
        element_at(array(withTie.map(c => lit(c._1)): _*), ($"kernel" + 1).cast("int")))
      .withColumn("hof", KMeans.nearestComposable($"v", withTie))
    assert(both.filter($"kernel_cid" =!= $"hof").count() === 0L)
    // rows nearest centroid 0 must report 0, never the tied copy at 5
    assert(both.filter($"hof" === 5L).count() === 0L)
    assert(both.filter($"kernel_cid" === 0L).count() > 0L)
  }

  test("assign labels every row with an existing cluster id; k/iters guards") {
    val model = KMeans.fit(emb, "vec_id", "embedding", k = 4, iters = 1)
    val cids = model.select($"cluster_id").distinct().as[Long].collect().toSet
    val labels = KMeans.assign(emb, "embedding", model)
      .select($"cluster_id").as[Long].collect()
    assert(labels.length === emb.count())
    assert(labels.toSet.subsetOf(cids))
    intercept[IllegalArgumentException] {
      KMeans.fit(emb, "vec_id", "embedding", k = 0, iters = 1)
    }
    intercept[IllegalArgumentException] {
      KMeans.fit(emb, "vec_id", "embedding", k = 4, iters = 0)
    }
    intercept[IllegalArgumentException] {
      KMeans.fit(emb.limit(2), "vec_id", "embedding", k = 4, iters = 1)
    }
  }
}
