package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed Lloyd k-means over an embedding column — the clustering
  * stage behind cluster-balanced sampling and cluster-then-dedup: SemDeDup
  * at corpus scale runs its within-cluster cosine stage inside k-means
  * cells so the near-quadratic work stays bounded per cell, and curation
  * dashboards bucket corpora by semantic cluster. [[IvfIndex.fit]] trains
  * its coarse quantizer by LOCAL Lloyd over a bounded driver sample — the
  * right call for an index model; this operator is the DISTRIBUTED
  * variant for when the clustering itself is the product (cluster ids for
  * every row of a corpus too big to sample representatively).
  *
  * Determinism contract (what the q81 oracle pins cross-engine):
  *   - init: the k vectors with the LOWEST ids, cluster_id = rank order —
  *     a set property of the input, no RNG;
  *   - assignment: argmin over round(squared-L2, 6) with cluster-id
  *     tie-break — the q69 rounded-compare trick, so a sub-1e-6 float
  *     wobble between engines cannot flip an argmin;
  *   - update: per-(cluster, dim) DECIMAL(18,8) sums (order-independent,
  *     exact) divided by the member count in double — bit-identical means
  *     on any engine regardless of accumulation order.
  *
  * Scale shape: each iteration is ONE narrow assignment projection — the
  * centroids travel inside the plan as k×dim double literals, no join, no
  * shuffle — plus ONE (cluster, dim)-keyed aggregate that partial-
  * aggregates map-side; k×dim scalar means return to the driver per
  * iteration (bounded by the PARAMETERS, the IvfIndex.fit precedent —
  * never by data). The update's posexplode shuffles (cid, dim, x) rows —
  * dim × corpus — which is the exact-decimal portability price; an
  * elementwise array Aggregator halves that when cross-engine
  * bit-equality isn't required. Iteration count is a fixed parameter
  * (training-data pipelines run Lloyd a handful of rounds, not to
  * convergence), so the driver loop is bounded by construction.
  */
object KMeans {

  /** Run `iters` Lloyd rounds; returns the final per-cluster model in
    * flat exploded form — (cluster_id, dim, centroid, n_members), one row
    * per cluster per dimension, `n_members` from the LAST assignment.
    * Clusters that lose every member simply vanish from the output (and
    * from subsequent rounds) — deterministic on any engine. */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(iters > 0, s"iters must be positive, got $iters")
    val vecs = df.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
    // deterministic seed: k lowest-id vectors (narrow TakeOrdered job)
    val init = vecs.orderBy(col(idCol)).limit(k).collect()
      .map(_.getSeq[Double](1).toArray)
    require(init.length == k, s"need at least $k rows, got ${init.length}")

    var centroids: Seq[(Long, Array[Double])] =
      init.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq
    // Update-stage note (r16, measured and kept as-is): a per-dim
    // decimal-sum-column variant (one (cid)-keyed aggregate with dim
    // DECIMAL(18,8) buffers, no posexplode) was tried and REGRESSED the
    // wide fits 2× at sf0.1 (q81: k=512 over 64 dims — 64 decimal agg
    // buffers per group blow past what whole-stage codegen handles
    // gracefully) while only the tiny PQ subspace fits broke even. The
    // posexplode form's dim× expansion is the exact-decimal portability
    // price and partial-aggregates map-side, so its exchange stays
    // k×dim-bounded per map task.
    var sums: DataFrame = null
    for (iter <- 1 to iters) {
      sums = vecs
        .withColumn("cid", nearest(col("__v"), centroids))
        .select(col("cid"), posexplode(col("__v")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos").cast("long").as("dim"))
        .agg(
          (sum(col("x").cast(DecimalType(18, 8))).cast("double") /
            count(lit(1))).as("m"),
          count(lit(1)).as("n"))
      if (iter < iters) {
        val rows = sums.select(col("cid"), col("dim"), col("m")).collect()
        centroids = rows.groupBy(_.getLong(0)).toSeq.map { case (cid, rs) =>
          (cid, rs.sortBy(_.getLong(1)).map(_.getDouble(2)).toArray)
        }.sortBy(_._1)
      }
    }
    // the model is parameter-bounded (k·dim rows), so collect it once and
    // re-issue as a local relation: consumers (assign, coarse maps, the
    // PQ chain) each collect the model, and a lazy return would re-run
    // the final corpus-scale aggregate per collect
    val model = sums.select(col("cid").as("cluster_id"), col("dim"),
      col("m").as("centroid"), col("n").as("n_members"))
    val rows = model.collect()
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), model.schema)
  }

  /** Adds a `cluster_id` column assigning every row to its nearest
    * centroid from a fitted model frame ((cluster_id, dim, centroid) rows,
    * as [[fit]] emits) — the narrow labeling pass a pipeline runs after
    * fitting. Centroids are collected (k×dim scalars, parameter-bounded)
    * and inlined as plan literals: zero shuffle, zero join. */
  def assign(df: DataFrame, vecCol: String, model: DataFrame): DataFrame = {
    val rows = model.select(col("cluster_id"), col("dim"), col("centroid"))
      .collect()
    val centroids = rows.groupBy(_.getLong(0)).toSeq.map { case (cid, rs) =>
      (cid, rs.sortBy(_.getLong(1)).map(_.getDouble(2)).toArray)
    }.sortBy(_._1)
    df.withColumn("cluster_id",
      nearest(col(vecCol).cast("array<double>"), centroids))
  }

  /** Argmin over rounded squared-L2 distances to literal centroids,
    * cluster-id tie-break — ONE codegen'd kernel call per row
    * ([[graft.functions.expressions.NearestCentroidL2]]); the k×dim
    * centroid matrix rides along as a codegen reference object. `cs` is
    * cid-sorted, so the kernel's lowest-INDEX tie-break is the lowest-CID
    * tie-break; the positional result maps back through a literal array
    * (clusters can vanish, leaving cid gaps). */
  private def nearest(v: Column, cs: Seq[(Long, Array[Double])]): Column = {
    val idx = graft.functions.expressions.VectorExpressions
      .nearest_centroid_l2(v, cs.map(_._2.toSeq))
    element_at(array(cs.map(c => lit(c._1)): _*), (idx + 1).cast("int"))
  }

  /** The composable zip_with/aggregate + round(_, 6) form of [[nearest]] —
    * interpreted per element, so the codegen kernel replaces it in the
    * hot path; kept for the KMeansSpec bit-parity pin between the two. */
  private[graft] def nearestComposable(v: Column,
      cs: Seq[(Long, Array[Double])]): Column = {
    val dists = cs.map { case (cid, c) =>
      val cLit = array(c.map(lit).toSeq: _*)
      val d2 = aggregate(
        zip_with(v, cLit, (x, m) => (x - m) * (x - m)),
        lit(0.0), (acc, x) => acc + x)
      (cid, org.apache.spark.sql.functions.round(d2, 6))
    }
    dists.tail.foldLeft((dists.head._2, lit(dists.head._1))) {
      case ((bd, bc), (cid, d)) =>
        (when(d < bd, d).otherwise(bd), when(d < bd, lit(cid)).otherwise(bc))
    }._2
  }
}
