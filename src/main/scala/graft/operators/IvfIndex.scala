package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.functions.expressions.VectorExpressions.cosine_sim

/** IVF (inverted-file) approximate nearest neighbor — the clustered
  * alternative to random-hyperplane LSH ([[Similarity.lshCosineTopK]]).
  *
  * Train: pick nLists deterministic seed centroids (hash-ordered sample),
  * run a few Lloyd iterations of spherical k-means entirely as DataFrame
  * aggregations. Index: assign every vector to its nearest centroid (one
  * broadcast join — centroids are tiny). Query: probe the nProbe nearest
  * lists per query and scan only those lists.
  *
  * Scale shape: training touches each vector `iters` times with a
  * broadcast of nLists centroids (no shuffle of the vectors); the index
  * assignment is one narrow pass; a query with nProbe/nLists = 1/8 scans
  * ~12% of the corpus instead of 100%. Lists can additionally be written
  * `partitionBy(list_id)` so probing prunes at the file level.
  *
  * Determinism: centroid seeds are chosen by xxhash64(id) order; every
  * arithmetic step is Column math; ties broken by id throughout.
  */
object IvfIndex {

  /** Spherical k-means centroids as (list_id, centroid array<double>). */
  def train(vectors: DataFrame, idCol: String, vecCol: String,
      nLists: Int, iters: Int = 3): DataFrame = {
    val spark = vectors.sparkSession
    val dim = vectors.select(size(col(vecCol))).head().getInt(0)
    // seed centroids: nLists vectors in deterministic pseudo-random order
    var centroids = vectors
      .withColumn("__h", xxhash64(col(idCol)))
      .orderBy("__h").limit(nLists)
      .withColumn("list_id", row_number().over(Window.orderBy("__h")) - 1)
      .select(col("list_id"), normalized(col(vecCol), dim).as("centroid"))
    for (_ <- 0 until iters) {
      val assigned = assign(vectors, idCol, vecCol, centroids)
      // new centroid = mean of members, renormalized; empty lists keep
      // their previous centroid (left join + coalesce)
      // per-dimension means via exact decimal sums: float avg is
      // accumulation-order dependent, which would make centroids (and
      // borderline assignments) vary with partitioning/parallelism
      val sums = assigned
        .select(col("list_id"), normalized(col(vecCol), dim).as("nv"))
        .groupBy("list_id")
        .agg(array((0 until dim).map(i =>
          (sum(element_at(col("nv"), i + 1).cast(DecimalType(28, 14))).cast("double") /
            count(lit(1)))): _*).as("mean"))
        .select(col("list_id"), normalized(col("mean"), dim).as("newc"))
      centroids = centroids.join(sums, Seq("list_id"), "left")
        .select(col("list_id"), coalesce(col("newc"), col("centroid")).as("centroid"))
    }
    centroids
  }

  private def normalized(vec: org.apache.spark.sql.Column, dim: Int) = {
    val vd = transform(vec, _.cast("double"))
    val nrm = sqrt(aggregate(transform(vd, x => x * x), lit(0.0), _ + _))
    // zero vectors stay zero instead of becoming NaN and poisoning a
    // centroid mean during Lloyd iterations
    when(nrm === 0.0, vd).otherwise(transform(vd, x => x / nrm))
  }

  /** Nearest-centroid assignment: broadcast join + rank-1 (adds `list_id`). */
  def assign(vectors: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__sim").desc, col("list_id").asc)
    vectors.join(broadcast(centroids))
      .withColumn("__sim", cosine_sim(col(vecCol), col("centroid")))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__sim", "__rk", "centroid")
  }

  /** Top-k cosine neighbors per query, scanning only the nProbe nearest
    * lists. Same output shape as [[Similarity.cosineTopK]]. */
  def topK(queries: DataFrame, vectors: DataFrame, idCol: String,
      vecCol: String, k: Int, nLists: Int = 16, nProbe: Int = 4,
      iters: Int = 3): DataFrame = {
    val centroids = train(vectors, idCol, vecCol, nLists, iters).cache()
    val indexed = assign(vectors, idCol, vecCol, centroids)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), col("list_id"))
    // nProbe nearest lists per query
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("__sim").desc, col("list_id").asc)
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .join(broadcast(centroids))
      .withColumn("__sim", cosine_sim(col("qv"), col("centroid")))
      .withColumn("__rk", row_number().over(wq))
      .filter(col("__rk") <= nProbe)
      .select(col("query_id"), col("qv"), col("list_id"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    probes.join(indexed, "list_id")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine_sim(col("qv"), col("cv")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }
}
