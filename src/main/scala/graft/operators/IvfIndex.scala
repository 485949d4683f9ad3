package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.functions.expressions.VectorExpressions.cosine_sim

/** IVF (inverted-file) approximate nearest neighbor — the clustered
  * alternative to random-hyperplane LSH ([[Similarity.lshCosineTopK]]).
  *
  * Train: pick nLists deterministic seed centroids (hash-ordered sample),
  * run a few Lloyd iterations of spherical k-means. Index: assign every
  * vector to its nearest centroid. Query: probe the nProbe nearest lists
  * per query and scan only those lists.
  *
  * Scale shape (the MLlib k-means shape): the centroid table is tiny
  * (nLists × dim doubles), so it rides along as a broadcast literal and
  * nearest-centroid assignment is a NARROW map — no join expansion, no
  * shuffle of the vectors, ever. Each Lloyd iteration costs one scan of
  * the corpus plus a map-side-combined groupBy over nLists keys whose
  * result (nLists rows) is collected to the driver. A query with
  * nProbe/nLists = 1/8 then scans ~12% of the corpus instead of 100%.
  * Lists can additionally be written `partitionBy(list_id)` so probing
  * prunes at the file level.
  *
  * Determinism: centroid seeds are chosen by xxhash64(id) order; per-
  * dimension means use exact decimal sums (float accumulation order would
  * make centroids vary with partitioning); ties in assignment break toward
  * the lowest list_id via the struct-max trick below.
  */
object IvfIndex {

  private type Centroids = Seq[(Int, Seq[Double])]

  /** Nearest-centroid id as a narrow, codegen'd Column expression (ties
    * pick the lowest list_id). The argmax index maps back through the id
    * array, so sparse/filtered centroid frames keep their true ids. */
  private def nearestList(vec: Column, cents: Centroids): Column = {
    val idx = graft.functions.expressions.VectorExpressions.nearest_centroid(
      vec, cents.map(_._2))
    element_at(typedLit(cents.map(_._1)), idx + 1)
  }

  private def collectCentroids(centroids: DataFrame): Centroids = {
    import centroids.sparkSession.implicits._
    centroids.select(col("list_id").cast("int"), col("centroid"))
      .as[(Int, Seq[Double])].collect().sortBy(_._1).toSeq
  }

  /** Spherical k-means centroids as (list_id, centroid array<double>). */
  def train(vectors: DataFrame, idCol: String, vecCol: String,
      nLists: Int, iters: Int = 3): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    // seed centroids: nLists vectors in deterministic pseudo-random order
    val seeds: Centroids = vectors
      .withColumn("__h", xxhash64(col(idCol)))
      .orderBy("__h").limit(nLists)
      .select(normalized(col(vecCol)))
      .as[Seq[Double]].collect().toSeq.zipWithIndex.map { case (c, i) => (i, c) }
    var cents = seeds
    for (_ <- 0 until iters) {
      // new centroid = renormalized mean of members; empty lists keep
      // their previous centroid. One corpus scan: narrow assignment +
      // posexplode + partial-aggregated groupBy over nLists×dim keys,
      // collected (tiny) and renormalized driver-side. Decimal sums keep
      // the means independent of partitioning/accumulation order.
      val sums = vectors
        .select(
          nearestList(col(vecCol), cents).as("list_id"),
          posexplode(normalized(col(vecCol))).as(Seq("pos", "x")))
        .groupBy("list_id", "pos")
        .agg((sum(col("x").cast(DecimalType(28, 14))).cast("double") /
          count(lit(1))).as("mean"))
        .as[(Int, Int, Double)].collect()
        .groupBy(_._1)
        .map { case (listId, dims) =>
          val mean = dims.sortBy(_._2).map(_._3)
          val nrm = math.sqrt(mean.map(x => x * x).sum)
          listId -> (if (nrm == 0.0) mean.toSeq else mean.map(_ / nrm).toSeq)
        }
      cents = cents.map { case (i, old) => (i, sums.getOrElse(i, old)) }
    }
    cents.toDF("list_id", "centroid")
  }

  private def normalized(vec: Column): Column = {
    val vd = transform(vec, _.cast("double"))
    val nrm = sqrt(aggregate(transform(vd, x => x * x), lit(0.0), _ + _))
    // zero vectors stay zero instead of becoming NaN and poisoning a
    // centroid mean during Lloyd iterations
    when(nrm === 0.0, vd).otherwise(transform(vd, x => x / nrm))
  }

  /** Nearest-centroid assignment (adds `list_id`) — a narrow map; the
    * centroid frame is collected driver-side (nLists rows) and inlined. */
  def assign(vectors: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame = {
    val cents = collectCentroids(centroids)
    vectors.withColumn("list_id", nearestList(col(vecCol), cents))
  }

  /** Top-k cosine neighbors per query, scanning only the nProbe nearest
    * lists. Same output shape as [[Similarity.cosineTopK]]. */
  def topK(queries: DataFrame, vectors: DataFrame, idCol: String,
      vecCol: String, k: Int, nLists: Int = 16, nProbe: Int = 4,
      iters: Int = 3): DataFrame = {
    val cents = collectCentroids(
      train(vectors, idCol, vecCol, nLists, iters))
    val indexed = vectors
      .withColumn("list_id", nearestList(col(vecCol), cents))
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), col("list_id"))
    // nProbe nearest lists per query: the query side is small, so rank
    // its centroid sims driver-free via posexplode of the literal — still
    // narrow — then broadcast the (query, list) probe set into the scan.
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("__sim").desc, col("list_id").asc)
    val centsExploded = posexplode(typedLit(cents.map(_._2)))
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .select(col("query_id"), col("qv"), centsExploded.as(Seq("pos", "centroid")))
      // map the explode position through the id array, same as nearestList,
      // so probe list ids agree with assignment even for sparse centroids
      .withColumn("list_id", element_at(typedLit(cents.map(_._1)), col("pos") + 1))
      .withColumn("__sim", cosine_sim(col("qv"), col("centroid")))
      .withColumn("__rk", row_number().over(wq))
      .filter(col("__rk") <= nProbe)
      .select(col("query_id"), col("qv"), col("list_id"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    indexed.join(broadcast(probes), "list_id")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine_sim(col("qv"), col("cv")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }
}
