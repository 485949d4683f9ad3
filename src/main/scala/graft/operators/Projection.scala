package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dense random projection (Johnson–Lindenstrauss) — the
  * dimensionality-reduction half of the embedding toolkit: project
  * `inDim`-dimensional vectors to `outDim` dimensions through a fixed
  * pseudo-random matrix so downstream ANN / clustering / dedup passes
  * (cosineTopK, KMeans, nearDupPairs) run on vectors a fraction of the
  * size. JL: pairwise distances are preserved within (1 ± ε) for
  * outDim = O(log n / ε²), so a 64→16 projection keeps neighbor
  * structure while cutting every downstream shuffle and kernel cost 4×.
  *
  * Scale shape: the projection is a pure row-local map — zero shuffle,
  * zero state, O(inDim·outDim) multiply-adds per row. The matrix itself
  * never ships as data: entry r[j][k] derives from md5("salt:j:k"), so
  * it is rebuilt identically anywhere — on the driver here, in the
  * DuckDB oracle relationally, on another engine entirely — with no RNG
  * state, no seed file, no broadcast. (A uniform [-1,1) matrix scaled by
  * 1/√outDim satisfies the JL moment conditions — Achlioptas 2003 shows
  * even ±1 entries do; Gaussian entries are not required.)
  *
  * Determinism contract (what the q92 oracle pins): u = first 8 md5 hex
  * chars of "salt:j:k" read as a 32-bit integer over 2^32 ∈ [0, 1);
  * r[j][k] = (2u − 1)/√outDim; y[k] = Σ_j x[j]·r[j][k] accumulated
  * left-to-right in doubles, rounded to 6 decimals — the q28/q54 float
  * portability recipe.
  */
object Projection {

  /** The (j, k) projection-matrix entry — see the determinism contract
    * above. Engine-portable: DuckDB spells it
    * `((CAST(('0x' || substr(md5(salt || ':' || j || ':' || k), 1, 8))
    * AS UBIGINT) / 4294967296.0) * 2 - 1) / sqrt(outDim)`. */
  def matrixEntry(salt: String, j: Int, k: Int, outDim: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$salt:$j:$k".getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    val u = java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
    (u * 2.0 - 1.0) / math.sqrt(outDim.toDouble)
  }

  /** Adds `outCol` (default "projected"): the outDim-dimensional
    * projection of `vecCol`, each coordinate rounded to 6 decimals.
    * Vectors whose length differs from `inDim` fail the job loudly — a
    * silently mis-shaped vector would project to garbage coordinates
    * (same philosophy as tokenBudgetSample's weight guard). */
  def randomProject(df: DataFrame, vecCol: String, inDim: Int, outDim: Int,
      salt: String = "rp", outCol: String = "projected"): DataFrame = {
    require(inDim > 0, s"inDim must be positive, got $inDim")
    require(outDim > 0, s"outDim must be positive, got $outDim")

    val guarded = when(size(col(vecCol)) =!= inDim,
        raise_error(concat(
          lit(s"randomProject: expected $inDim-dim vector in $vecCol, got "),
          size(col(vecCol)).cast("string"))).cast("array<double>"))
      .otherwise(col(vecCol).cast("array<double>"))

    // one sequential-fold dot product per output dim; the matrix columns
    // are literal arrays (plan constants — at most inDim·outDim doubles,
    // parameter-bounded, never a join side)
    val coords: Seq[Column] = (0 until outDim).map { k =>
      val mk = array((0 until inDim).map(j =>
        lit(matrixEntry(salt, j, k, outDim))): _*)
      round(aggregate(
        zip_with(col("__rp_v"), mk, (a, b) => a * b),
        lit(0.0), (acc, v) => acc + v), 6)
    }
    df.withColumn("__rp_v", guarded)
      .withColumn(outCol, array(coords: _*))
      .drop("__rp_v")
  }
}
