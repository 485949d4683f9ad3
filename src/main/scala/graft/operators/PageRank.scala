package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank centrality in ENGINE-PORTABLE fixed-point integer
  * arithmetic — the authority-prior computation web-corpus curation
  * runs over its link/domain graph (a high-centrality domain is a
  * quality prior for its documents; the same shape ranks suppliers in
  * a co-purchase graph or users in an interaction graph).
  *
  * Why integer fixed-point: float PageRank sums quotients (rank ÷
  * out-degree) whose accumulation order differs across engines — the
  * exact class of cross-engine drift the decimal-sum discipline exists
  * to avoid (and decimal DIVISION rounds per-engine, so decimals don't
  * save it either). Instead ranks live in integer "units" (RankUnit =
  * 10^12 ≙ rank mass 1.0) and every step is floor arithmetic on
  * nonnegative longs — bit-identical on any engine:
  *
  *   r₀(v)  = RankUnit DIV n
  *   c(v)   = r(v) DIV outdeg(v)          (per-edge contribution)
  *   r'(v)  = (15·RankUnit) DIV (100·n) + (85·Σ incoming c) DIV 100
  *
  * (d = 0.85 as the rational 85/100; floors shed at most a few units
  * per step — bounded, deterministic, identical on both sides.)
  *
  * Scale shape: per iteration, ONE join of the rank frame (|V| rows)
  * onto the edge list and ONE groupBy(dst) sum — the canonical
  * power-iteration plan; lineage is localCheckpoint-truncated per
  * round like Components' contraction loop. Dangling nodes (outdeg 0)
  * shed their mass — the standard simplification; add self-loops at
  * the caller if mass conservation matters. */
object PageRank {

  val RankUnit: Long = 1000000000000L

  /** Ranks after `iters` power iterations over the DIRECTED edge list
    * (duplicate edges collapse). Returns (node, rank_units). */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct().cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    val n = nodes.count()
    require(n > 0, "empty edge list")
    // cached: every iteration's contribution join re-reads this degree
    // frame — uncached it re-ran the groupBy per power iteration
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")).cache()
    val teleport = 15L * RankUnit / (100L * n) // floor, nonneg

    var r = nodes.select(col("node"), lit(RankUnit / n).as("rank_units"))
    (1 to iters).foreach { _ =>
      val contrib = r.join(outdeg, r("node") === outdeg("src"))
        .select(col("node").as("cnode"),
          expr("rank_units DIV outdeg").as("c"))
      val incoming = e.join(contrib, e("src") === contrib("cnode"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_sum"))
      r = nodes.join(incoming, nodes("node") === incoming("dst"), "left")
        .select(col("node"),
          (lit(teleport) +
            expr("85 * coalesce(in_sum, CAST(0 AS BIGINT)) DIV 100"))
            .as("rank_units"))
        .localCheckpoint()
    }
    // the final r is checkpoint-truncated (self-contained): the loop's
    // working caches can be released instead of leaking to clearCache
    outdeg.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    e.unpersist(blocking = false)
    r
  }
}
