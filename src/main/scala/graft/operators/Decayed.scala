package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-decayed "trending" leaderboards: per key, the top-k items by an
  * exponentially decayed event count with half-life = one window — the
  * leaderboard shape (trending hashtags / hot products / noisy hosts)
  * where yesterday's burst must not outrank today's.
  *
  * Determinism/portability: the decayed score is computed in EXACT
  * integer arithmetic. With windows w = ⌊epoch_ms / windowMillis⌋ and the
  * GLOBAL newest window W, an item's score in units of 2^-maxBack is
  *
  *   U(item) = Σ_w  c_{item,w} · 2^(maxBack − (W − w))   for W−w ≤ maxBack
  *
  * — per-window counts times power-of-two weights, a plain long sum
  * (weights ≤ 2^maxBack, maxBack ≤ 40 keeps any realistic corpus far from
  * overflow). Windows older than maxBack contribute 0: an explicit,
  * documented cutoff rather than a silently-rounded float tail, and the
  * reason no float (whose 2^-k tails WOULD differ between engines once
  * summed in different orders) ever enters the ranking. Ties break on
  * item ascending — fully deterministic.
  *
  * Scale shape: one groupBy(key, item, window) count (map-side partial
  * combine does the heavy lifting), one 1-row global-max broadcast, one
  * groupBy(key, item) sum, one per-key top-k window (WindowGroupLimit
  * pushes the rank filter before the final sort at scale). Nothing ever
  * materializes more than (key, item, window) rows; the raw events
  * shuffle once into the first aggregate. */
object Decayed {

  /** Top-k items per key by decayed count.
    *
    * @param windowMillis decay window width (= the half-life)
    * @param maxBack      windows older than this score 0 (cutoff)
    * @param k            leaderboard depth per key */
  def leaderboard(df: DataFrame, keyCol: String, itemCol: String,
      tsCol: String, windowMillis: Long, maxBack: Int = 18,
      k: Int = 10): DataFrame = {
    require(windowMillis > 0, s"windowMillis must be positive, got $windowMillis")
    require(maxBack >= 0 && maxBack <= 40,
      s"maxBack must be in [0, 40], got $maxBack")
    require(k >= 1, s"k must be >= 1, got $k")
    val reserved = Seq("__w", "__c", "__wmax", "__delta", "score_units", "rank")
    require(df.columns.forall(!reserved.contains(_)),
      s"column names $reserved are reserved by leaderboard")

    val perWindow = df
      .select(col(keyCol), col(itemCol),
        expr(s"(unix_micros(`$tsCol`) DIV 1000) DIV ${windowMillis}L")
          .as("__w"))
      .groupBy(col(keyCol), col(itemCol), col("__w"))
      .agg(count(lit(1)).as("__c"))
    val wmax = perWindow.agg(max(col("__w")).as("__wmax"))
    val weighted = perWindow
      .join(broadcast(wmax))
      .withColumn("__delta", col("__wmax") - col("__w"))
      .filter(col("__delta") <= maxBack)
      // 2^(maxBack − Δ) is exact in a double up to 2^52, so the cast is
      // lossless; the per-item sum stays a plain long
      .withColumn("score_units",
        col("__c") * pow(lit(2.0), lit(maxBack) - col("__delta")).cast("long"))
      .groupBy(col(keyCol), col(itemCol))
      .agg(sum(col("score_units")).as("score_units"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("score_units").desc, col(itemCol).asc)
    weighted.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
