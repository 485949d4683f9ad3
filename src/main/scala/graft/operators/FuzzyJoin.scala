package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance (fuzzy) join: all pairs with levenshtein(leftKey,
  * rightKey) <= maxDist — entity resolution over noisy keys (names,
  * addresses, product codes) without a quadratic comparison. Two lossless
  * blocking strategies, dispatched on the distance (see
  * [[editDistancePairs]]): SymSpell deletion neighborhoods for
  * maxDist <= 2, PassJoin segment blocking beyond.
  *
  * Segment blocking (Li, Deng, Feng; public):
  * Every right key of length n splits into maxDist+1 DISJOINT segments
  * covering it; maxDist edits can touch at most maxDist of those, so any
  * left key within distance maxDist contains at least one segment as an
  * EXACT substring, at a position shifted by at most maxDist from the
  * segment's home (each edit moves downstream positions by at most one).
  * Pigeonhole makes the blocking LOSSLESS — the same argument as the
  * SimHash chunk banding — and the per-key probe fan-out is a constant:
  * at most (maxDist+1)·(2·maxDist+1) substrings per candidate length,
  * lengths within ±maxDist.
  *
  * Scale shape: one narrow explode per side (segments right, probe
  * substrings left — both row-local Column expressions), an equi-join on
  * (length, segment_idx, segment) — hashable, skew-bounded by segment
  * selectivity — then candidate dedup on ids and ONE codegen
  * `levenshtein` verification per surviving pair. No cross join at any
  * size. Keys shorter than maxDist+1 can't be segmented (pigeonhole
  * needs maxDist+1 non-empty pieces); they route through a dedicated
  * short-key branch — a length-banded nested-loop join over the
  * (structurally tiny) population of keys of length <= 2·maxDist.
  *
  * Output: (id_a, id_b, dist) — id_a from the left side, id_b from the
  * right (fixed names, like the Dedup pair operators, so self-joins don't
  * collide). For a self-join, pass the same frame twice and keep
  * `id_a < id_b` downstream. Ids are assumed unique per row (row
  * identifiers, as in every Dedup/Similarity pair operator): the
  * candidate stage exchanges and dedups ID PAIRS ONLY — key text never
  * enters a shuffle — and keys rejoin by id for the single levenshtein
  * verification per surviving pair (measured 2.3x on sf0.1 customer
  * names vs carrying text through the candidate distinct). */
object FuzzyJoin {

  /** Dispatch: deletion-neighborhood blocking (SymSpell) for maxDist <= 2,
    * segment blocking (PassJoin) beyond. The deletion path's candidate set
    * tracks the TRUE pair count even when keys share long constant
    * prefixes — the case that degenerates segment blocking to quadratic
    * (every key's first segment is the shared prefix, so the hot block
    * enumerates all pairs; observed on `Customer#…` style keys). The
    * segment path wins for longer distances, where the deletion
    * neighborhood grows as len^maxDist. */
  def editDistancePairs(left: DataFrame, right: DataFrame,
      leftId: String, leftKey: String, rightId: String, rightKey: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 8,
      s"maxDist must be in [1, 8] (probe fan-out grows with distance), got $maxDist")
    val l = left.select(col(leftId).as("__lid"), col(leftKey).as("__lk"))
      .filter(col("__lk").isNotNull)
    val r = right.select(col(rightId).as("__rid"), col(rightKey).as("__rk"))
      .filter(col("__rk").isNotNull)
    // candidate stages emit (__lid, __rid) id pairs only; keys rejoin here
    val cands =
      if (maxDist <= 2) deletionCandidates(l, r, maxDist)
      else segmentCandidates(l, r, maxDist)
    cands
      .join(l, "__lid")
      .join(r, "__rid")
      .withColumn("dist", levenshtein(col("__lk"), col("__rk")))
      .filter(col("dist") <= maxDist)
      .select(col("__lid").as("id_a"), col("__rid").as("id_b"),
        col("dist").cast("long").as("dist"))
  }

  /** SymSpell deletion-neighborhood candidates (Garbe, public domain):
    * two keys within edit distance t share a common string in their
    * <=t-deletion neighborhoods (delete the aligned edited positions from
    * each side of any optimal alignment), so joining the exploded
    * neighborhoods is lossless; sharing one bounds the distance by 2t,
    * and the exact levenshtein verification above closes the gap.
    *
    * The join keys on xxhash64 of the variant (8 bytes through the
    * exchange, never the variant text); a collision only adds a false
    * candidate that verification discards. Neighborhood size is
    * 1 + m + m^2/2 per key at t=2 — linear explode, no cross join, and
    * shared constant prefixes do NOT collapse the blocking (deleting
    * inside the shared prefix yields variants that still carry the keys'
    * distinguishing tail). */
  private def deletionCandidates(l: DataFrame, r: DataFrame, t: Int): DataFrame = {
    // del1(s) = every single-char deletion of s; depth-2 applies it again
    val del1 = "transform(sequence(1, length(%1$s)), i -> " +
      "concat(substring(%1$s, 1, i - 1), substring(%1$s, i + 1, length(%1$s))))"
    def neighborhood(key: String): String = {
      val d1 = del1.format(key)
      if (t == 1) s"array_distinct(concat(array($key), if(length($key) = 0, array(), $d1)))"
      else {
        val d2 = s"flatten(transform($d1, v -> " +
          "transform(sequence(1, length(v)), j -> " +
          "concat(substring(v, 1, j - 1), substring(v, j + 1, length(v))))))"
        s"array_distinct(concat(array($key), " +
          s"if(length($key) = 0, array(), $d1), " +
          s"if(length($key) <= 1, array(), $d2)))"
      }
    }
    val lv = l.select(col("__lid"),
      explode(expr(s"transform(${neighborhood("__lk")}, v -> xxhash64(v))")).as("vh"))
    val rv = r.select(col("__rid"),
      explode(expr(s"transform(${neighborhood("__rk")}, v -> xxhash64(v))")).as("vh"))
    lv.join(rv, "vh")
      .select(col("__lid"), col("__rid"))
      .distinct()
  }

  private def segmentCandidates(l: DataFrame, r: DataFrame, maxDist: Int): DataFrame = {
    val t = maxDist
    val k = t + 1

    // ---- segment branch: right keys long enough to pigeonhole ----
    // segment i of a length-n key: base = n div k wide, the last n % k
    // segments one wider; home position start_i accumulates the widths
    val segs = r.withColumn("n", length(col("__rk")))
      .filter(col("n") >= k)
      .select(col("__rid"), col("n"),
        explode(expr(
          s"""transform(sequence(0, $t), i -> named_struct(
             |  'seg_idx', i,
             |  'seg', substring(__rk,
             |    1 + i * (n div $k) + greatest(0, i - ($k - n % $k)),
             |    (n div $k) + if(i >= $k - n % $k, 1, 0))))""".stripMargin))
          .as("s"))
      .select(col("__rid"), col("n"),
        col("s.seg_idx").as("seg_idx"), col("s.seg").as("seg"))

    // probe substrings of each left key: for every candidate right length
    // n in [m-t, m+t] (n >= k) and segment i, every start within +-t of
    // the segment's home that stays inside the key
    val probes = l.withColumn("m", length(col("__lk")))
      .select(col("__lid"),
        explode(expr(
          s"""flatten(flatten(
             |  transform(filter(sequence(m - $t, m + $t), n -> n >= $k), n ->
             |    transform(sequence(0, $t), i ->
             |      transform(
             |        filter(sequence(
             |            i * (n div $k) + greatest(0, i - ($k - n % $k)) - $t,
             |            i * (n div $k) + greatest(0, i - ($k - n % $k)) + $t),
             |          p -> p >= 0 AND
             |               p <= m - ((n div $k) + if(i >= $k - n % $k, 1, 0))),
             |        p -> named_struct(
             |          'n', n, 'seg_idx', i,
             |          'seg', substring(__lk, p + 1,
             |            (n div $k) + if(i >= $k - n % $k, 1, 0))))))))""".stripMargin))
          .as("p"))
      .select(col("__lid"),
        col("p.n").as("n"), col("p.seg_idx").as("seg_idx"), col("p.seg").as("seg"))

    val longPairs = probes.join(segs, Seq("n", "seg_idx", "seg"))
      .select(col("__lid"), col("__rid"))

    // ---- short branch: right keys with < k characters ----
    // any left within distance t of a key of length < k has length < k+t
    // <= 2t+1; both sides of this branch are structurally tiny
    val shortPairs = l.filter(length(col("__lk")) <= 2 * t)
      .join(r.filter(length(col("__rk")) < k),
        abs(length(col("__lk")) - length(col("__rk"))) <= t)
      .select(col("__lid"), col("__rid"))

    longPairs.unionByName(shortPairs).distinct()
  }

  /** Jaro–Winkler join: all pairs with jaro_winkler(leftKey, rightKey)
    * >= minSim — the OTHER standard entity-resolution screen beside
    * [[editDistancePairs]]. Unlike levenshtein, JW has no metric
    * structure to exploit (no triangle inequality, no pigeonhole over
    * edits), so a LOSSLESS content blocking does not exist; production
    * JW joins block heuristically, and this operator makes that
    * contract explicit:
    *
    *  - the caller supplies the blocking key (`block`, a Column
    *    function of the key — a phonetic code, a sorted-neighborhood
    *    key, a registered domain); the default is Spark's built-in
    *    `soundex`, the classic name-matching choice. Recall is that of
    *    the blocking key: soundex survives most interior typos but NOT
    *    a first-letter substitution — documented, spec-measured;
    *  - the operator contributes the PROVABLE length-band prune: from
    *    jw = jaro + 0.1·l·(1−jaro) ≤ 0.6·jaro + 0.4 and
    *    jaro ≤ (m/la + m/lb + 1)/3 with m ≤ min(la, lb), any pair at
    *    jw ≥ minSim satisfies min/max ≥ 3·(minSim − 0.4)/0.6 − 2, so
    *    length-discordant candidates die BEFORE scoring (requires
    *    minSim > 0.8 for a nontrivial band, enforced);
    *  - ONE codegen [[graft.functions.expressions.TextExpressions
    *    .jaro_winkler]] verification per surviving candidate; id pairs
    *    only in the exchanges; never a cross join.
    *
    * Output: (id_a, id_b, sim). Self-join: pass the frame twice, keep
    * id_a < id_b downstream (as [[editDistancePairs]]). */
  /** Sorted-neighborhood candidate pairs (Hernández & Stolfo's SNM, the
    * classic entity-resolution alternative to blocking): rank every row
    * by (sortKey, id) and emit each pair within `window` ranks. Where a
    * blocking key loses pairs that disagree on the key, SNM loses pairs
    * that sort far apart — the two methods' blind spots differ, which is
    * why production ER runs multiple passes with different keys (e.g. a
    * REVERSED-name pass catches the first-character typos that break
    * both soundex and prefix blocking).
    *
    * Scale shape — no global sort:
    *  1. cells = the sort key's first `cellPrefixLen` characters: a
    *     MONOTONE function of the string order, so cells tile the global
    *     order (the paretoClass two-level discipline, on strings);
    *  2. in-cell ranks via a window PARTITIONED BY cell — cell-sized
    *     sorts, parallel; cell offsets from one bounded cumulative pass
    *     over the cells frame (≤ distinct prefixes rows);
    *  3. the rank-band self-join: bucket = rank / window, the probe side
    *     explodes into its bucket and predecessor — each qualifying pair
    *     matches exactly once, never a cross join (the IntervalJoin bin
    *     trick on rank space).
    *
    * A skewed hot prefix makes one big cell sort — pick `cellPrefixLen`
    * for the key distribution (same caveat every cell-partitioned
    * operator documents). Output: (id_a, id_b, rank_dist), id_a the
    * lower-ranked row; callers score the candidates (jaro_winkler,
    * levenshtein) and threshold. */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String,
      sortKeyCol: String, window: Int, cellPrefixLen: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(window >= 1, s"window must be >= 1, got $window")
    require(cellPrefixLen >= 1, s"cellPrefixLen must be >= 1, got $cellPrefixLen")
    val base = df.select(col(idCol).as("__id"), col(sortKeyCol).as("__sk"))
      .withColumn("__cell", substring(col("__sk"), 1, cellPrefixLen))
    val inCell = Window.partitionBy(col("__cell"))
      .orderBy(col("__sk"), col("__id"))
    val cellOffsets = base.groupBy(col("__cell"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__offset",
        coalesce(sum(col("__n")).over(BoundedWindow.ordered(col("__cell"), col("__cell"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__cell"), col("__offset"))
    val ranked = base
      .withColumn("__r", row_number().over(inCell))
      .join(broadcast(cellOffsets), "__cell")
      .select(col("__id"), (col("__offset") + col("__r")).as("__rank"))
    val w = window.toLong
    val lhs = ranked.select(col("__id").as("id_a"), col("__rank").as("__ra"),
      (col("__rank") / w).cast("long").as("__b"))
    val rhs = ranked.select(col("__id").as("id_b"), col("__rank").as("__rb"))
      .select(col("id_b"), col("__rb"), explode(array(
        (col("__rb") / w).cast("long"),
        (col("__rb") / w).cast("long") - 1)).as("__b"))
    lhs.join(rhs, Seq("__b"))
      .filter(col("__rb") > col("__ra") && col("__rb") - col("__ra") <= w)
      .select(col("id_a"), col("id_b"), (col("__rb") - col("__ra")).as("rank_dist"))
  }

  def jaroWinklerPairs(left: DataFrame, right: DataFrame,
      idCol: String, keyCol: String, minSim: Double,
      block: org.apache.spark.sql.Column => org.apache.spark.sql.Column = soundex)
      : DataFrame = {
    require(minSim > 0.8 && minSim <= 1.0,
      s"minSim $minSim outside (0.8, 1] — the length-band prune needs " +
        "jaro > 2/3, i.e. jw > 0.8")
    val jaroFloor = (minSim - 0.4) / 0.6
    val ratio = 3 * jaroFloor - 2 // min(len)/max(len) lower bound
    val l = left.select(col(idCol).as("id_a"), col(keyCol).as("__ka"))
      .withColumn("__blk", block(col("__ka")))
    val r = right.select(col(idCol).as("id_b"), col(keyCol).as("__kb"))
      .withColumn("__blk", block(col("__kb")))
    l.join(r, Seq("__blk"))
      .filter(
        least(length(col("__ka")), length(col("__kb"))).cast("double") >=
          greatest(length(col("__ka")), length(col("__kb"))) * ratio)
      .select(col("id_a"), col("id_b"),
        graft.functions.expressions.TextExpressions
          .jaro_winkler(col("__ka"), col("__kb")).as("sim"))
      .filter(col("sim") >= minSim)
  }
}
