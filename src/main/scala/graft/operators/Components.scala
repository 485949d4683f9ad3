package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the step that turns pairwise
  * near-duplicate output (Dedup.ngramJaccardPairs / minhashNearDupPairs /
  * simhashNearDupPairs) into dedup clusters with one canonical document
  * per cluster. Pairs alone under-delete: if A~B and B~C but A!~C, keeping
  * "one per pair" keeps two of the three docs; the component {A,B,C} keeps
  * exactly one.
  *
  * Algorithm: alternating large-star / small-star contraction (Kiveris et
  * al., "Connected Components in MapReduce and Beyond", SoCC'14 — public).
  * Each round is two groupBy-join passes over the edge set; the edge set
  * contracts toward one star per component rooted at the component's
  * minimum node id, converging in O(log^2 n) rounds. This is the 100 TB
  * shape: no driver-side graph, no transitive-closure blow-up — every
  * round's shuffle is bounded by the current edge count, and edges only
  * ever get replaced by strictly-smaller-rooted ones. (The DuckDB oracle
  * for q53 uses the opposite formulation — a recursive-CTE transitive
  * closure — fine at test scale, impossible at corpus scale.)
  *
  * Determinism: the component label is the MINIMUM node id of the
  * component — a set property of the input, independent of partitioning,
  * iteration count, or join order.
  *
  * Driver loop contract: the per-round actions compute ONE aggregate row
  * (count + order-independent hash fingerprint) for the convergence test —
  * scalars, not data, in line with the IvfIndex.fit precedent.
  */
object Components {

  /** Labels every node that appears in `edges` with its component's
    * minimum node id. Output: (node, component), one row per distinct
    * node. Nodes with no edges are the caller's concern (left-join the
    * entity table and coalesce to the node's own id — see q53).
    *
    * @param maxRounds safety bound; the alternation converges in
    *   O(log^2 n) rounds (2 suffices for the star-shaped near-dup graphs
    *   the dedup operators emit). Non-convergence throws rather than
    *   returning partially-contracted labels. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 25): DataFrame = {
    // canonical orientation (big -> small); both star steps preserve it
    // localCheckpoint (not cache) each round: each star step references its
    // input several times, so an un-truncated lineage grows ~4x per round
    // and the analyzer chokes on the tree long before the data is a
    // problem. Checkpointing pins the round's RESULT and restarts the plan
    // from it — the loop's cost stays proportional to the edge count. (On
    // a cluster with executor churn, swap in reliable checkpoint() with a
    // checkpoint dir; the loop shape is identical.)
    var e = edges
      .select(greatest(col(srcCol), col(dstCol)).as("u"),
        least(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    var fp = fingerprint(e)
    var rounds = 0
    var converged = fp._1 == 0L
    while (!converged && rounds < maxRounds) {
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      val nfp = fingerprint(next)
      e = next
      converged = nfp == fp
      fp = nfp
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxRounds rounds")
    // fixpoint is a star per component: src nodes point at the root, the
    // root itself appears only on the dst side
    e.select(col("u").as("node"), col("v").as("component"))
      .unionByName(e.select(col("v").as("node"), col("v").as("component")))
      .distinct()
  }

  /** Large-star: every node u relinks its LARGER neighbors to
    * m = min(N(u) + u). Each input edge is processed from its smaller
    * endpoint's side, so the output edge count never exceeds the input's,
    * and every output edge (v, m) keeps v > m (canonical). */
  private def largeStar(e: DataFrame): DataFrame = {
    val nb = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
    val mins = nb.groupBy("u").agg(min(col("v")).as("mv"))
      .select(col("u"), least(col("mv"), col("u")).as("m"))
    nb.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Small-star: every node u relinks its smaller neighbors (and itself)
    * to m = min of those neighbors. Operates on the canonical orientation
    * directly — no doubling — and keeps it. */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy("u").agg(min(col("v")).as("m"))
    e.join(mins, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
      .unionByName(mins.select(col("u"), col("m").as("v")))
      .distinct()
  }

  /** Order-independent edge-set fingerprint: (count, sum of per-edge
    * hashes). The hash sum accumulates in decimal(38,0) — wide enough that
    * ANSI mode can never overflow it (long sums throw under Spark 4's
    * default ANSI arithmetic). One aggregate row per convergence test. */
  private def fingerprint(e: DataFrame): (Long, String) = {
    val r = e.agg(count(lit(1)),
      sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)"))).head()
    (r.getLong(0), if (r.isNullAt(1)) "0" else r.getDecimal(1).toPlainString)
  }
}
