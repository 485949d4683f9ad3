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
  * Each round is two single-exchange window-min passes plus one distinct
  * over the edge set (3 exchanges + 1 convergence action); the edge set
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
    * Size-gated plan choice (the [[Dedup.jaccardPairsAuto]] discipline —
    * the gate statistic is the distinct-edge COUNT, already computed for
    * the convergence fingerprint, so it costs nothing): at or below
    * `smallGraphEdges` distinct long-keyed edges, the closure runs as a
    * driver-side union-find over the collected pairs — 16 bytes/edge,
    * ≤ 8 MB at the default gate, parameter-bounded in the
    * collected-centroids sense — because a near-dup graph is TINY
    * relative to its corpus (pairs survive screen+verify) and the star
    * loop's per-round scheduling latency dominates it. Above the gate,
    * or for non-integral node types, the bounded-round star contraction
    * runs unchanged — the 100 TB path. Both produce the identical
    * min-id labeling (a set property), pinned by ComponentsSpec.
    *
    * @param maxRounds safety bound; the alternation converges in
    *   O(log^2 n) rounds (2 suffices for the star-shaped near-dup graphs
    *   the dedup operators emit). Non-convergence throws rather than
    *   returning partially-contracted labels.
    * @param checkpointDir when set, per-round results go to RELIABLE
    *   checkpoints in this directory (HDFS/object store on a cluster)
    *   instead of executor-local localCheckpoint storage. Local
    *   checkpoint blocks die with their executor, and in a loop that
    *   REPLACES its lineage each round a lost block is unrecoverable —
    *   the job dies mid-iteration. On a long-lived cluster with executor
    *   churn (spot instances, autoscaling), pay the distributed-FS write
    *   for restartability; single-JVM runs keep the local default. The
    *   caller owns cleaning the directory afterwards.
    * @param smallGraphEdges driver union-find gate; 0 disables it. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 25, checkpointDir: Option[String] = None,
      smallGraphEdges: Long = 500000L): DataFrame = {
    val spark = edges.sparkSession
    val checkpoint: DataFrame => DataFrame = checkpointDir match {
      case Some(dir) =>
        // setCheckpointDir is session-global; set it from the parameter and
        // restore nothing — two interleaved loops with different dirs would
        // race anyway, and the last-set dir remains valid for both
        spark.sparkContext.setCheckpointDir(dir)
        df => df.checkpoint(eager = false)
      case None => df => df.localCheckpoint(eager = false)
    }
    // canonical orientation (big -> small); both star steps preserve it.
    // localCheckpoint (not cache) each round: each star step references its
    // input several times, so an un-truncated lineage grows ~4x per round
    // and the analyzer chokes on the tree long before the data is a
    // problem. Checkpointing pins the round's RESULT and restarts the plan
    // from it — the loop's cost stays proportional to the edge count. (On
    // a cluster with executor churn, swap in reliable checkpoint() with a
    // checkpoint dir; the loop shape is identical.)
    //
    // ONE driver action per round: the checkpoint is non-eager, so the
    // convergence fingerprint's aggregate is the job that materializes it —
    // the rows persist on first compute and the next round's star steps
    // read the persisted partitions, never the un-truncated plan.
    var e = checkpoint(edges
      .select(greatest(col(srcCol), col(dstCol)).as("u"),
        least(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct())
    var fp = fingerprint(e)
    // LongType only: the driver path must return the same (node,
    // component) schema the star path would, so narrower id types fall
    // through rather than silently widening
    val longKeyed = Seq(srcCol, dstCol).forall(c =>
      edges.schema(c).dataType == org.apache.spark.sql.types.LongType)
    if (longKeyed && fp._1 > 0L && fp._1 <= smallGraphEdges)
      return driverUnionFind(e)
    var rounds = 0
    var converged = fp._1 == 0L
    while (!converged && rounds < maxRounds) {
      val next = checkpoint(smallStar(largeStar(e)))
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

  /** Driver union-find over a gate-bounded canonical edge frame (long
    * ids; caller guarantees the size bound). Path-halving find; labels
    * are the component's minimum node id — identical to the star
    * contraction's fixpoint. */
  private def driverUnionFind(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val pairs = e.select(col("u").cast("long"), col("v").cast("long"))
      .as[(Long, Long)].collect()
    val parent = new java.util.HashMap[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrDefault(x, x)
      while (p != x) {
        val gp = parent.getOrDefault(p, p)
        parent.put(x, gp) // path halving
        x = gp
        p = parent.getOrDefault(x, x)
      }
      x
    }
    pairs.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) {
        // union by MIN root so the final root IS the component min id
        if (ru < rv) parent.put(rv, ru) else parent.put(ru, rv)
      }
    }
    val labels = pairs.iterator.flatMap { case (u, v) => Iterator(u, v) }
      .toArray.distinct.map(n => (n, find(n)))
    spark.createDataset(labels.toSeq).toDF("node", "component")
  }

  /** One keeper per component, chosen by HIGHEST priority (ties broken by
    * lowest node id) — the curation form of [[connectedComponents]].
    * Min-id keeper selection discards quality information: within a
    * near-dup cluster the copies genuinely differ (truncation, appended
    * boilerplate, OCR noise), and a training pipeline wants the BEST copy,
    * not the lowest-numbered one — the "keep by quality signal, not
    * arrival order" rule of modern curation recipes (FineWeb, RefinedWeb).
    *
    * Output: one row per node that appears in `edges` —
    * (node, component, <priorityCol>, keeper, is_keeper). Anti-join the
    * `is_keeper = false` rows against the corpus to drop the losers.
    * Edge-free nodes never appear (they are trivially their own keepers);
    * `priorities` must cover every node in `edges` (rows without a
    * priority would drop from the verdict — score the same frame the
    * pairs came from and this holds by construction).
    *
    * Scale shape: component labels from the star contraction (bounded-
    * shuffle rounds), then ONE id-keyed join to attach priorities, ONE
    * aggregate keyed on component ids — `max_by` partial-aggregates
    * map-side, so a giant boilerplate cluster cannot hot-spot a sort the
    * way a per-component `row_number` window would — and ONE
    * component-keyed rejoin. Every exchange carries (long, long, double)
    * rows, never document text.
    *
    * Determinism: max over (priority, -node) is a set property of the
    * input — independent of partitioning, join order, and round count.
    * NaN priorities would poison the max; scoring functions here emit
    * finite doubles ([[graft.functions.TextFunctions.qualityScore]]). */
  def keeperByPriority(edges: DataFrame, srcCol: String, dstCol: String,
      priorities: DataFrame, idCol: String, priorityCol: String,
      maxRounds: Int = 25, checkpointDir: Option[String] = None): DataFrame = {
    val comps = connectedComponents(edges, srcCol, dstCol, maxRounds, checkpointDir)
    val labeled = comps.join(
      priorities.select(col(idCol).as("node"), col(priorityCol).as("__pri")),
      "node")
    val keepers = labeled.groupBy(col("component"))
      .agg(max_by(col("node"), struct(col("__pri"), -col("node"))).as("keeper"))
    labeled.join(keepers, "component")
      .select(col("node"), col("component"), col("__pri").as(priorityCol),
        col("keeper"), (col("node") === col("keeper")).as("is_keeper"))
  }

  /** Per-node duplicate-cluster weights — the SOFT dedup verdict
    * (Semdedup-adjacent "SoftDeDup": instead of dropping near-duplicates,
    * downweight each copy by its cluster size so the cluster contributes
    * ~one document of training mass; repetition hurts, but hard deletion
    * loses the best copy's signal too). Output: (node, component,
    * cluster_size, weight = 1/cluster_size) for every node in `edges`;
    * edge-free docs are implicitly weight 1 (left-join + coalesce at the
    * call site).
    *
    * Scale shape: the star contraction's bounded rounds plus ONE
    * component-keyed count aggregate (map-side partials) and ONE
    * component-keyed rejoin — (long, long) exchanges only. */
  def clusterWeights(edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 25, checkpointDir: Option[String] = None): DataFrame = {
    val comps = connectedComponents(edges, srcCol, dstCol, maxRounds, checkpointDir)
    val sizes = comps.groupBy(col("component"))
      .agg(count(lit(1)).as("cluster_size"))
    comps.join(sizes, "component")
      .select(col("node"), col("component"), col("cluster_size"),
        (lit(1.0) / col("cluster_size")).as("weight"))
  }

  /** Large-star: every node u relinks its LARGER neighbors to
    * m = min(N(u) + u). Each input edge is processed from its smaller
    * endpoint's side, so the output row count never exceeds the doubled
    * input's, and every output edge (v, m) keeps v > m (canonical).
    *
    * Shape: ONE exchange (the per-u window min) — the groupBy+join
    * formulation costs two — and NO distinct: duplicate edges don't
    * perturb a min, [[smallStar]]'s round-ending distinct dedups, and the
    * intra-round multiplicity is bounded (each input edge contributes at
    * most one row here), so the extra shuffle round-trip buys nothing. */
  private def largeStar(e: DataFrame): DataFrame = {
    val wu = org.apache.spark.sql.expressions.Window.partitionBy(col("u"))
    e.select(explode(array(
        struct(col("u"), col("v")),
        struct(col("v").as("u"), col("u").as("v")))).as("p"))
      .select(col("p.u").as("u"), col("p.v").as("v"))
      .withColumn("m", least(min(col("v")).over(wu), col("u")))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
  }

  /** Small-star: every node u relinks its smaller neighbors (and itself)
    * to m = min of those neighbors. Operates on the canonical orientation
    * directly — no doubling — and keeps it.
    *
    * Same single-exchange window shape; the explode emits both the
    * relinked (v, m) edge and the root-preserving (u, m) edge in one pass
    * (a union would recompute the window per branch). The (v, m) self-loop
    * at v == m drops in the filter; (u, m) can't self-loop since
    * m <= v < u. The round's ONE distinct lives here. */
  private def smallStar(e: DataFrame): DataFrame = {
    val wu = org.apache.spark.sql.expressions.Window.partitionBy(col("u"))
    e.withColumn("m", min(col("v")).over(wu))
      .select(explode(array(
        struct(col("v").as("u"), col("m").as("v")),
        struct(col("u"), col("m").as("v")))).as("p"))
      .select(col("p.u").as("u"), col("p.v").as("v"))
      .filter(col("u") =!= col("v"))
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
