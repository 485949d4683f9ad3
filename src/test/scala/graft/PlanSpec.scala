package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan shape assertions: the optimizations we rely on at scale
  * must actually appear in the executed plan, not just in intent.
  * Guards against regressions that stay correct but stop scaling. */
class PlanSpec extends SparkSpec {

  private def planString(df: DataFrame): String = {
    df.collect() // materialize so AQE finalizes the plan
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    unwrap(df.queryExecution.executedPlan).toString
  }

  private def run(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sfDir)

  test("q2: filter and projection are pushed to the parquet scan") {
    val plan = run("q2_filter_project").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"), plan.take(2000))
    // pruned read schema: only the 6 referenced columns, not all 11
    assert(!plan.contains("l_returnflag"), "unused columns pruned from scan")
  }

  test("q3: dimension joins are broadcast, no shuffle join") {
    val plan = planString(run("q3_join_agg"))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), "dims must not sort-merge")
  }

  test("q8: global top-k plans as TakeOrderedAndProject (no full sort)") {
    val plan = run("q8_topk").queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("q1: aggregation is partial (map-side) before the shuffle") {
    val plan = planString(run("q1_agg"))
    // two HashAggregate stages around the exchange = partial + final
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(2000))
  }

  test("q28: query side of brute-force knn is broadcast") {
    val plan = planString(run("q28_knn_brute"))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      plan.take(2000))
  }

  test("q29 hot path uses the codegen cosine expression inside WSCG") {
    val df = run("q29_embedding_neardup")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("cosine_sim"), optimized.take(2000))
    // and the executed plan has whole-stage codegen spans ("*(n)" markers)
    assert(planString(df).contains("*("), "codegen spans present")
  }

  test("whole-stage codegen covers the scan->filter->project spine of q2") {
    // "*(n)" prefixes mark WholeStageCodegen spans in the simple plan string
    assert(planString(run("q2_filter_project")).contains("*("))
  }

  test("date-partitioned layout prunes partitions at the scan (W2/K7)") {
    import graft.core.Tables
    val dir = java.nio.file.Files.createTempDirectory("pruned").toString
    graft.sinks.Sinks.writeDatePartitioned(
      Tables.events(spark, sfDir), dir, "ts")
    val oneDay = spark.read.parquet(dir)
      .filter(org.apache.spark.sql.functions.col("event_date") === "2024-01-03")
    val plan = oneDay.queryExecution.executedPlan.toString
    // the filter must become a PartitionFilters entry on the file scan —
    // file-level pruning, not a post-scan filter over all partitions
    assert(plan.contains("PartitionFilters: [isnotnull(event_date"), plan.take(2000))
    val scannedParts = oneDay.select("event_date").distinct().count()
    assert(scannedParts <= 1)
  }

  private def hashPartitionings(plan: String): List[String] =
    "hashpartitioning\\([^)]*\\)".r.findAllIn(plan).toList

  test("lshCosineTopK: no exchange is keyed on embedding arrays, ids only") {
    import graft.core.Tables
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sfDir)
    val df = graft.operators.Similarity.lshCosineTopK(
      emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding",
      k = 5, nPlanes = 4, nTables = 8)
    val parts = hashPartitionings(planString(df))
    assert(parts.nonEmpty, "expected shuffles for dedup/window stages")
    parts.foreach { p =>
      assert(!p.contains("qv#") && !p.contains("cv#") && !p.contains("embedding#"),
        s"vector column used as a partitioning key: $p")
    }
  }

  test("contamination: benchmark shingle side broadcasts — corpus side never shuffles for the join") {
    import org.apache.spark.sql.functions.col
    val corpus = graft.core.Tables.documents(spark, sfDir)
    // a real corpus document as the benchmark: guaranteed hits, so AQE
    // cannot collapse the plan to EmptyRelation
    val bench = corpus.limit(1)
      .select((col("doc_id") + 900000L).as("doc_id"), col("text"))
    val df = graft.operators.Contamination.ngramContainment(
      corpus, bench, "doc_id", "text", n = 3, minContainment = 0.5)
    val plan = planString(df)
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    // the only hash exchanges are the containment-count aggregations, which
    // are keyed on ids — the corpus shingle stream joins map-side
    hashPartitionings(plan).foreach { p =>
      assert(!p.contains("shingle#"), s"corpus shuffled on the shingle key: $p")
    }
  }

  test("exactDedupNarrow: winner agg shuffles digest+id; corpus side joins without shuffle") {
    import graft.core.Tables
    val docs = Tables.documents(spark, sfDir)
    val df = graft.operators.Dedup.exactDedupNarrow(docs, "doc_id", "text")
    val plan = planString(df)
    // at this scale AQE broadcasts the winner set: the corpus rows reach the
    // semi-join without an exchange, so the only shuffled rows are the
    // 24-byte (digest, id) pairs of the winner aggregate
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      plan.take(2000))
    hashPartitionings(plan).foreach { p =>
      assert(!p.contains("text#"), s"document text shuffled: $p")
    }
  }

  test("repetition signals are a narrow map: no exchange before presentation") {
    import graft.core.Tables
    import org.apache.spark.sql.functions.{col, element_at}
    import graft.functions.TextFunctions.tokens
    import graft.functions.expressions.ShingleHashes.gram_hashes
    import graft.functions.expressions.SketchExpressions.multiplicity_stats
    val op = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        multiplicity_stats(gram_hashes(tokens(col("text")), 2)).as("ms"))
      .filter(element_at(col("ms"), 1) > 0)
    val plan = op.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
    assert(plan.contains("multiplicity_stats"), plan.take(2000))
    assert(plan.contains("*("), "kernel stays inside whole-stage codegen")
  }

  test("IVF nearest-centroid assignment is a narrow codegen map, no exchange") {
    import graft.core.Tables
    val emb = Tables.embeddings(spark, sfDir)
    val cents = graft.operators.IvfIndex.train(emb, "vec_id", "embedding",
      nLists = 4, iters = 1)
    val assigned = graft.operators.IvfIndex.assign(emb, "vec_id", "embedding", cents)
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
    assert(plan.contains("nearest_centroid"), plan.take(2000))
    assert(plan.contains("*("), "assignment stays inside whole-stage codegen")
  }

  test("scrubbing is a pure map over the scan: no exchange, inside WSCG") {
    import graft.core.Tables
    val op = graft.operators.Scrub.scrub(
      Tables.events(spark, sfDir).select("event_id", "props"), "props")
    val plan = op.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
    assert(plan.contains("*("), "regexp fold stays inside whole-stage codegen")
  }

  test("quantization is a narrow map: no exchange before presentation") {
    import graft.core.Tables
    val op = graft.operators.Quantize.int8Stats(
      Tables.embeddings(spark, sfDir), "vec_id", "embedding")
    val plan = op.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
  }

  test("k-means L2 assignment is a narrow codegen map, no exchange") {
    import graft.core.Tables
    val emb = Tables.embeddings(spark, sfDir)
    val model = graft.operators.KMeans.fit(emb, "vec_id", "embedding",
      k = 4, iters = 1)
    val labeled = graft.operators.KMeans.assign(emb, "embedding", model)
    val plan = labeled.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
    assert(plan.contains("nearest_centroid_l2"), plan.take(2000))
    assert(plan.contains("*("), "assignment stays inside whole-stage codegen")
  }

  test("text normalization is a pure map inside WSCG, no exchange") {
    import graft.core.Tables
    import org.apache.spark.sql.functions.col
    val op = Tables.documents(spark, sfDir).select(col("doc_id"),
      graft.functions.TextFunctions.normalizeText(col("text")).as("norm"))
    val plan = op.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
    assert(plan.contains("nfc_normalize"), plan.take(2000))
    assert(plan.contains("*("), "normalization stays inside whole-stage codegen")
  }

  test("topFractionByScore: the stats join broadcasts — the corpus never exchanges on the bare stratum") {
    import graft.core.Tables
    import org.apache.spark.sql.functions.col
    val scored = Tables.documents(spark, sfDir).select(col("doc_id"),
      col("lang"), col("n_chars").cast("double").as("score"))
    val kept = graft.operators.Sampling.topFractionByScore(
      scored, "doc_id", "score", "lang", 0.25)
    val plan = planString(kept)
    // the one-row-per-stratum stats frame must be on the broadcast side:
    // a SortMergeJoin keyed on the stratum alone would exchange the full
    // corpus into |strata| partitions
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    val smjKeyedOnStratumOnly =
      """SortMergeJoin \[lang#\d+\]""".r.findFirstIn(plan)
    assert(smjKeyedOnStratumOnly.isEmpty,
      "no sort-merge join keyed on the bare stratum column")
  }

  test("component rounds exchange id pairs only, never payload columns") {
    import spark.implicits._
    // edges carrying a fat payload column: the contraction must not drag it
    // through any exchange (only u/v ids are selected before the shuffles)
    val edges = Seq((1L, 2L, "x" * 1000), (2L, 3L, "y" * 1000))
      .toDF("a", "b", "payload")
    val labels = graft.operators.Components.connectedComponents(edges, "a", "b")
    val plan = labels.queryExecution.executedPlan.toString
    assert(!plan.contains("payload"), "payload column pruned before the contraction")
    assert(labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("overlap join is an equi-join on (key, bin), never a nested loop") {
    val plan = planString(run("q134_overlap_join"))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "interval overlap must bin to an equi-join:\n" + plan.take(2000))
  }

  test("merge apply is exactly one join; compaction windows the delta only") {
    val plan = planString(run("q133_merge_apply"))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(2000))
    // one outer join of base vs compacted delta — a second join would mean
    // the changeset is being re-derived against base per branch
    val joins = "MergeJoin|HashJoin".r.findAllIn(plan).size
    assert(joins === 1, s"expected exactly 1 join, saw $joins:\n" + plan.take(3000))
  }

  test("skyline joins the tiny frontier back via broadcast, no quadratic join") {
    val plan = planString(run("q135_skyline"))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "skyline must never plan the NOT-EXISTS quadratic shape")
  }

  test("paretoClass: full-data windows are cell-partitioned, never one global sort") {
    val plan = planString(run("q146_abc_parts"))
    // the corpus-wide prefix sum must ride a window PARTITIONED BY the
    // value cell — a windowspec with no partition over the data would be
    // the one-task global sort the operator exists to avoid
    assert(plan.contains("windowspecdefinition(__bin"),
      "expected the in-cell prefix window keyed on __bin:\n" + plan.take(2000))
    // the only single-partition stage allowed is the <=bins cell-totals
    // cumulative (parameter-bounded), fed from an aggregate
    val singles = "Exchange SinglePartition".r.findAllIn(plan).size
    assert(singles <= 1, s"expected at most the bounded cells pass, saw $singles:\n" +
      plan.take(3000))
  }

  test("late-orders EXISTS decorrelates to one semi join, never a nested loop") {
    val plan = planString(run("q157_late_orders"))
    assert(plan.contains("LeftSemi"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "the date residual must ride the equi-join, not force a nested loop")
  }

  test("returned-revenue top-20 plans TakeOrdered with a broadcast customer dim") {
    val plan = planString(run("q158_returned_revenue"))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"), "customer dim must broadcast")
  }

  test("triangle wedge stage exchanges on ids only; count variant skips the explode") {
    import org.apache.spark.sql.functions.col
    val l = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
    val edges = l.as("a").join(l.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey")
          && col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
    val counts = graft.operators.GraphOps.triangleCounts(edges, "src", "dst")
    val parts = hashPartitionings(planString(counts))
    assert(parts.nonEmpty, "expected shuffles for degree/wedge stages")
    // the (long,long)-only exchange claim: no shuffle keys on the carried
    // (deg, id) ordering struct — ids and degree longs only
    parts.foreach(p => assert(!p.contains("dst_ord#") && !p.contains("o1#")
      && !p.contains("o2#"), s"ordering struct used as a partitioning key: $p"))
    // the count-only variant must NOT generate the per-corner explode
    val total = graft.operators.GraphOps.triangleCount(edges, "src", "dst")
    val totalPlan = planString(total)
    assert(!totalPlan.contains("Generate"),
      "triangleCount must skip the per-corner explode:\n" + totalPlan.take(2000))
    assert(planString(counts).contains("Generate"),
      "triangleCounts keeps the per-corner explode by design")
    // and the two variants must agree on the global total
    import spark.implicits._
    val viaCorners = counts.agg(
      org.apache.spark.sql.functions.sum($"triangles")).as[Long].head() / 3
    assert(total.as[Long].head() === viaCorners)
  }

  test("Q3 shape: broadcast segment dim + TakeOrdered top-10, no full sort") {
    val plan = planString(run("q171_ship_priority"))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"), "customer dim must broadcast")
  }

  test("Q19 shape: the disjunctive residual rides the hash join, no nested loop") {
    val plan = planString(run("q180_disjunctive_revenue"))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "the OR-of-disjuncts must stay a residual on the partkey equi-join:\n" +
        plan.take(2000))
  }

  test("Q6 shape: every predicate reaches the lineitem scan") {
    val plan = run("q172_forecast_revenue").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"), plan.take(2000))
    // the date range pushes too (Spark truncates the PushedFilters field
    // mid-token, so match the truncation-safe prefix)
    assert(plan.contains("GreaterThanOrEqual(l_shipda"), plan.take(2000))
    assert(plan.contains("IsNotNull(l_discount") &&
      plan.contains("IsNotNull(l_quantity"), plan.take(2000))
  }

  test("resample reduces cells BEFORE the grid explode: aggregate precedes generate") {
    val plan = planString(run("q126_resample_locf"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "gap fill must not cross-join a calendar:\n" + plan.take(2000))
    assert(plan.contains("Generate"), "per-key sequence explode expected")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "in-cell reduction must be a partial+final aggregate")
  }

  test("drift gate: two partial+final count aggregates, bounded joins broadcast, no sort-merge") {
    val plan = planString(run("q192_drift_gate"))
    assert(!plan.contains("SortMergeJoin"),
      "the nBins-row joins must broadcast:\n" + plan.take(2000))
    assert("HashAggregate".r.findAllIn(plan).size >= 4,
      "each side's bin count must be a two-phase (map-side combined) aggregate")
  }

  test("categorical drift: head set TakeOrdered, keep join broadcast, aggregates precede joins") {
    val plan = planString(run("q197_cat_drift"))
    // the top-maxCategories head set is a TakeOrdered (per-partition
    // heaps), never a full global sort of the category frame
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    // the ≤maxCategories head set joins back via broadcast
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    // the FULL OUTER merge of the two count frames legitimately
    // sort-merges (Spark has no broadcast full-outer) — but only over
    // the per-category AGGREGATES: both inputs must be two-phase
    // count aggregates, so no corpus-sized row ever reaches a sort
    assert("HashAggregate".r.findAllIn(plan).size >= 4,
      "category counts must be two-phase aggregates before any join or sort")
  }

  test("sessions bridge: windows and the session aggregate share one user exchange") {
    val plan = planString(run("q184_sessions_bridge"))
    val exchanges = "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size
    assert(exchanges === 1,
      s"gaps-and-islands must reuse ONE user_id exchange, found $exchanges:\n" +
        plan.take(2000))
  }

  test("PQ ADC scan: query tables ride a broadcast; the only hash exchange keys on query_id") {
    val plan = planString(run("q191_pq_topk"))
    // the bounded query side broadcasts (an intentional nested-loop over
    // the tiny probe set); the corpus codes must never sort-merge
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), "codes side must not shuffle for the join")
    // the per-query top-k window is the single hash exchange
    assert(plan.contains("hashpartitioning(query_id"), plan.take(2000))
  }

  test("Q16 shape: single-column distinct agg plans two-level, dims broadcast, no Expand") {
    val plan = planString(run("q186_supplier_parts"))
    // one distinct column needs no Expand (the multi-distinct rewrite's
    // row multiplier); the partial level keys on (group cols, suppkey)
    assert(!plan.contains("Expand"),
      "single count(DISTINCT) must not plan an Expand:\n" + plan.take(2000))
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "distinct agg must be the two-level partial+final plan")
    assert(plan.contains("BroadcastHashJoin"), "part dim + supplier anti must broadcast")
    assert(!plan.contains("SortMergeJoin"), "no shuffle join on the fact side")
  }
}
