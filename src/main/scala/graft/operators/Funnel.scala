package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-sequence funnel analysis: for each user, the earliest event
  * of stage 1, then the earliest stage-2 event STRICTLY AFTER it, and so
  * on — "viewed, then clicked, then purchased, in that order" — the
  * core product-analytics query over an event stream (the reference's
  * own domain).
  *
  * Scale shape: ONE groupBy(user) shuffle. Each user's events gather
  * into a sorted array and a single left-to-right fold runs the stage
  * state machine row-locally — no per-stage self-joins (the naive form
  * is one join per stage, each reshuffling the full event table; this
  * is one shuffle total, then pure map). Per-user event history is the
  * partition unit; a bot user with millions of events is ordinary key
  * skew (cap or salt upstream — see Skew.keyHistogram).
  *
  * Semantics (what the q98 oracle pins with an independent per-stage
  * min-join formulation): stage times are strictly increasing; an event
  * can only fill stage i if stage i−1 was filled by an EARLIER event
  * (the fold applies pre-event state, so one event never fills two
  * stages); users who never reach stage 1 still appear, all-null. Ties
  * inside one (user, ts, type) group are irrelevant: the fold fills
  * from the sorted earliest, and equal timestamps cannot advance two
  * stages anyway. */
object Funnel {

  /** One row per distinct user: `t_1 … t_n` (µs-precision timestamps,
    * null = stage not reached). */
  def funnelTimes(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "at least one stage required")
    require(stages.distinct.size == stages.size,
      s"stages must be distinct, got $stages")
    val n = stages.size
    val stageArr = array(stages.map(lit): _*)

    // fold state: array<long> of stage fill times in µs, -1 = unfilled
    // (a sentinel keeps the HOF lambda null-free and codegen-simple)
    val init = array(Seq.fill(n)(lit(-1L)): _*)
    val folded = events
      .select(col(userCol).as("__u"),
        TimeSeriesOps.eventMicros(col(tsCol)).as("__t"), col(typeCol).as("__e"))
      .groupBy(col("__u"))
      .agg(sort_array(collect_list(struct(col("__t"), col("__e")))).as("__evs"))
      .withColumn("__times",
        aggregate(col("__evs"), init, (st, ev) =>
          zip_with(st, sequence(lit(0), lit(n - 1)), (t, i) =>
            when(t =!= -1L, t)
              .when(
                get(stageArr, i.cast("int")) === ev.getField("__e") &&
                  (i === 0 || (get(st, (i - 1).cast("int")) =!= -1L &&
                    ev.getField("__t") > get(st, (i - 1).cast("int")))),
                ev.getField("__t"))
              .otherwise(lit(-1L)))))
    val stageCols = (0 until n).map { i =>
      val t = element_at(col("__times"), i + 1)
      when(t =!= -1L, timestamp_micros(t)).as(s"t_${i + 1}")
    }
    folded.select((col("__u").as(userCol) +: stageCols): _*)
  }
}
