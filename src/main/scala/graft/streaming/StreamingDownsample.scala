package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, MapState,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming twin of [[graft.operators.Downsample.lttb]]: per key, emit
  * ONE representative point per time bucket — chosen by the same exact
  * integer largest-triangle criterion — as an append-only stream, once
  * the bucket can no longer change.
  *
  * Finality: bucket b's selection reads its own points plus the
  * neighbor buckets' sums, so b emits when the watermark passes the END
  * of bucket b+1 (i.e. wm ≥ (b+2)·W): from then on the event-time mode
  * drops any input that could still land in b or b+1, making both
  * final. Each input row arms an event-time timer at its bucket's
  * emission horizon; a fired timer emits EVERY ready bucket (ascending)
  * and cleanup makes re-fires no-ops, so duplicate or stale timers are
  * harmless.
  *
  * Neighbor contract (the one streaming difference from the batch
  * operator, documented here and pinned by the spec): neighbors are the
  * INDEX-adjacent buckets b±1 — an empty neighbor counts as absent, so
  * a bucket behind a gap applies the earliest-point edge rule. The
  * batch form skips gaps to the nearest NON-EMPTY bucket, which a
  * stream cannot do without unbounded retention (the "next non-empty
  * bucket" may be arbitrarily far in the future). On gapless series the
  * two contracts coincide and streamed output ≡ the batch frame
  * row-for-row (spec-pinned).
  *
  * Edge rules (same precedence as batch): no left neighbor → earliest
  * point (x, y ascending), else no right neighbor → latest, else argmax
  * of the scaled triangle area with ties on (x, y) ascending. The
  * key's LAST bucket only emits once the watermark passes a further
  * full bucket — the standard append-mode tail caveat.
  *
  * State per key: the open buckets' points (a list rebuilt on
  * emission) and per-bucket sums (a map); sums older than the emission
  * frontier are deleted, points are deleted at emission, so retained
  * state is bounded by the watermark lag — points only ever span the
  * last ~2 buckets plus disorder. Arithmetic is BigInt on the executor,
  * bit-identical to the batch decimal(38,0) expansion. Requires the
  * RocksDB state store provider (transformWithState constraint). */
object StreamingDownsample {

  final case class DsEvent(key: String, ts: java.sql.Timestamp, v: Double)
  final case class DsPt(b: Long, x: Long, y: Long)
  final case class BSum(n: Long, sx: Long, sy: Long)
  final case class DsSample(key: String, bucket: Long, x_millis: Long,
      y_units: Long, n_points: Long)

  private[streaming] class DownsampleProcessor(widthMs: Long,
      quantScale: Int = 6)
      extends StatefulProcessor[String, DsEvent, DsSample] {

    // same double-multiply-then-floor the batch operator's
    // floor(value * pow(10, quantScale)) evaluates to — Math.pow on both
    // sides, so y quantization is bit-identical batch vs stream
    private val quantMul: Double = math.pow(10.0, quantScale)

    @transient private var pts: ListState[DsPt] = _
    @transient private var sums: MapState[Long, BSum] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      pts = getHandle.getListState[DsPt]("pts",
        Encoders.product[DsPt], TTLConfig.NONE)
      sums = getHandle.getMapState[Long, BSum]("sums",
        Encoders.scalaLong, Encoders.product[BSum], TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[DsEvent],
        timerValues: TimerValues): Iterator[DsSample] = {
      var horizons = Set.empty[Long]
      rows.foreach { e =>
        val x = e.ts.getTime
        val y = math.floor(e.v * quantMul).toLong
        val b = Math.floorDiv(x, widthMs)
        pts.appendValue(DsPt(b, x, y))
        val s = if (sums.containsKey(b)) sums.getValue(b) else BSum(0L, 0L, 0L)
        sums.updateValue(b, BSum(s.n + 1, s.sx + x, s.sy + y))
        // emission horizon for bucket b: watermark past the end of b+1
        horizons += (b + 2) * widthMs
      }
      // register each horizon once (an already-armed timer is a no-op
      // re-fire anyway, but re-registering it WARN-spams the log)
      val armed = getHandle.listTimers().toSet
      (horizons -- armed).foreach(getHandle.registerTimer)
      Iterator.empty
    }

    /** Exact selection — the batch operator's six-product expansion. */
    private def select(own: Seq[DsPt], left: Option[BSum],
        right: Option[BSum]): (Long, Long) = {
      val sorted = own.map(p => (p.x, p.y)).sorted
      (left, right) match {
        case (None, _) => sorted.head
        case (_, None) => sorted.last
        case (Some(l), Some(r)) =>
          own.map { p =>
            val e = (BigInt(l.sx) * r.n * p.y - BigInt(l.sx) * r.sy +
              BigInt(p.x) * l.n * r.sy - BigInt(p.x) * r.n * l.sy +
              BigInt(r.sx) * l.sy - BigInt(r.sx) * l.n * p.y).abs
            (e, p.x, p.y)
          }.sortBy { case (e, x, y) => (-e, x, y) }
            .headOption.map { case (_, x, y) => (x, y) }.get
      }
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[DsSample] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      val all = pts.get().toSeq
      val byBucket = all.groupBy(_.b)
      val ready = byBucket.keys.filter(b => (b + 2) * widthMs <= wm)
        .toSeq.sorted
      if (ready.isEmpty) Iterator.empty
      else {
        val out = ready.map { b =>
          val left = if (sums.containsKey(b - 1)) Some(sums.getValue(b - 1))
            else None
          val right = if (sums.containsKey(b + 1)) Some(sums.getValue(b + 1))
            else None
          val n = sums.getValue(b).n
          val (x, y) = select(byBucket(b), left, right)
          DsSample(key, b, x, y, n)
        }
        // cleanup: emitted points go; sums strictly older than the newest
        // emitted bucket go too (only b's own sums serve b+1's emission)
        val keep = all.filterNot(p => ready.contains(p.b))
        if (keep.isEmpty) pts.clear() else pts.put(keep.toArray)
        val frontier = ready.max
        // materialize before mutating — removing under a live RocksDB
        // iterator is undefined
        sums.keys().toSeq.filter(_ < frontier).foreach(sums.removeKey)
        out.iterator
      }
    }
  }

  /** Append-mode stream of per-bucket representatives; `delay` bounds
    * disorder exactly as in every other event-time job here.
    * `quantScale` mirrors the batch parameter (y = floor(v·10^scale)) so
    * a caller running the batch operator at a non-default scale gets a
    * matching streaming twin. */
  def downsampled(events: Dataset[DsEvent], widthMs: Long,
      delay: String, quantScale: Int = 6): Dataset[DsSample] = {
    require(widthMs > 0, s"widthMs must be positive, got $widthMs")
    require(quantScale >= 0 && quantScale <= 9,
      s"quantScale must be in [0, 9], got $quantScale")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", delay)
      .groupByKey(_.key)
      .transformWithState(new DownsampleProcessor(widthMs, quantScale),
        TimeMode.EventTime(), OutputMode.Append(),
        Encoders.product[DsSample])
  }

  /** Streaming M4 ([[graft.operators.Downsample.m4]]'s twin) — and the
    * contrast case to [[downsampled]]: M4 needs NO neighbor context, so
    * no custom state processor is warranted. It is exactly a watermarked
    * tumbling-window aggregation — `window(ts, width)` + struct min/max
    * — and Structured Streaming's own window-close semantics emit each
    * bucket once in append mode. Declarative-first: the engine's
    * documented preference order says built-in windows beat
    * transformWithState whenever the semantics fit, and here they fit
    * exactly (same deterministic tie contract via struct ordering; the
    * quantization mirrors the batch operator so streamed rows equal the
    * batch frame row-for-row — spec-pinned). */
  def m4Windows(events: Dataset[DsEvent], widthMs: Long,
      delay: String, quantScale: Int = 6): org.apache.spark.sql.DataFrame = {
    require(widthMs > 0, s"widthMs must be positive, got $widthMs")
    require(quantScale >= 0 && quantScale <= 9,
      s"quantScale must be in [0, 9], got $quantScale")
    import org.apache.spark.sql.functions._
    events.toDF()
      .withWatermark("ts", delay)
      .select(col("key"),
        col("ts"),
        call_function("div",
          unix_micros(col("ts")) - pmod(unix_micros(col("ts")), lit(1000L)),
          lit(1000L)).as("__x"),
        floor(col("v") * pow(lit(10.0), lit(quantScale))).cast("long")
          .as("__y"))
      .groupBy(col("key"),
        window(col("ts"), s"$widthMs milliseconds"))
      .agg(count(lit(1)).as("n_points"),
        min(struct(col("__x"), col("__y"))).as("__first"),
        max(struct(col("__x"), col("__y"))).as("__last"),
        min(struct(col("__y"), col("__x"))).as("__min"),
        max(struct(col("__y"), col("__x"))).as("__max"))
      .select(col("key"),
        expr(s"unix_millis(window.start) DIV ${widthMs}L").as("bucket"),
        col("__first.__x").as("x_first"), col("__first.__y").as("y_first"),
        col("__last.__x").as("x_last"), col("__last.__y").as("y_last"),
        col("__min.__x").as("x_min"), col("__min.__y").as("y_min"),
        col("__max.__x").as("x_max"), col("__max.__y").as("y_max"),
        col("n_points"))
  }
}
