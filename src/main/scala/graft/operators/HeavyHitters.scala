package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries frequent-items summary as a typed Aggregator — the
  * bounded-memory answer to "what are the heavy terms/domains/keys in
  * 100 TB" when exact term counting (q47's shape) would materialize an
  * unbounded distinct-key aggregate. The summary holds at most
  * `capacity` counters PER PARTIAL regardless of cardinality, merges
  * associatively map-side like any partial aggregate, and carries the
  * classic guarantees:
  *
  *   - every item with true count > n/(capacity+1) is present;
  *   - each reported estimate undercounts by at most the summary's
  *     total decrement (≤ n/(capacity+1)).
  *
  * Exactness escape hatch (the q70/q69 oracle trick, reused by q105):
  * with capacity ≥ the true distinct count the decrement path never
  * fires and the summary IS the exact count table — a relationally
  * checkable configuration that pins insert/merge/finish end to end;
  * HeavyHittersSpec then bounds the sparse-capacity behavior the
  * oracle can't replay.
  *
  * Scale shape: ONE two-phase aggregate; the shuffle carries at most
  * `capacity` (term, count) pairs per map partition. Determinism note:
  * which NON-guaranteed items survive a sparse-capacity summary is
  * merge-order-dependent (inherent to MG on a distributed reduce), so
  * production callers read it as "candidates + lower bounds" — the
  * guaranteed heavies are always there. */
object HeavyHitters {

  final case class Summary(counts: Map[String, Long])

  /** One weighted MG insert — the batched step (Agarwal et al.'s
    * mergeable-summaries form). Object-level so both the distributed
    * Aggregator and the streaming driver-side state fold
    * ([[graft.streaming.StreamingJobs.heavyHittersOnArrival]]) run the
    * SAME arithmetic. */
  private[graft] def addCount(m: Map[String, Long], item: String, by: Long,
      capacity: Int): Map[String, Long] =
    m.get(item) match {
      case Some(c) => m.updated(item, c + by)
      case None if m.size < capacity => m.updated(item, by)
      case None =>
        // decrement-all by the smallest of (by, min counter)
        val dec = math.min(by, m.values.min)
        val kept = m.flatMap { case (k, c) =>
          val c2 = c - dec; if (c2 > 0) Some(k -> c2) else None
        }
        val rest = by - dec
        if (rest > 0) kept.updated(item, rest) else kept
    }

  /** Merge two summaries at `capacity` (≤ 2·capacity driver-side entries —
    * parameter-bounded). Keeps the mergeable-summaries error bound: total
    * undercount ≤ n/(capacity+1) over the union of inputs. */
  private[graft] def mergeCounts(a: Map[String, Long], b: Map[String, Long],
      capacity: Int): Map[String, Long] =
    b.foldLeft(a) { case (m, (k, c)) => addCount(m, k, c, capacity) }

  final class MisraGries(capacity: Int)
      extends Aggregator[String, Summary, Map[String, Long]] {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")

    override def zero: Summary = Summary(Map.empty)

    private def add(s: Summary, item: String, by: Long): Summary =
      Summary(addCount(s.counts, item, by, capacity))

    override def reduce(s: Summary, item: String): Summary = add(s, item, 1L)

    override def merge(a: Summary, b: Summary): Summary =
      Summary(mergeCounts(a.counts, b.counts, capacity))

    override def finish(s: Summary): Map[String, Long] = s.counts
    override def bufferEncoder: Encoder[Summary] = Encoders.product[Summary]
    override def outputEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
  }

  /** The summary of `itemCol` as a (item, est_count) frame, heaviest
    * first (count desc, item asc). */
  def summarize(df: DataFrame, itemCol: String, capacity: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val items = df.select(col(itemCol).cast("string")).as[String]
    val m = items.select(
      new MisraGries(capacity).toColumn.name("m")).head()
    m.toSeq.toDF("item", "est_count")
      .orderBy(col("est_count").desc, col("item"))
  }
}
