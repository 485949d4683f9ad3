package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import scala.util.hashing.MurmurHash3

/** Count-Min sketch as a typed Aggregator — the point-frequency
  * companion to [[HeavyHitters]]' Misra–Gries top-set: `rows × width`
  * counters answer "how often did THIS key occur" for any key in
  * bounded memory, with the classic one-sided guarantee
  * `exact ≤ estimate` and expected excess ≤ n/width per row (the min
  * over rows is what's reported).
  *
  * Unlike Misra–Gries — whose sparse-capacity survivors are
  * merge-order-dependent — the CM merge is ELEMENTWISE ADDITION:
  * associative, commutative, and therefore bit-deterministic under any
  * partitioning or reduce order. Every estimate is reproducible, which
  * is what lets q123 pin sketch-contract booleans under the driver
  * hash.
  *
  * Scale shape: ONE two-phase aggregate; each map partition ships
  * exactly `rows·width` longs regardless of cardinality. Hashing is
  * MurmurHash3 over (seed + row, item) — JVM-stable, cheap, and
  * replayable driver-side for [[estimate]]. */
object CountMin {

  final case class Sketch(rows: Int, width: Int, n: Long, counts: Array[Long]) {
    def estimate(item: String): Long =
      (0 until rows).map { r =>
        counts(r * width + CountMin.cell(item, r, width))
      }.min
  }

  private[operators] def cell(item: String, row: Int, width: Int): Int = {
    val h = MurmurHash3.stringHash(item, 0x9747b28c + row)
    math.floorMod(h, width)
  }

  final class CountMinAgg(rows: Int, width: Int)
      extends Aggregator[String, Sketch, Sketch] {
    require(rows >= 1, s"rows must be >= 1, got $rows")
    require(width >= 1, s"width must be >= 1, got $width")

    override def zero: Sketch = Sketch(rows, width, 0L, new Array[Long](rows * width))

    override def reduce(s: Sketch, item: String): Sketch = {
      var r = 0
      while (r < rows) {
        s.counts(r * width + cell(item, r, width)) += 1
        r += 1
      }
      s.copy(n = s.n + 1)
    }

    override def merge(a: Sketch, b: Sketch): Sketch = {
      var i = 0
      while (i < a.counts.length) { a.counts(i) += b.counts(i); i += 1 }
      a.copy(n = a.n + b.n)
    }

    override def finish(s: Sketch): Sketch = s
    override def bufferEncoder: Encoder[Sketch] = Encoders.product[Sketch]
    override def outputEncoder: Encoder[Sketch] = Encoders.product[Sketch]
  }

  /** Sketch `itemCol` of `df` (nulls excluded, like COUNT(col)). */
  def sketch(df: DataFrame, itemCol: String, rows: Int = 4,
      width: Int = 1024): Sketch = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(itemCol).cast("string")).filter(col(itemCol).isNotNull)
      .as[String]
      .select(new CountMinAgg(rows, width).toColumn.name("sk"))
      .head()
  }
}
