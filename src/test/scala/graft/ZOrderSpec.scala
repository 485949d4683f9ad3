package graft

import org.apache.spark.sql.functions._
import graft.sinks.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleaveBits matches hand-computed Morton keys") {
    val df = Seq((3L, 1L), (2L, 3L), (0L, 0L), (3L, 3L)).toDF("x", "y")
    val keys = df.select(
        ZOrder.interleaveBits(Seq($"x", $"y"), bits = 2).as("k"))
      .as[Long].collect().toSeq
    // little-endian: bit j of col c lands at j*2 + c
    // (3,1): x->bits 0,2 ; y bit0->1        = 0b0111 = 7
    // (2,3): x bit1->2   ; y->bits 1,3      = 0b1110 = 14
    // (3,3): all four                       = 0b1111 = 15
    assert(keys === Seq(7L, 14L, 0L, 15L))
  }

  test("single-column interleave is the identity; 3-column lanes stay disjoint") {
    val one = Seq(5L).toDF("x")
      .select(ZOrder.interleaveBits(Seq($"x"), bits = 4).as("k"))
      .as[Long].head()
    assert(one === 5L)
    // (1, 1, 1) at 3 cols: bit 0 of each lane -> bits 0, 1, 2
    val three = Seq((1L, 1L, 1L)).toDF("a", "b", "c")
      .select(ZOrder.interleaveBits(Seq($"a", $"b", $"c"), bits = 2).as("k"))
      .as[Long].head()
    assert(three === 7L)
  }

  test("out-of-range and null values fail loudly; bad configs rejected") {
    val e = intercept[Exception] {
      Seq((4L, 0L)).toDF("x", "y")
        .select(ZOrder.interleaveBits(Seq($"x", $"y"), bits = 2)).collect()
    }
    assert(e.getMessage.contains("interleaveBits") ||
      e.getCause != null && e.getCause.getMessage.contains("interleaveBits"))
    val n = intercept[Exception] {
      Seq((Option.empty[Long], 0L)).toDF("x", "y")
        .select(ZOrder.interleaveBits(Seq($"x", $"y"), bits = 2)).collect()
    }
    assert(n.getMessage.contains("interleaveBits") ||
      n.getCause != null && n.getCause.getMessage.contains("interleaveBits"))
    intercept[IllegalArgumentException] {
      ZOrder.interleaveBits(Seq($"x", $"y"), bits = 32)
    }
  }

  test("z-ordered files bound BOTH dimensions; a linear sort only bounds one") {
    // full 32x32 grid, one row per cell — file bounding boxes are exact
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val zDir = "/tmp/graft_zorder_spec/z"
    val linDir = "/tmp/graft_zorder_spec/lin"
    ZOrder.writeZOrdered(grid, Seq("x", "y"), bits = 5, zDir, nFiles = 16)
    grid.repartitionByRange(16, $"x").sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(linDir)

    def extents(dir: String) = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg((max($"x") - min($"x")).as("ex"), (max($"y") - min($"y")).as("ey"),
        min($"y").as("ymin"), max($"y").as("ymax"))
      .select($"ex", $"ey", $"ymin", $"ymax")
      .as[(Long, Long, Long, Long)].collect()

    val z = extents(zDir)
    val lin = extents(linDir)
    // a contiguous 64-key curve segment is (at most a few) 8x8 blocks:
    // both extents stay small (range-partition sampling adds slack)
    assert(z.forall { case (ex, ey, _, _) => ex <= 15 && ey <= 15 },
      s"z extents too wide: ${z.toSeq}")
    // the x-sorted layout leaves y unbounded in every file
    assert(lin.forall { case (_, ey, _, _) => ey === 31 })
    // data skipping on the SECOND dimension: files whose y-range covers
    // y=17 — the z layout prunes most files, the linear layout none
    val zHit = z.count { case (_, _, lo, hi) => lo <= 17 && 17 <= hi }
    val linHit = lin.count { case (_, _, lo, hi) => lo <= 17 && 17 <= hi }
    assert(linHit === lin.length)
    assert(zHit * 2 <= z.length, s"z files hit: $zHit of ${z.length}")
  }
}
