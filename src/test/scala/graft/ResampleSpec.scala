package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Resample

/** Resample (gap-filled fixed-step grids): LOCF and linear-interpolation
  * fills against hand-computed fixtures, deterministic in-cell reduction,
  * span guard, and partition invariance. */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private val HourUs = 3600000000L

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // (key, ts, tie, value) — key "a" observes hours 0, 1, 4; key "b" only hour 2.
  private def fixture = Seq(
    ("a", ts("2024-01-01 00:10:00"), 1L, 10.0),
    ("a", ts("2024-01-01 01:20:00"), 2L, 20.0),
    ("a", ts("2024-01-01 04:30:00"), 3L, 50.0),
    ("b", ts("2024-01-01 02:00:00"), 4L, 7.0)
  ).toDF("k", "t", "tie", "v")

  test("LOCF: per-key dense grid, gaps carry the previous observed value") {
    val out = Resample.resample(fixture, "k", "t", "v", "tie", HourUs, "locf")
      .orderBy($"k", $"bucket")
      .select($"k", $"value", $"n_obs", $"observed")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getBoolean(3)))
    assert(out === Seq(
      ("a", 10.0, 1L, true),  // hour 0
      ("a", 20.0, 1L, true),  // hour 1
      ("a", 20.0, 0L, false), // hour 2: gap → carried 20.0
      ("a", 20.0, 0L, false), // hour 3: gap → carried 20.0
      ("a", 50.0, 1L, true),  // hour 4
      ("b", 7.0, 1L, true)))  // single-cell key: no gap rows at all
  }

  test("linear fill: gaps interpolate between straddling cells; trailing gap LOCFs") {
    val withTrailing = fixture.union(
      Seq(("c", ts("2024-01-01 00:00:00"), 5L, 1.0),
          ("c", ts("2024-01-01 03:00:00"), 6L, 4.0)) // hours 0 and 3
        .toDF("k", "t", "tie", "v"))
    val out = Resample.resample(withTrailing, "k", "t", "v", "tie", HourUs, "linear")
      .orderBy($"k", $"bucket")
      .select($"k", $"bucket", $"value")
      .collect()
      .map(r => (r.getString(0), r.getDouble(2)))
    val a = out.filter(_._1 == "a").map(_._2)
    // a: observed 10, 20, _, _, 50 → lerp over [1,4]: 20 + (50-20)*(1/3), *(2/3)
    assert(a(0) === 10.0 && a(1) === 20.0 && a(4) === 50.0)
    assert(a(2) === 20.0 + 30.0 * (1.0 / 3.0))
    assert(a(3) === 20.0 + 30.0 * (2.0 / 3.0))
    val c = out.filter(_._1 == "c").map(_._2)
    assert(c === Seq(1.0, 2.0, 3.0, 4.0)) // exact thirds-free lerp
  }

  test("in-cell reduction is last-wins with (ts, tie) tie-break, not first/last") {
    // two observations in one cell with identical ts: greater tie wins
    val sameCell = Seq(
      ("x", ts("2024-01-01 00:30:00"), 1L, 100.0),
      ("x", ts("2024-01-01 00:30:00"), 2L, 200.0),
      ("x", ts("2024-01-01 00:10:00"), 9L, 5.0)
    ).toDF("k", "t", "tie", "v")
    val out = Resample.resample(sameCell, "k", "t", "v", "tie", HourUs, "locf")
      .select($"value", $"n_obs").collect()
    assert(out.length === 1)
    assert(out(0).getDouble(0) === 200.0) // ts ties → tie column decides
    assert(out(0).getLong(1) === 3L)
  }

  test("partition invariance: same grid whatever the input layout") {
    val ev = graft.core.Tables.events(spark, sfDir)
    def run(df: org.apache.spark.sql.DataFrame) =
      Resample.resample(df, "user_id", "ts", "value", "event_id", HourUs, "locf")
        .orderBy($"user_id", $"bucket").collect().toSeq
    assert(run(ev) === run(ev.repartition(13, $"event_type")))
  }

  test("pre-1970 timestamps bucket by floor division, not truncation") {
    // 1969-12-31 23:30 UTC and 1970-01-01 00:30 UTC must land in DIFFERENT
    // hourly cells (truncating `div` would fold both into bucket 0)
    val pts = Seq(
      ("e", new Timestamp(-1800000000L / 1000), 1L, 1.0),
      ("e", new Timestamp(1800000000L / 1000), 2L, 2.0)
    ).toDF("k", "t", "tie", "v")
    val out = Resample.resample(pts, "k", "t", "v", "tie", HourUs, "locf")
      .orderBy($"bucket").select($"bucket", $"value", $"observed").collect()
    assert(out.length === 2, out.mkString(","))
    assert(out(0).getLong(0) === -1L && out(1).getLong(0) === 0L)
    assert(out(0).getDouble(1) === 1.0 && out(1).getDouble(1) === 2.0)
  }

  test("span guard fails loudly instead of exploding a runaway grid") {
    val wide = Seq(
      ("w", ts("2024-01-01 00:00:00"), 1L, 1.0),
      ("w", ts("2024-06-01 00:00:00"), 2L, 2.0)
    ).toDF("k", "t", "tie", "v")
    // 1-second cells over 5 months ≈ 13M cells > maxCellsPerKey
    val e = intercept[Exception] {
      Resample.resample(wide, "k", "t", "v", "tie", 1000000L, "locf").count()
    }
    assert(e.getMessage != null)
  }

  test("bucket_ts is the cell start and observed cells keep their own value") {
    val out = Resample.resample(fixture, "k", "t", "v", "tie", HourUs, "locf")
      .filter($"k" === "a" && $"bucket" % lit(1L) === 0)
      .orderBy($"bucket")
      .select(date_format($"bucket_ts", "HH:mm").as("hm"), $"observed")
      .collect().map(r => (r.getString(0), r.getBoolean(1)))
    assert(out === Seq(("00:00", true), ("01:00", true), ("02:00", false),
      ("03:00", false), ("04:00", true)))
  }
}
