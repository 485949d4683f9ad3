package graft

import org.apache.spark.sql.functions._

/** q239 scorer calibration audit: bin/count/monotonicity invariants on the
  * fixture corpus (the value-level contract sits under the DuckDB hash). */
class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("calibration table partitions the corpus into valid score bins") {
    val out = SparkEntry.queries("q239_calibration")(spark, sfDir).cache()
    try {
      val rows = out.collect()
      assert(rows.nonEmpty && rows.length <= 1000)
      assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= 999))
      val nDocs = graft.core.Tables.documents(spark, sfDir).count()
      assert(rows.map(_.getLong(1)).sum === nDocs)
      // positives never exceed the bin population; score mass stays inside
      // the bin's [bin/1000, (bin+1)/1000] micro-unit band (999 absorbs 1.0)
      assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1)))
      assert(rows.forall { r =>
        val (bin, n, su) = (r.getLong(0), r.getLong(1), r.getLong(3))
        su >= bin * 1000L * n &&
          (su <= (bin + 1) * 1000L * n || bin == 999L) &&
          (bin < 999L || su <= 1000000L * n)
      })
      // mono bits are 0/1 and the lowest bin is vacuously monotone
      assert(rows.forall(r => r.getLong(4) == 0L || r.getLong(4) == 1L))
      assert(rows.minBy(_.getLong(0)).getLong(4) === 1L)
    } finally out.unpersist()
  }

  test("monotonicity bits replay the cross-multiplied rate comparison") {
    val out = SparkEntry.queries("q239_calibration")(spark, sfDir)
      .orderBy($"bin").collect()
    out.sliding(2).foreach {
      case Array(p, c) =>
        val expected =
          if (p.getLong(0) == c.getLong(0) - 1)
            p.getLong(2) * c.getLong(1) <= c.getLong(2) * p.getLong(1)
          else true // gap bin: no adjacent predecessor, vacuously monotone
        assert(c.getLong(4) === (if (expected) 1L else 0L),
          s"bin ${c.getLong(0)}")
      case _ =>
    }
  }
}
