package graft

import graft.operators.Drift

/** Drift.binnedDrift: exact bin accounting (incl. open edge bins and
  * empty bins), the no-drift fixed point, a planted shift flagged in the
  * right bins, and validation. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def df(xs: Seq[Double]) = xs.toDF("v")

  test("identical distributions: zero contribution, no flags, all bins present") {
    val xs = (0 until 400).map(i => (i % 100).toDouble)
    val out = Drift.binnedDrift(df(xs), df(xs), "v", nBins = 10, lo = 0.0, hi = 100.0)
      .orderBy($"bin")
      .select($"bin", $"n_base", $"n_cur", $"contrib", $"drifted")
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(out.length === 10)
    assert(out.forall { case (_, nb, nc, c, d) => nb == nc && nb == 40 && c == 0.0 && !d })
  }

  test("mass never disappears: out-of-range values land in the edge bins; empty bins emit zeros") {
    val base = df(Seq(-5.0, 0.0, 55.0, 99.0, 250.0))
    val cur = df(Seq(55.0))
    val out = Drift.binnedDrift(base, cur, "v", nBins = 10, lo = 0.0, hi = 100.0)
      .orderBy($"bin").select($"bin", $"n_base", $"n_cur")
      .as[(Long, Long, Long)].collect()
    assert(out.map(_._2).sum === 5, "every base row binned, incl. -5 and 250")
    assert(out.head === ((0L, 2L, 0L)), "-5 clamps into bin 0")
    assert(out.last === ((9L, 2L, 0L)), "99 and 250 land in the top bin")
    assert(out(5) === ((5L, 1L, 1L)))
    assert(out(3) === ((3L, 0L, 0L)), "empty bins present with zero counts")
  }

  test("a planted shift flags the bins that gained or lost mass") {
    val base = df((0 until 1000).map(i => (i % 50).toDouble))          // uniform [0,50)
    val cur = df((0 until 1000).map(i => 50.0 + (i % 50).toDouble))    // uniform [50,100)
    val out = Drift.binnedDrift(base, cur, "v", nBins = 4, lo = 0.0, hi = 100.0)
      .orderBy($"bin").select($"bin", $"drifted").as[(Long, Boolean)].collect()
    // bins 0-1 lost all mass (p_cur 0 vs 0.5 -> contrib ~0.5), bins 2-3
    // gained everything (p_base ~ 0 -> contrib explodes past any threshold)
    assert(out.forall(_._2), s"every quarter moved: $out")
  }

  test("per-bin probabilities sum to one on each side") {
    val base = df((0 until 300).map(i => (i % 97).toDouble))
    val cur = df((0 until 200).map(i => ((i * 7) % 89).toDouble))
    val out = Drift.binnedDrift(base, cur, "v", nBins = 7, lo = 0.0, hi = 100.0)
      .select($"p_base", $"p_cur").as[(Double, Double)].collect()
    assert(math.abs(out.map(_._1).sum - 1.0) < 1e-12)
    assert(math.abs(out.map(_._2).sum - 1.0) < 1e-12)
  }

  test("an empty snapshot yields zero shares, never NaN flags") {
    val out = Drift.binnedDrift(df(Seq.empty), df(Seq(5.0, 15.0)), "v",
        nBins = 4, lo = 0.0, hi = 40.0)
      .select($"p_base", $"contrib", $"drifted")
      .as[(Double, Double, Boolean)].collect()
    assert(out.forall { case (pb, c, _) => !pb.isNaN && !c.isNaN })
    // drift IS flagged where current mass appeared against zero baseline
    // evidence — by the contribution formula, not by NaN ordering
    assert(out.count(_._3) === 2)
  }

  test("categorical drift: head set deterministic, __other folds, new category flags") {
    val base = Seq.fill(50)("en") ++ Seq.fill(30)("de") ++ Seq.fill(10)("fr") ++
      Seq.fill(5)("es") ++ Seq.fill(5)("zh")
    val cur = Seq.fill(50)("en") ++ Seq.fill(30)("de") ++ Seq.fill(10)("fr") ++
      Seq.fill(10)("ko") // es/zh gone, ko appeared
    val out = Drift.categoricalDrift(
        base.toDF("lang"), cur.toDF("lang"), "lang", maxCategories = 3)
      .orderBy($"category")
      .select($"category", $"n_base", $"n_cur", $"drifted")
      .as[(String, Long, Long, Boolean)].collect()
    // head = top-3 by combined mass: en, de, fr; the rest (es, zh, ko)
    // folds into __other
    assert(out.map(_._1).toSeq === Seq("__other", "de", "en", "fr"))
    assert(out.find(_._1 == "__other").get._2 === 10L) // es+zh
    assert(out.find(_._1 == "__other").get._3 === 10L) // ko
    // stable mix: the named categories must not flag
    assert(!out.filter(_._1 != "__other").exists(_._4))
    // a brand-new category against zero baseline evidence must flag hard
    val out2 = Drift.categoricalDrift(
        Seq.fill(100)("en").toDF("lang"),
        (Seq.fill(80)("en") ++ Seq.fill(20)("ko")).toDF("lang"),
        "lang", maxCategories = 5)
      .select($"category", $"drifted").as[(String, Boolean)].collect().toMap
    assert(out2("ko"), "unseen category must flag")
    // nulls bucket as __null rather than vanishing
    val out3 = Drift.categoricalDrift(
        Seq[Option[String]](Some("en"), None, None).toDF("lang"),
        Seq[Option[String]](Some("en")).toDF("lang"), "lang")
      .select($"category", $"n_base").as[(String, Long)].collect().toMap
    assert(out3("__null") === 2L)
  }

  test("binCounts fails loudly on null and NaN values (no silent mass loss)") {
    // a null bin would vanish from counts AND totals, shrinking every
    // proportion without tripping the gate — reject instead
    intercept[Exception] {
      Drift.binCounts(Seq[Option[Double]](Some(1.0), None).toDF("v"),
        "v", 4, 0.0, 10.0).collect()
    }
    intercept[Exception] {
      Drift.binCounts(df(Seq(1.0, Double.NaN)), "v", 4, 0.0, 10.0).collect()
    }
  }

  test("validation: degenerate bins or range rejected") {
    intercept[IllegalArgumentException] {
      Drift.binnedDrift(df(Seq(1.0)), df(Seq(1.0)), "v", 1, 0.0, 1.0)
    }
    intercept[IllegalArgumentException] {
      Drift.binnedDrift(df(Seq(1.0)), df(Seq(1.0)), "v", 4, 5.0, 5.0)
    }
  }
}
