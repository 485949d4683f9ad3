package graft

import graft.operators.QuantileSketch
import graft.operators.QuantileSketch.QuantileSketchAgg

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val ps = Seq(0.0, 0.1, 0.5, 0.9, 0.99, 1.0)

  test("exact capacity reproduces the rank-ceil(p*n) order statistic") {
    // 1..1000 shuffled deterministically; capacity > n -> no collapse
    val vals = (1L to 1000L).map(v => (v * 389) % 1009).filter(_ <= 1000)
    val df = vals.toDF("v")
    val s = QuantileSketch.sketch(df, "v", capacity = 2048)
    assert(s.n === vals.size)
    assert(s.err === 0L)
    val sorted = vals.sorted
    for (p <- ps) {
      val r = math.max(1L, math.ceil(p * s.n).toLong)
      assert(s.quantile(p) === sorted((r - 1).toInt), s"p=$p")
    }
  }

  test("sparse capacity: realized rank error within the summary's own bound") {
    val n = 10000
    val vals = (0 until n).map(i => ((i * 2654435761L) % n))
    val df = vals.toDF("v").repartition(7)
    val s = QuantileSketch.sketch(df, "v", capacity = 64)
    assert(s.n === n)
    assert(s.err > 0L, "collapses must fire at capacity 64 over 10k rows")
    assert(s.err < n, "bound must stay non-trivial")
    val sorted = vals.sorted
    for (p <- ps) {
      val est = s.quantile(p)
      val r = math.max(1L, math.ceil(p * s.n).toLong)
      val lo = sorted.count(_ < est) + 1L
      val hi = sorted.count(_ <= est).toLong
      assert(lo <= r + s.err && hi >= r - s.err,
        s"p=$p est=$est ranks=[$lo,$hi] target=$r err=${s.err}")
    }
  }

  test("summary memory is parameter-bounded: capacity per level, log levels") {
    val n = 100000
    val cap = 128
    val vals = (0 until n).map(i => (i * 48271L) % 99991)
    val s = QuantileSketch.sketch(vals.toDF("v"), "v", capacity = cap)
    assert(s.buf.size < cap)
    assert(s.levels.forall(b => b.isEmpty || b.size == cap))
    val maxLevels = 64 - java.lang.Long.numberOfLeadingZeros(n.toLong / cap) + 2
    assert(s.levels.size <= maxLevels,
      s"${s.levels.size} levels for n=$n cap=$cap")
  }

  test("error guarantee holds under any partitioning (merge-order stress)") {
    val n = 5000
    val vals = (0 until n).map(i => ((i * 1103515245L + 12345) % 50000))
    val sorted = vals.sorted
    for (parts <- Seq(1, 3, 16)) {
      val s = QuantileSketch.sketch(vals.toDF("v").repartition(parts), "v",
        capacity = 32)
      assert(s.n === n)
      for (p <- Seq(0.25, 0.5, 0.75, 0.95)) {
        val est = s.quantile(p)
        val r = math.max(1L, math.ceil(p * s.n).toLong)
        val lo = sorted.count(_ < est) + 1L
        val hi = sorted.count(_ <= est).toLong
        assert(lo <= r + s.err && hi >= r - s.err,
          s"parts=$parts p=$p est=$est ranks=[$lo,$hi] target=$r err=${s.err}")
      }
    }
  }

  test("driver-side merge matches element-wise inserts (mergeable contract)") {
    val agg = new QuantileSketchAgg(16)
    val a = (1L to 500L).foldLeft(agg.zero)(agg.reduce)
    val b = (501L to 1200L).foldLeft(agg.zero)(agg.reduce)
    val m = agg.merge(a, b)
    assert(m.n === 1200L)
    assert(m.err === a.err + b.err ||
      m.err > a.err + b.err, "merge may add collapses, never lose them")
    val sorted = (1L to 1200L).toIndexedSeq
    for (p <- Seq(0.1, 0.5, 0.9)) {
      val est = m.quantile(p)
      val r = math.max(1L, math.ceil(p * m.n).toLong)
      val lo = sorted.count(_ < est) + 1L
      val hi = sorted.count(_ <= est).toLong
      assert(lo <= r + m.err && hi >= r - m.err, s"p=$p")
    }
  }

  test("collapse keeps odd positions of the merged pair (deterministic offset)") {
    val out = QuantileSketch.collapse(Seq(1L, 3L, 5L, 7L), Seq(2L, 4L, 6L, 8L))
    assert(out === Seq(2L, 4L, 6L, 8L))
  }

  test("gate emits all-true integer rows on real data at sparse capacity") {
    val df = graft.core.Tables.lineitem(spark, sfDir)
    val got = QuantileSketch.gate(df, "l_quantity",
        ps = Seq(0.1, 0.5, 0.9, 0.99), capacity = 64)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got.map(_._1) === Seq(10L, 50L, 90L, 99L))
    assert(got.forall(_._3), s"gate failed: $got")
    assert(got.map(_._2).distinct.size === 1)
  }

  test("grouped summarize at exact capacity matches per-group sort ranks") {
    val df = graft.core.Tables.documents(spark, sfDir)
    val got = QuantileSketch.summarize(df, "n_chars", "lang",
        ps = Seq(0.5, 0.9), capacity = 8192)
      .as[(String, Double, Long, Long)].collect()
      .map { case (g, p, n, q) => (g, p) -> ((n, q)) }.toMap
    val truth = df.select($"lang", $"n_chars").as[(String, Long)]
      .collect().groupBy(_._1).map { case (g, rows) =>
        g -> rows.map(_._2).sorted.toIndexedSeq
      }
    for ((g, sorted) <- truth; p <- Seq(0.5, 0.9)) {
      val r = math.max(1L, math.ceil(p * sorted.size).toLong)
      assert(got((g, p)) === ((sorted.size.toLong, sorted((r - 1).toInt))),
        s"group=$g p=$p")
    }
  }

  test("save/load round-trips a summary bit-exactly; merge requires " +
      "matching capacity and equals the aggregator's merge") {
    val dir = java.nio.file.Files.createTempDirectory("qs_store").toString
    val agg = new QuantileSketchAgg(16)
    val a = (1L to 500L).foldLeft(agg.zero)(agg.reduce)
    val b = (501L to 900L).foldLeft(agg.zero)(agg.reduce)
    QuantileSketch.saveSummary(spark, a, dir)
    val a2 = QuantileSketch.loadSummary(spark, dir)
    assert(a2.capacity === a.capacity && a2.n === a.n && a2.err === a.err)
    assert(a2.buf.toSeq === a.buf.toSeq)
    assert(a2.levels.map(_.toSeq) === a.levels.map(_.toSeq))
    val viaStore = QuantileSketch.merge(a2, b)
    val direct = agg.merge(a, b)
    assert(viaStore.n === direct.n && viaStore.err === direct.err)
    for (p <- Seq(0.1, 0.5, 0.9))
      assert(viaStore.quantile(p) === direct.quantile(p), s"p=$p")
    // overwrite-safe: a second save replaces atomically
    QuantileSketch.saveSummary(spark, viaStore, dir)
    assert(QuantileSketch.loadSummary(spark, dir).n === 900L)
    intercept[IllegalArgumentException] {
      QuantileSketch.merge(a, new QuantileSketchAgg(32).zero)
    }
  }

  test("grouped store: distributed merge equals per-group recompute at " +
      "exact capacity; one-sided groups pass through; bounds hold sparse") {
    val rows = (0 until 3000).map { i =>
      (s"g${i % 3}", ((i * 2654435761L) % 5000))
    } :+ (("only_left", 7L))
    val df = rows.toDF("g", "v")
    val left = df.filter(org.apache.spark.sql.functions.hash($"v") % 2 === 0)
    val right = df.filter(org.apache.spark.sql.functions.hash($"v") % 2 =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("qs_gstore").toString
    val ls = QuantileSketch.summarizeToStore(left, "v", "g", capacity = 8192)
    val rs = QuantileSketch.summarizeToStore(right, "v", "g", capacity = 8192)
    QuantileSketch.saveGrouped(spark, ls, dir)
    val merged = QuantileSketch.mergeGrouped(
      QuantileSketch.loadGrouped(spark, dir), rs)
    val got = QuantileSketch.quantilesOfStore(merged, "g", Seq(0.5, 0.9))
      .as[(String, Double, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val truth = rows.groupBy(_._1).map { case (g, rs0) =>
      g -> rs0.map(_._2).sorted.toIndexedSeq }
    for ((g, sorted) <- truth; p <- Seq(0.5, 0.9)) {
      val r = math.max(1L, math.ceil(p * sorted.size).toLong)
      assert(got((g, p)) === ((sorted.size.toLong, sorted((r - 1).toInt))),
        s"group=$g p=$p")
    }
    assert(got(("only_left", 0.5)) === ((1L, 7L)),
      "a group on one side must pass through the merge untouched")
    // sparse capacity: the merged store's own bound certifies per group
    val sm = QuantileSketch.mergeGrouped(
      QuantileSketch.summarizeToStore(left, "v", "g", capacity = 32),
      QuantileSketch.summarizeToStore(right, "v", "g", capacity = 32))
    QuantileSketch.quantilesOfStore(sm, "g", Seq(0.5))
      .as[(String, Double, Long, Long)].collect().foreach {
        case (g, p, n, est) =>
          val sorted = truth(g)
          assert(n === sorted.size.toLong)
          val errRow = sm.filter($"g" === g).select($"err")
            .as[Long].collect().head
          val r = math.max(1L, math.ceil(p * n).toLong)
          val lo = sorted.count(_ < est) + 1L
          val hi = sorted.count(_ <= est).toLong
          assert(lo <= r + errRow && hi >= r - errRow, s"group=$g")
      }
  }

  test("empty and degenerate inputs fail loudly or stay trivial") {
    intercept[IllegalArgumentException] {
      new QuantileSketchAgg(1)
    }
    val one = QuantileSketch.sketch(Seq(42L).toDF("v"), "v", capacity = 4)
    assert(one.n === 1L && one.err === 0L)
    for (p <- ps) assert(one.quantile(p) === 42L)
    intercept[IllegalArgumentException] {
      one.quantile(1.5)
    }
  }
}
