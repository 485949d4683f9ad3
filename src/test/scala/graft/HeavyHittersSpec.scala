package graft

import graft.operators.HeavyHitters
import graft.operators.HeavyHitters.MisraGries

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("exact capacity reproduces true counts on a planted stream") {
    val items = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(5)("c")
    val got = HeavyHitters.summarize(
        items.toDF("x"), "x", capacity = 10)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("a", 50L), ("b", 30L), ("c", 5L)))
  }

  test("sparse capacity: guaranteed heavies survive, estimates undercount within n/(k+1)") {
    // n = 1000: "hot" 400, "warm" 300, 300 singletons. capacity 4 ->
    // bound n/(k+1) = 200: hot and warm MUST be present.
    val singles = (1 to 300).map(i => s"s$i")
    val items = Seq.fill(400)("hot") ++ Seq.fill(300)("warm") ++ singles
    val n = items.size
    val cap = 4
    val got = HeavyHitters.summarize(
        items.toDF("x"), "x", capacity = cap)
      .as[(String, Long)].collect().toMap
    assert(got.size <= cap)
    val bound = n / (cap + 1)
    for ((item, truth) <- Seq("hot" -> 400L, "warm" -> 300L)) {
      assert(got.contains(item), s"$item missing: $got")
      assert(got(item) <= truth)
      assert(got(item) >= truth - bound, s"$item estimate ${got(item)}")
    }
  }

  test("merge is associative with add-by-count (mergeable-summaries form)") {
    val mg = new MisraGries(3)
    val batches = Seq(
      Seq("a", "a", "b", "c", "d"),
      Seq("a", "b", "b", "e"),
      Seq("a", "a", "f", "b"))
    def summarize(batch: Seq[String]) =
      batch.foldLeft(mg.zero)(mg.reduce)
    val leftFold = batches.map(summarize).reduceLeft(mg.merge)
    val rightFold = batches.map(summarize).reduceRight(mg.merge)
    // both orders keep the guaranteed heavy ("a": 6 of 13 > 13/4)
    assert(leftFold.counts.contains("a"))
    assert(rightFold.counts.contains("a"))
    assert(leftFold.counts.size <= 3 && rightFold.counts.size <= 3)
    // and estimates never exceed truth
    assert(leftFold.counts("a") <= 6 && rightFold.counts("a") <= 6)
  }

  test("capacity guard") {
    intercept[IllegalArgumentException] { new MisraGries(0) }
  }
}
