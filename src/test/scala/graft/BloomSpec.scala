package graft

import org.apache.spark.sql.functions._

import graft.functions.expressions.BloomExpressions
import graft.operators.Contamination

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("bloom has NO false negatives and a sane false-positive rate") {
    val rnd = new scala.util.Random(7)
    val members = Array.fill(100000)(rnd.nextLong())
    val bloom = BloomExpressions.build(members, bitsPerElement = 16)
    // exactness of the prefilter contract rests on this property
    assert(members.forall(bloom.mightContain), "false negative found")
    val nonMembers = Array.fill(100000)(rnd.nextLong()).filterNot(members.toSet)
    val fp = nonMembers.count(bloom.mightContain).toDouble / nonMembers.length
    assert(fp < 0.01, s"false-positive rate $fp at 16 bits/element")
  }

  test("bloom_any is a row-local codegen probe") {
    val bloom = BloomExpressions.build(Seq(1L, 2L, 3L))
    val df = Seq(
      (1L, Seq(10L, 2L)),   // hits via 2
      (2L, Seq(99L, 98L)),  // miss (fp chance ~0 at this size)
      (3L, Seq.empty[Long]) // empty array -> false
    ).toDF("id", "hashes")
    val got = df.filter(BloomExpressions.bloom_any(col("hashes"), bloom))
      .select($"id").as[Long].collect().toSet
    assert(got === Set(1L))
    // narrow: probing never shuffles or joins
    val plan = df.filter(BloomExpressions.bloom_any(col("hashes"), bloom))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
  }

  test("bloom-prefiltered contamination equals the exact scan (sf0.001 corpus)") {
    val docs = core.Tables.documents(spark, sfDir)
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val bench = docs.filter($"doc_id" % 10 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"corpus_id", $"bench_id", $"containment")
        .as[(Long, Long, Double)].collect().toSet
    val exact = rows(Contamination.ngramContainment(
      corpus, bench, "doc_id", "text", n = 3, minContainment = 0.8))
    val bloomed = rows(Contamination.ngramContainmentBloom(
      corpus, bench, "doc_id", "text", n = 3, minContainment = 0.8))
    assert(bloomed === exact)
    assert(exact.nonEmpty, "fixture should contain contamination")
    // empty benchmark -> empty result, schema intact
    val none = Contamination.ngramContainmentBloom(
      corpus, bench.limit(0), "doc_id", "text", n = 3)
    assert(none.columns.toSeq === Seq("corpus_id", "bench_id", "containment"))
    assert(none.count() === 0)
  }
}
