package graft

import org.apache.spark.sql.functions._

import graft.operators.Rrf

/** Rrf.fuse: the reciprocal-rank arithmetic, absence-as-zero, per-query
  * partitioning, the self-fusion limit identity, and input validation. */
class RrfSpec extends SparkSpec {
  import spark.implicits._

  test("two legs: scores are exact 1/(k+r) sums, ties break by id") {
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "r")
    val b = Seq((20L, 1L), (10L, 2L), (40L, 3L)).toDF("id", "r")
    val out = Rrf.fuse(Seq("a" -> a, "b" -> b), "id", "r", topK = 10)
      .orderBy($"rank")
      .select($"rank", $"id", $"r_a", $"r_b", $"rrf_score")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getDouble(4)))
    // 10: 1/61 + 1/62; 20: 1/62 + 1/61 (equal score -> id tie-break);
    // 30: 1/63; 40: 1/63 (tie -> id)
    assert(out.map(_._2).toSeq === Seq(10L, 20L, 30L, 40L))
    assert(out(0)._5 === 1.0 / 61 + 1.0 / 62)
    assert(out(1)._5 === out(0)._5, "symmetric ranks give identical scores")
    assert(out(2)._5 === 1.0 / 63 && out(3)._5 === 1.0 / 63)
    assert(out(2)._3 === Some(3L) && out(2)._4 === None,
      "leg rank null where the leg missed the id")
  }

  test("self-fusion limit identity: fusing a leg with itself preserves its order") {
    val leg = Seq((5L, 1L), (9L, 2L), (2L, 3L), (7L, 4L)).toDF("id", "r")
    val fused = Rrf.fuse(Seq("x" -> leg, "y" -> leg), "id", "r", topK = 4)
      .orderBy($"rank").select($"id").as[Long].collect().toSeq
    assert(fused === Seq(5L, 9L, 2L, 7L))
  }

  test("per-query fusion partitions by the query columns") {
    val a = Seq((1L, 10L, 1L), (1L, 11L, 2L), (2L, 20L, 1L))
      .toDF("q", "id", "r")
    val b = Seq((1L, 11L, 1L), (2L, 21L, 1L), (2L, 20L, 2L))
      .toDF("q", "id", "r")
    val out = Rrf.fuse(Seq("a" -> a, "b" -> b), "id", "r",
        topK = 2, queryCols = Seq("q"))
      .orderBy($"q", $"rank")
      .select($"q", $"rank", $"id").as[(Long, Long, Long)].collect().toSeq
    // q=1: 11 in both legs beats 10 (single leg); q=2: 20 in both beats 21
    assert(out === Seq((1L, 1L, 11L), (1L, 2L, 10L),
      (2L, 1L, 20L), (2L, 2L, 21L)))
  }

  test("validation: at least two distinctly-named legs, positive topK/kRrf") {
    val leg = Seq((1L, 1L)).toDF("id", "r")
    intercept[IllegalArgumentException] {
      Rrf.fuse(Seq("a" -> leg), "id", "r", topK = 1)
    }
    intercept[IllegalArgumentException] {
      Rrf.fuse(Seq("a" -> leg, "a" -> leg), "id", "r", topK = 1)
    }
    intercept[IllegalArgumentException] {
      Rrf.fuse(Seq("a" -> leg, "b" -> leg), "id", "r", topK = 0)
    }
    intercept[IllegalArgumentException] {
      Rrf.fuse(Seq("a" -> leg, "b" -> leg), "id", "r", topK = 1, kRrf = 0)
    }
  }
}
