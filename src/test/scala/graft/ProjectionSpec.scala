package graft

import org.apache.spark.sql.functions._
import graft.operators.Projection

class ProjectionSpec extends SparkSpec {

  test("matrixEntry matches the portable md5 contract (DuckDB golden)") {
    // DuckDB: ((CAST(('0x'||substr(md5('rp:0:0'),1,8)) AS UBIGINT)
    //   / 4294967296.0)*2 - 1)/sqrt(16.0) = -0.05562510038726032
    assert(Projection.matrixEntry("rp", 0, 0, 16) === -0.05562510038726032)
    // entries are deterministic and (salt, j, k)-keyed
    assert(Projection.matrixEntry("rp", 1, 2, 16) ===
      Projection.matrixEntry("rp", 1, 2, 16))
    assert(Projection.matrixEntry("rp", 1, 2, 16) !==
      Projection.matrixEntry("rp", 2, 1, 16))
    assert(Projection.matrixEntry("other", 1, 2, 16) !==
      Projection.matrixEntry("rp", 1, 2, 16))
    // bounded: |2u-1| <= 1, scaled by 1/sqrt(outDim)
    val entries = for (j <- 0 until 8; k <- 0 until 4)
      yield Projection.matrixEntry("rp", j, k, 4)
    assert(entries.forall(e => math.abs(e) <= 0.5))
  }

  test("projection equals a driver-side naive matmul, including rounding") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f)),
      (2L, Seq(-0.5f, 0.0f, 4.25f)),
      (3L, Seq(0.0f, 0.0f, 0.0f)))
    val out = Projection.randomProject(
        vecs.toDF("id", "v"), "v", inDim = 3, outDim = 2, salt = "s")
      .select($"id", $"projected").as[(Long, Seq[Double])]
      .collect().toMap
    for ((id, v) <- vecs) {
      val expected = (0 until 2).map { k =>
        var acc = 0.0
        for (j <- 0 until 3)
          acc += v(j).toDouble * Projection.matrixEntry("s", j, k, 2)
        math.rint(acc * 1e6) / 1e6
      }
      assert(out(id) === expected, s"id=$id")
    }
  }

  test("JL: projected top-1 neighbor stays in the planted cluster") {
    import spark.implicits._
    // geometry-controlled fixture (the synthetic corpus is quasi-random):
    // 4 well-separated 64-dim cluster centers, 8 points each, deterministic
    // small per-point offsets — after 64->16 projection every point's
    // nearest neighbor (cosine) must still share its cluster
    val dim = 64
    val pts = for {
      c <- 0 until 4
      i <- 0 until 8
    } yield {
      val base = Array.tabulate(dim)(d =>
        if (d % 4 == c) 1.0f else 0.05f * (((c * 31 + d) % 7) - 3))
      val jitter = Array.tabulate(dim)(d =>
        0.02f * (((c * 131 + i * 17 + d * 7) % 11) - 5))
      (c * 8L + i, c, base.zip(jitter).map { case (a, b) => a + b }.toSeq)
    }
    val df = pts.toDF("id", "cluster", "v")
    val proj = Projection.randomProject(df, "v", inDim = dim, outDim = 16)
      .select($"id", $"cluster", $"projected")
    val top1 = graft.operators.Similarity.cosineTopK(
        proj.select($"id", $"projected"), proj.select($"id", $"projected"),
        "id", "projected", k = 1)
    val clusterOf = pts.map(p => p._1 -> p._2).toMap
    val rows = top1.select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    assert(rows.length === 32)
    rows.foreach { case (q, n) =>
      assert(clusterOf(q) === clusterOf(n), s"query $q left its cluster")
    }
  }

  test("mis-shaped vectors fail loudly") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "v")
    val e = intercept[Exception] {
      Projection.randomProject(df, "v", inDim = 3, outDim = 2).collect()
    }
    assert(e.getMessage.contains("randomProject") ||
      e.getCause != null && e.getCause.getMessage.contains("randomProject"))
  }

  test("projection is a narrow map: no exchange before presentation") {
    import spark.implicits._
    val plan = Projection.randomProject(
        graft.core.Tables.embeddings(spark, sfDir), "embedding",
        inDim = 64, outDim = 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected exchange:\n$plan")
  }
}
