package graft

import org.apache.spark.sql.Row
import graft.operators.Quantize

class QuantizeSpec extends SparkSpec {

  private def stats(vec: Seq[Float]): Row = {
    import spark.implicits._
    Quantize.int8Stats(Seq((1L, vec)).toDF("id", "v"), "id", "v").head()
  }

  test("3-4-5 triangle: norms and codes are exact") {
    val r = stats(Seq(3f, 4f))
    assert(r.getAs[Int]("dim") === 2)
    assert(r.getAs[Double]("l2_norm") === 5.0)
    assert(r.getAs[Double]("max_abs") === 4.0)
    // scale 127/4 = 31.75: codes floor(95.75)=95, floor(127.5)=127
    assert(r.getAs[Long]("q_sum") === 222L)
    assert(r.getAs[Long]("q_zeros") === 0L)
  }

  test("the max-magnitude element always codes to ±127") {
    val r = stats(Seq(-1f, 2f))
    // scale 63.5: floor(-63.0) = -63, floor(127.5) = 127
    assert(r.getAs[Long]("q_sum") === 64L)
  }

  test("all-zero vector quantizes to all zeros without dividing by zero") {
    val r = stats(Seq(0f, 0f, 0f))
    assert(r.getAs[Double]("l2_norm") === 0.0)
    assert(r.getAs[Double]("max_abs") === 0.0)
    assert(r.getAs[Long]("q_sum") === 0L)
    assert(r.getAs[Long]("q_zeros") === 3L)
  }

  test("q_zeros flags small components crushed by a dominant one") {
    // 0.001 against ma=1.0: floor(0.127 + 0.5) = 0 — lost to quantization
    val r = stats(Seq(1f, 0.001f))
    assert(r.getAs[Long]("q_zeros") === 1L)
  }

  test("codes stay within the signed int8 range on real embeddings") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val out = Quantize.int8Codes(emb, "vec_id", "embedding")
      .select(explode($"codes").as("c"))
      .agg(min($"c"), max($"c")).head()
    assert(out.getInt(0) >= -127 && out.getInt(1) <= 127)
  }

  test("int8Stats agrees with int8Codes on the same corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val emb = graft.core.Tables.embeddings(spark, sfDir).limit(50)
    val viaCodes = Quantize.int8Codes(emb, "vec_id", "embedding")
      .select($"vec_id",
        aggregate($"codes", lit(0L), (a, x) => a + x.cast("long")).as("q_sum"))
    val viaStats = Quantize.int8Stats(emb, "vec_id", "embedding")
      .select($"vec_id", $"q_sum")
    assert(viaCodes.exceptAll(viaStats).isEmpty && viaStats.exceptAll(viaCodes).isEmpty)
  }
}
