package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll

import graft.sources.FormatSources

/** ORC + JSON-lines format round trips, pushdown/pruning on ORC scans,
  * and the JSONL corrupt-record quarantine contract. */
class FormatSourcesSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private val root = Files.createTempDirectory("graft-formats").toString

  test("ORC round trip preserves values and types") {
    val src = graft.core.Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
    FormatSources.writeOrc(src, s"$root/orders_orc")
    val back = FormatSources.readOrc(spark, s"$root/orders_orc", src.schema)
    assert(back.schema === src.schema)
    assert(back.orderBy($"o_orderkey").collect().toSeq ===
      src.orderBy($"o_orderkey").collect().toSeq)
  }

  test("ORC scans prune columns and push filters like parquet") {
    val src = graft.core.Tables.orders(spark, sfDir)
    FormatSources.writeOrc(src, s"$root/orders_orc2")
    val q = FormatSources.readOrc(spark, s"$root/orders_orc2", src.schema)
      .filter($"o_totalprice" > 100000.0)
      .select($"o_orderkey")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice)"), plan.take(1500))
    assert(!plan.toLowerCase.contains("o_orderdate"), "unused columns pruned")
  }

  test("JSONL round trip with declared schema") {
    val src = Seq((1L, "alpha", 1.5), (2L, "beta", 2.5)).toDF("id", "name", "v")
    FormatSources.writeJsonl(src, s"$root/jl")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("v", DoubleType)))
    val back = FormatSources.readJsonl(spark, s"$root/jl", schema)
      .filter($"_corrupt".isNull).drop("_corrupt")
    assert(back.orderBy($"id").collect().toSeq === src.orderBy($"id").collect().toSeq)
  }

  test("malformed JSONL lines land in the quarantine column, not dropped") {
    val dir = s"$root/dirty"
    new java.io.File(dir).mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$dir/part-0.json"),
      """{"id": 1, "name": "ok"}
        |not json at all
        |{"id": 2, "name": "also ok"}
        |""".stripMargin)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType)))
    val back = FormatSources.readJsonl(spark, dir, schema).cache()
    assert(back.filter($"_corrupt".isNotNull).count() === 1)
    assert(back.filter($"_corrupt".isNull).count() === 2)
    val bad = back.filter($"_corrupt".isNotNull).select($"_corrupt").first().getString(0)
    assert(bad === "not json at all")
    back.unpersist()
  }

  test("schema declaring _corrupt is rejected") {
    val schema = StructType(Seq(StructField("_corrupt", StringType)))
    intercept[IllegalArgumentException] {
      FormatSources.readJsonl(spark, s"$root/never", schema)
    }
  }

  override def afterAll(): Unit = {
    try {
      import org.apache.hadoop.conf.Configuration
      import org.apache.hadoop.fs.Path
      val p = new Path(root)
      p.getFileSystem(new Configuration()).delete(p, true)
    } finally super.afterAll()
  }
}
