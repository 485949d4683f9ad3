package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{IndexMaintenance, MinHashIndex, TextIndex}

/** Maintenance policy: fragmentation flags after many appends, clears
  * after the family compact; thresholds, exclusions, validation. */
class IndexMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def words(seed: String, n: Int): String =
    (1 to n).map(i => s"w${seed}_$i").mkString(" ")
  private lazy val docs = (1 to 40)
    .map(i => (i.toLong, words(s"c$i", 30)))
    .toDF("doc_id", "text").cache()

  test("fragmented BM25 index flags needs_compact; compact clears it") {
    val path = Files.createTempDirectory("maint_tx").toString
    TextIndex.save(docs.filter($"doc_id" % 8 === 0), "doc_id", "text", path)
    for (r <- 1 to 7)
      TextIndex.append(docs.filter($"doc_id" % 8 === r), "doc_id", "text", path)
    assert(IndexMaintenance.needsCompact(spark, path, maxFilesPerDir = 4),
      "8 append batches must trip a 4-files-per-dir threshold")
    val flagged = IndexMaintenance.plan(spark, path, maxFilesPerDir = 4)
      .filter($"needs_compact").select($"artifact")
      .as[String].collect().toSet
    assert(flagged.contains("postings"),
      s"the bucket-partitioned postings must be the fragmented artifact, got $flagged")
    TextIndex.compact(spark, path)
    assert(!IndexMaintenance.needsCompact(spark, path, maxFilesPerDir = 4),
      "compact must clear the flag")
    // plan rows cover every artifact, exact counts
    val p = IndexMaintenance.plan(spark, path)
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(p.keySet === Set("postings", "docs", "meta"))
    assert(p.values.forall(r => r._2 >= 1 && r._3 >= 1))
  }

  test("minhash family rides the same policy; staging and snapshots ignored") {
    val path = Files.createTempDirectory("maint_mh").toString
    MinHashIndex.save(docs, "doc_id", "text", path)
    for (r <- 1 to 6)
      MinHashIndex.append(
        Seq((100L + r, words(s"n$r", 30))).toDF("doc_id", "text"),
        "doc_id", "text", path)
    assert(IndexMaintenance.needsCompact(spark, path, maxFilesPerDir = 3))
    MinHashIndex.compact(spark, path)
    assert(!IndexMaintenance.needsCompact(spark, path, maxFilesPerDir = 3))
    // snapshot + a staging leftover must not appear in the plan
    graft.operators.IndexSnapshots.snapshot(spark, path, "v1")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/bands_del"))
    val arts = IndexMaintenance.plan(spark, path)
      .select($"artifact").as[String].collect().toSet
    assert(arts === Set("sigs", "bands", "meta"), s"got $arts")
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/bands_del"), true)
    intercept[IllegalArgumentException] {
      IndexMaintenance.plan(spark, path, maxFilesPerDir = 0)
    }
    intercept[IllegalArgumentException] {
      IndexMaintenance.plan(spark, s"$path/definitely_absent")
    }
  }
}
