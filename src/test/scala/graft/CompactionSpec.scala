package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.sinks.Compaction

/** Compaction over a date-partitioned parquet table: fewer files, byte-
  * identical data, partition pruning intact, idempotence, and only
  * over-fragmented partitions touched. */
class CompactionSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private val root = Files.createTempDirectory("graft-compact").toString

  private def writeFragmented(path: String): Unit = {
    val ev = graft.core.Tables.events(spark, sfDir)
      .withColumn("event_date", to_date($"ts"))
      .filter($"event_date" < "2024-01-04")
    // 12 shuffle partitions → ~12 small files per date partition
    ev.repartition(12)
      .write.mode("overwrite").partitionBy("event_date").parquet(path)
  }

  test("compaction shrinks file counts, preserves data, keeps pruning") {
    val path = s"$root/t1"
    writeFragmented(path)
    val beforeData = spark.read.parquet(path)
      .orderBy($"event_id").collect().toSeq
    val reports = Compaction.compactDatePartitions(spark, path, maxFiles = 3)
    assert(reports.nonEmpty && reports.forall(_.compacted))
    assert(reports.forall(r => r.filesAfter < r.filesBefore),
      reports.mkString("\n"))
    assert(reports.forall(_.filesAfter <= 3))
    val after = spark.read.parquet(path)
    assert(after.orderBy($"event_id").collect().toSeq === beforeData)
    // staging dirs are gone and hidden from any future scan
    val fs = new Path(path).getFileSystem(new Configuration())
    assert(!fs.exists(new Path(s"$path/.compact_old")) ||
      fs.listStatus(new Path(s"$path/.compact_old")).isEmpty)
    // partition pruning still works on the compacted layout
    val pruned = after.filter($"event_date" === "2024-01-02")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(1500))
    assert(pruned.count() > 0)
  }

  test("already-compact partitions are untouched; rerun is a no-op") {
    val path = s"$root/t2"
    writeFragmented(path)
    Compaction.compactDatePartitions(spark, path, maxFiles = 3)
    val second = Compaction.compactDatePartitions(spark, path, maxFiles = 3)
    assert(second.forall(!_.compacted), second.mkString("\n"))
  }

  test("a partition below the threshold is reported but not rewritten") {
    val path = s"$root/t3"
    Seq((1L, "2024-01-01"), (2L, "2024-01-01")).toDF("id", "event_date")
      .coalesce(1)
      .write.mode("overwrite").partitionBy("event_date").parquet(path)
    val reports = Compaction.compactDatePartitions(spark, path, maxFiles = 3)
    assert(reports.size === 1 && !reports.head.compacted &&
      reports.head.filesBefore === 1)
  }

  test("a swap that crashed between renames is recovered on the next run") {
    val path = s"$root/t4"
    writeFragmented(path)
    val fs = new Path(path).getFileSystem(new Configuration())
    val part = fs.listStatus(new Path(path)).map(_.getPath.getName)
      .filter(_.startsWith("event_date=")).sorted.head
    val live = new Path(s"$path/$part")
    val tmp = new Path(s"$path/.compact_tmp/$part")
    val old = new Path(s"$path/.compact_old/$part")
    val expected = spark.read.parquet(live.toString)
      .orderBy(col("event_id")).collect().toSeq
    // manufacture the dangerous window: live renamed aside, completed tmp
    // (with _SUCCESS) not yet promoted — the partition has VANISHED from
    // a live-only listing
    fs.mkdirs(tmp.getParent); fs.mkdirs(old.getParent)
    assert(org.apache.hadoop.fs.FileUtil.copy(fs, live, fs, tmp, false, new Configuration()))
    assert(fs.rename(live, old))
    assert(!fs.exists(live))
    val reports = Compaction.compactDatePartitions(spark, path, maxFiles = 3)
    assert(fs.exists(live), "crashed partition restored to live")
    assert(reports.exists(_.partition == part), "recovered partition compacted in the same run")
    assert(spark.read.parquet(live.toString)
      .orderBy(col("event_id")).collect().toSeq === expected)
    assert(!fs.exists(tmp) && !fs.exists(old), "staging leftovers cleared")
  }

  override def afterAll(): Unit = {
    try {
      val p = new Path(root)
      p.getFileSystem(new Configuration()).delete(p, true)
    } finally super.afterAll()
  }
}
