package graft.sinks

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.operators.StagedSwap

/** Small-file compaction for date-partitioned parquet datasets — the
  * maintenance job every continuously-ingesting 100 TB table needs:
  * streaming/micro-batch writers (e.g. [[Sinks.writeDatePartitioned]],
  * `StreamingJobs.dateRotatedWriter`) land a few files per trigger, and
  * after a day a hot partition holds thousands of KB-sized files that
  * tax the driver's file index, the scan's task scheduler, and the
  * object store's LIST calls.
  *
  * Each partition directory is rewritten independently:
  * read → coalesce(⌈bytes/targetBytes⌉) → write-to-tmp → crash-safe
  * [[StagedSwap]] promote. Readers never observe a partial partition:
  * the swap is two renames, and a crash anywhere leaves either the old
  * files or a recoverable tmp/old pair that the NEXT compaction run (or
  * any other StagedSwap caller) restores before touching anything.
  * Staging directories live under dot-prefixed siblings
  * (`.compact_tmp/`, `.compact_old/`), which Spark's file index ignores,
  * so a concurrent reader of the table root never lists half-written
  * data.
  *
  * Only partitions whose file count exceeds `maxFiles` are touched —
  * compaction is incremental by construction, and re-running it is a
  * no-op on already-compact partitions (idempotent maintenance cron).
  * Partition values are taken from directory names, never parsed from
  * data. The driver loops partitions serially here; at cluster scale the
  * loop parallelizes trivially (each partition's swap is independent —
  * the single-writer contract is per-partition).
  */
object Compaction {

  final case class PartitionReport(partition: String, filesBefore: Int,
      filesAfter: Int, bytes: Long, compacted: Boolean)

  def compactDatePartitions(spark: SparkSession, root: String,
      targetBytes: Long = 128L * 1024 * 1024,
      maxFiles: Int = 4): Seq[PartitionReport] = {
    require(targetBytes > 0 && maxFiles > 0, "targetBytes and maxFiles must be positive")
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(
      spark.sparkContext.hadoopConfiguration: Configuration)
    val tmpRoot = new Path(rootPath, ".compact_tmp")
    val oldRoot = new Path(rootPath, ".compact_old")

    def childNames(p: Path): Seq[String] =
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
    def isPartitionName(n: String): Boolean =
      n.contains("=") && !n.startsWith(".") && !n.startsWith("_")

    // Enumerate from live dirs AND staging leftovers: a swap that crashed
    // between its two renames leaves NO live dir — only tmp/old copies —
    // and a live-only listing would skip its recovery forever, leaving the
    // partition invisible to readers. recover() restores `live` before
    // anything else touches the table.
    val names = (childNames(rootPath) ++ childNames(tmpRoot) ++ childNames(oldRoot))
      .filter(isPartitionName).distinct.sorted
    names.foreach { n =>
      val live = new Path(rootPath, n)
      if (!fs.exists(live))
        StagedSwap.recover(fs, live, new Path(tmpRoot, n), new Path(oldRoot, n))
    }

    names.filter(n => fs.exists(new Path(rootPath, n))).map { name =>
      val dir = new Path(rootPath, name)
      def dataFiles = fs.listStatus(dir).toSeq.filter { f =>
        val n = f.getPath.getName
        f.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      val before = dataFiles
      val bytes = before.map(_.getLen).sum
      if (before.size <= maxFiles) {
        PartitionReport(name, before.size, before.size, bytes, compacted = false)
      } else {
        val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
        val tmp = new Path(tmpRoot, name)
        val old = new Path(oldRoot, name)
        // both staging parents must pre-exist: rename() into a missing
        // parent returns false on strict-rename filesystems (HDFS/object
        // stores), which would abort the swap after the rewrite work
        fs.mkdirs(tmp.getParent)
        fs.mkdirs(old.getParent)
        StagedSwap.swap(fs, dir, tmp, old) { tmpDir =>
          spark.read.parquet(dir.toString)
            .coalesce(nOut)
            .write.mode("overwrite").parquet(tmpDir)
        }
        PartitionReport(name, before.size, dataFiles.size, bytes, compacted = true)
      }
    }
  }
}
