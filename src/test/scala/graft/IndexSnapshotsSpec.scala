package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{IndexSnapshots, MinHashIndex, ProductQuantizer, TextIndex}

/** Snapshot/rollback across all three persisted index families: restore
  * returns probes AND dashboard stats bit-exactly to the snapshot-time
  * generation, idempotently, crash-window included; immutability,
  * quiescence, and inventory contracts. */
class IndexSnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def words(seed: String, n: Int): String =
    (1 to n).map(i => s"w${seed}_$i").mkString(" ")
  private lazy val docs = (1 to 40)
    .map(i => (i.toLong, words(s"c$i", 30) + (if (i % 4 == 0) " spark join" else "")))
    .toDF("doc_id", "text").cache()

  test("TextIndex: restore == snapshot-time probe + stats; mutations in " +
      "between fully undone; idempotent rerun; snapshot survives") {
    val path = Files.createTempDirectory("snap_tx").toString
    TextIndex.save(docs, "doc_id", "text", path)
    def probe() = TextIndex.probe(spark, path,
      Seq("spark", "join"), k = 15).collect().toSeq
    def stats() = TextIndex.stats(spark, path).collect().toSeq
    val (p0, s0) = (probe(), stats())
    IndexSnapshots.snapshot(spark, path, "v1")
    // poison the generation: delete a third, upsert edited + fresh docs
    TextIndex.delete(spark, path,
      docs.filter($"doc_id" % 3 === 0).select($"doc_id"))
    TextIndex.upsert(docs.filter($"doc_id" % 5 === 0)
      .select($"doc_id", concat($"text", lit(" poisoned")).as("text")),
      "doc_id", "text", path)
    assert(probe() !== p0, "mutations must be visible before restore")
    IndexSnapshots.restore(spark, path, "v1")
    assert(probe() === p0, "restore must return the snapshot-time probe")
    assert(stats() === s0, "restore must return the snapshot-time stats")
    // idempotent rerun; snapshot still restorable after restoring from it
    IndexSnapshots.restore(spark, path, "v1")
    assert(probe() === p0)
    assert(IndexSnapshots.list(spark, path).select($"tag")
      .as[String].collect().toSeq === Seq("v1"))
  }

  test("MinHashIndex: roll back an append that polluted the corpus") {
    val path = Files.createTempDirectory("snap_mh").toString
    MinHashIndex.save(docs, "doc_id", "text", path)
    val probes = Seq((901L, words("c1", 30)), (902L, words("np", 30)))
      .toDF("doc_id", "text")
    def hits() = MinHashIndex.probe(probes, "doc_id", "text", path,
      minEstJac = 0.5).collect().toSeq.sortBy(_.toString)
    val h0 = hits()
    IndexSnapshots.snapshot(spark, path, "pre_ingest")
    MinHashIndex.append(
      Seq((500L, words("np", 30))).toDF("doc_id", "text"),
      "doc_id", "text", path)
    assert(hits() !== h0, "appended near-dup must hit before rollback")
    IndexSnapshots.restore(spark, path, "pre_ingest")
    assert(hits() === h0, "rollback must un-learn the appended batch")
    assert(MinHashIndex.stats(spark, path).collect().toSeq
      .toString.contains("sig_rows"))
  }

  test("ProductQuantizer: roll back an upsert; probeSaved bit-exact") {
    def vec(i: Int): Seq[Double] =
      Seq.tabulate(8)(d => if (d == i % 4) 10.0 + (i % 4) else 0.001 * i)
    val corpus = (0 until 60).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    val path = Files.createTempDirectory("snap_pq").toString
    val coarse = graft.operators.KMeans.fit(
      corpus, "vec_id", "embedding", k = 4, iters = 2)
    val pq = ProductQuantizer.fit(
      corpus, "vec_id", "embedding", m = 2, k = 4, iters = 2)
    ProductQuantizer.save(
      corpus, "vec_id", "embedding", coarse, pq, path, residual = false)
    val queries = corpus.filter($"vec_id" < 2)
    def rows() = ProductQuantizer.probeSaved(queries, "vec_id", "embedding",
        spark, path, k = 5, nProbe = 4)
      .collect().toSeq.sortBy(_.toString)
    val r0 = rows()
    IndexSnapshots.snapshot(spark, path, "v1")
    ProductQuantizer.upsert(
      (0 until 10).map(i => (i.toLong, vec(i + 1))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", path)
    assert(rows() !== r0)
    IndexSnapshots.restore(spark, path, "v1")
    assert(rows() === r0, "rollback must restore snapshot-time answers")
  }

  test("restore converges a crash window: one artifact already swapped, " +
      "the rerun restores the rest") {
    val path = Files.createTempDirectory("snap_crash").toString
    TextIndex.save(docs, "doc_id", "text", path)
    val p0 = TextIndex.probe(spark, path, Seq("spark"), k = 10).collect().toSeq
    val s0 = TextIndex.stats(spark, path).collect().toSeq
    IndexSnapshots.snapshot(spark, path, "v1")
    TextIndex.delete(spark, path,
      docs.filter($"doc_id" % 2 === 0).select($"doc_id"))
    // simulate a restore that died after swapping ONLY the docs sidecar:
    // copy the snapshot's docs over live (what its first swap produces)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val live = new org.apache.hadoop.fs.Path(s"$path/docs")
    fs.delete(live, true)
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(s"$path/_snapshots/v1/docs"),
      fs, live, false, true, conf)
    // mixed generation now (snapshot docs, post-delete postings+meta);
    // the rerun must converge everything to the snapshot
    IndexSnapshots.restore(spark, path, "v1")
    assert(TextIndex.probe(spark, path, Seq("spark"), k = 10)
      .collect().toSeq === p0)
    assert(TextIndex.stats(spark, path).collect().toSeq === s0)
  }

  test("restore recovers its OWN mid-swap crash: _rst + _old leftovers " +
      "with live missing do not deadlock the rerun") {
    val path = Files.createTempDirectory("snap_rstcrash").toString
    TextIndex.save(docs, "doc_id", "text", path)
    val p0 = TextIndex.probe(spark, path, Seq("spark"), k = 10).collect().toSeq
    IndexSnapshots.snapshot(spark, path, "v1")
    TextIndex.delete(spark, path,
      docs.filter($"doc_id" % 2 === 0).select($"doc_id"))
    // simulate restore dying between StagedSwap's two renames on the
    // postings artifact: live renamed to _old, the complete new copy
    // still staged at _rst (with its _SUCCESS), live MISSING
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val live = new org.apache.hadoop.fs.Path(s"$path/postings")
    val rst = new org.apache.hadoop.fs.Path(s"$path/postings_rst")
    val old = new org.apache.hadoop.fs.Path(s"$path/postings_old")
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(s"$path/_snapshots/v1/postings"),
      fs, rst, false, true, conf)
    assert(fs.rename(live, old), "fixture: stage live aside")
    // the rerun must converge everything to the snapshot, not reject
    IndexSnapshots.restore(spark, path, "v1")
    assert(TextIndex.probe(spark, path, Seq("spark"), k = 10)
      .collect().toSeq === p0)
    assert(!fs.exists(rst) && !fs.exists(old), "staging leftovers cleared")
  }

  test("at(tag): read-only time travel — probe a past generation without " +
      "restoring; live index unaffected") {
    val path = Files.createTempDirectory("snap_at").toString
    TextIndex.save(docs, "doc_id", "text", path)
    val p0 = TextIndex.probe(spark, path, Seq("spark", "join"), k = 10)
      .collect().toSeq
    IndexSnapshots.snapshot(spark, path, "v1")
    TextIndex.delete(spark, path,
      docs.filter($"doc_id" % 2 === 0).select($"doc_id"))
    val pLive = TextIndex.probe(spark, path, Seq("spark", "join"), k = 10)
      .collect().toSeq
    assert(pLive !== p0)
    // the snapshot path serves the PAST generation through the normal probe
    val atV1 = IndexSnapshots.at(spark, path, "v1")
    assert(TextIndex.probe(spark, atV1, Seq("spark", "join"), k = 10)
      .collect().toSeq === p0, "time-travel probe must see the snapshot")
    assert(TextIndex.stats(spark, atV1).collect().nonEmpty)
    // …and reading it did not disturb the live generation
    assert(TextIndex.probe(spark, path, Seq("spark", "join"), k = 10)
      .collect().toSeq === pLive)
    intercept[IllegalArgumentException] {
      IndexSnapshots.at(spark, path, "missing")
    }
  }

  test("prune: keepLast retention by creation order; pruned tag no longer " +
      "restorable; survivors untouched") {
    val path = Files.createTempDirectory("snap_pr1").toString
    TextIndex.save(docs, "doc_id", "text", path)
    // lexicographically REVERSED tags prove retention is creation-order
    // (promotion mtime), not name-order; sleeps separate the ms stamps
    IndexSnapshots.snapshot(spark, path, "z_oldest")
    Thread.sleep(20)
    TextIndex.delete(spark, path,
      docs.filter($"doc_id" % 4 === 0).select($"doc_id"))
    IndexSnapshots.snapshot(spark, path, "m_mid")
    Thread.sleep(20)
    TextIndex.delete(spark, path,
      docs.filter($"doc_id" % 4 === 1).select($"doc_id"))
    IndexSnapshots.snapshot(spark, path, "a_newest")
    val pMid = TextIndex.probe(
      spark, IndexSnapshots.at(spark, path, "m_mid"), Seq("spark"), k = 10)
      .collect().toSeq
    assert(IndexSnapshots.prune(spark, path, keepLast = 2) ===
      Seq("z_oldest"))
    assert(IndexSnapshots.list(spark, path).select($"tag")
      .as[String].collect().toSeq === Seq("a_newest", "m_mid"))
    intercept[IllegalArgumentException] {
      IndexSnapshots.restore(spark, path, "z_oldest")
    }
    intercept[IllegalArgumentException] {
      IndexSnapshots.at(spark, path, "z_oldest")
    }
    // survivors still time-travel and restore bit-exactly
    assert(TextIndex.probe(
      spark, IndexSnapshots.at(spark, path, "m_mid"), Seq("spark"), k = 10)
      .collect().toSeq === pMid)
    IndexSnapshots.restore(spark, path, "m_mid")
    assert(TextIndex.probe(spark, path, Seq("spark"), k = 10)
      .collect().toSeq === pMid)
    // idempotent: nothing left over the cap (restore's _rst is gone)
    assert(IndexSnapshots.prune(spark, path, keepLast = 2) === Seq.empty)
    // keepLast = 0 drains the store
    assert(IndexSnapshots.prune(spark, path, keepLast = 0).sorted ===
      Seq("a_newest", "m_mid"))
    assert(IndexSnapshots.list(spark, path).count() === 0L)
  }

  test("prune: protect pins a tag past the retention cap; mid-flight " +
      "restore blocks prune; no snapshot store is a no-op") {
    val path = Files.createTempDirectory("snap_pr2").toString
    TextIndex.save(docs, "doc_id", "text", path)
    assert(IndexSnapshots.prune(spark, path, keepLast = 3) === Seq.empty)
    IndexSnapshots.snapshot(spark, path, "v1")
    Thread.sleep(20)
    IndexSnapshots.snapshot(spark, path, "v2")
    Thread.sleep(20)
    IndexSnapshots.snapshot(spark, path, "v3")
    // protect is additive: v1 survives the cap, v2 falls to it
    assert(IndexSnapshots.prune(spark, path, keepLast = 1,
      protect = Set("v1")) === Seq("v2"))
    assert(IndexSnapshots.list(spark, path).select($"tag")
      .as[String].collect().toSeq === Seq("v1", "v3"))
    // ANY crashed-mutation staging blocks prune (the quiescence rule):
    // a crashed restore can leave _old-only states, and its source tag
    // is unknown, so no victim choice is safe around any leftover
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    for (leftover <- Seq("postings_rst", "postings_old", "docs_del")) {
      val p = new org.apache.hadoop.fs.Path(s"$path/$leftover")
      fs.mkdirs(p)
      intercept[IllegalArgumentException] {
        IndexSnapshots.prune(spark, path, keepLast = 0)
      }
      fs.delete(p, true)
    }
    intercept[IllegalArgumentException] {
      IndexSnapshots.prune(spark, path, keepLast = -1)
    }
  }

  test("prune crash window: a half-deleted victim is retired (hidden) " +
      "first, so it never looks restorable, and the next prune sweeps it") {
    val path = Files.createTempDirectory("snap_pr3").toString
    TextIndex.save(docs, "doc_id", "text", path)
    IndexSnapshots.snapshot(spark, path, "v1")
    Thread.sleep(20)
    IndexSnapshots.snapshot(spark, path, "v2")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    // simulate prune dying AFTER the retire rename, BEFORE the delete
    val v1 = new org.apache.hadoop.fs.Path(s"$path/_snapshots/v1")
    assert(fs.rename(v1, new org.apache.hadoop.fs.Path(
      s"$path/_snapshots/.del_v1")), "fixture: retire v1")
    // …and a crashed snapshot() staging dir for good measure
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/_snapshots/.tmp_v9"))
    // invisible everywhere a snapshot is named
    assert(IndexSnapshots.list(spark, path).select($"tag")
      .as[String].collect().toSeq === Seq("v2"))
    intercept[IllegalArgumentException] {
      IndexSnapshots.restore(spark, path, "v1")
    }
    // the next prune sweeps both hidden leftovers, keeps the survivor
    assert(IndexSnapshots.prune(spark, path, keepLast = 1) === Seq.empty)
    val left = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$path/_snapshots"))
      .map(_.getPath.getName).toSeq
    assert(left === Seq("v2"), s"hidden leftovers must be swept, got $left")
  }

  test("prune retention property: over a randomized tag history, survivors " +
      "are exactly the keepLast newest plus the protected set") {
    val path = Files.createTempDirectory("snap_prprop").toString
    TextIndex.save(docs, "doc_id", "text", path)
    val rng = new scala.util.Random(4242L)
    // shuffled names decouple lexicographic order from creation order
    val tags = rng.shuffle((1 to 9).map(i => s"t$i").toList)
    tags.foreach { t =>
      IndexSnapshots.snapshot(spark, path, t)
      Thread.sleep(15) // separate the promotion mtimes
    }
    val protect = Set(tags(1), tags(4))
    val keepLast = 3
    val expectSurvivors = (tags.takeRight(keepLast) ++ protect).toSet
    val dropped = IndexSnapshots.prune(spark, path, keepLast, protect)
    assert(dropped.toSet === tags.toSet -- expectSurvivors,
      s"creation order ${tags.mkString(",")}: dropped $dropped")
    assert(IndexSnapshots.list(spark, path).select($"tag")
      .as[String].collect().toSet === expectSurvivors)
    // idempotent under the same policy; every survivor still restorable
    assert(IndexSnapshots.prune(spark, path, keepLast, protect) === Seq.empty)
    expectSurvivors.foreach(t =>
      assert(IndexSnapshots.at(spark, path, t).nonEmpty))
  }

  test("immutability, quiescence, inventory, drop, and validation") {
    val path = Files.createTempDirectory("snap_val").toString
    TextIndex.save(docs, "doc_id", "text", path)
    IndexSnapshots.snapshot(spark, path, "v1")
    // immutable: same tag rejected
    intercept[IllegalArgumentException] {
      IndexSnapshots.snapshot(spark, path, "v1")
    }
    // quiescence: a staging leftover blocks snapshot and restore
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val leftover = new org.apache.hadoop.fs.Path(s"$path/postings_del")
    fs.mkdirs(leftover)
    intercept[IllegalArgumentException] {
      IndexSnapshots.snapshot(spark, path, "v2")
    }
    intercept[IllegalArgumentException] {
      IndexSnapshots.restore(spark, path, "v1")
    }
    fs.delete(leftover, true)
    // inventory: tags sorted, counts positive; staging dirs ignored
    IndexSnapshots.snapshot(spark, path, "v2")
    val inv = IndexSnapshots.list(spark, path)
      .as[(String, Long, Long)].collect().toSeq
    assert(inv.map(_._1) === Seq("v1", "v2"))
    assert(inv.forall(r => r._2 > 0 && r._3 > 0))
    // drop removes exactly the tag; unknown tag and bad names reject
    IndexSnapshots.drop(spark, path, "v1")
    assert(IndexSnapshots.list(spark, path).select($"tag")
      .as[String].collect().toSeq === Seq("v2"))
    intercept[IllegalArgumentException] {
      IndexSnapshots.drop(spark, path, "v1")
    }
    intercept[IllegalArgumentException] {
      IndexSnapshots.snapshot(spark, path, "../evil")
    }
    intercept[IllegalArgumentException] {
      IndexSnapshots.restore(spark, path, "nope")
    }
  }
}
