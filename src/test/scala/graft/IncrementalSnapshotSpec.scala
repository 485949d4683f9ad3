package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.{IndexSnapshots, IvfIndex, TextIndex}

/** Content-addressed incremental snapshots: O(changed bytes) dedup
  * through `_snapshots/_objects`, transparent restore/at resolution,
  * refcounted GC under prune, crash windows, and the stale-view
  * hazards. Complements IndexSnapshotsSpec (full-copy contracts). */
class IncrementalSnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def words(seed: String, n: Int): String =
    (1 to n).map(i => s"w${seed}_$i").mkString(" ")
  private lazy val docs = (1 to 40)
    .map(i => (i.toLong, words(s"c$i", 30) + (if (i % 4 == 0) " spark join" else "")))
    .toDF("doc_id", "text").cache()

  private def hfs(path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def objectKeys(path: String): Seq[String] = {
    val f = hfs(path)
    val objRoot = new Path(s"$path/_snapshots/_objects")
    if (!f.exists(objRoot)) Seq.empty
    else f.listStatus(objRoot).map(_.getPath.getName).toSeq.sorted
  }
  private def tagFiles(path: String, tag: String): Seq[String] =
    hfs(path).listStatus(new Path(s"$path/_snapshots/$tag"))
      .map(_.getPath.getName).toSeq.sorted

  test("restore from an incremental snapshot is bit-exact; identical " +
      "generations share every object; tag dirs hold only refs") {
    val path = Files.createTempDirectory("isnap_tx").toString
    TextIndex.save(docs, "doc_id", "text", path)
    def probe() = TextIndex.probe(spark, path,
      Seq("spark", "join"), k = 15).collect().toSeq
    def stats() = TextIndex.stats(spark, path).collect().toSeq
    val (p0, s0) = (probe(), stats())
    IndexSnapshots.snapshotIncremental(spark, path, "i1")
    // an unchanged index snapshotted again: zero new objects
    IndexSnapshots.snapshotIncremental(spark, path, "i1again")
    val keys = objectKeys(path)
    assert(keys.size === 3, s"postings/docs/meta stored once, got $keys")
    assert(tagFiles(path, "i1") === Seq("docs.ref", "meta.ref", "postings.ref"))
    assert(tagFiles(path, "i1again") === tagFiles(path, "i1"))
    // poison the generation, then roll back through the ref store
    TextIndex.delete(spark, path,
      docs.filter($"doc_id" % 3 === 0).select($"doc_id"))
    TextIndex.upsert(docs.filter($"doc_id" % 5 === 0)
      .select($"doc_id", concat($"text", lit(" poisoned")).as("text")),
      "doc_id", "text", path)
    assert(probe() !== p0, "mutations must be visible before restore")
    IndexSnapshots.restore(spark, path, "i1")
    assert(probe() === p0, "incremental restore must be bit-exact")
    assert(stats() === s0)
    IndexSnapshots.restore(spark, path, "i1") // idempotent
    assert(probe() === p0)
    assert(IndexSnapshots.list(spark, path).select($"tag")
      .as[String].collect().toSeq === Seq("i1", "i1again"),
      "_objects must never be listed as a tag")
  }

  test("dedup accounting on the IVF family: append rewrites lists, " +
      "shares centroids/stats objects across snapshots") {
    def vec(i: Int): Seq[Double] =
      Seq.tabulate(8)(d => if (d == i % 4) 10.0 + (i % 4) else 0.001 * i)
    val corpus = (0 until 48).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    val path = Files.createTempDirectory("isnap_ivf").toString
    val model = IvfIndex.fit(corpus, "vec_id", "embedding", nLists = 4, iters = 2)
    IvfIndex.save(corpus, "vec_id", "embedding", model, path)
    IndexSnapshots.snapshotIncremental(spark, path, "a1")
    assert(objectKeys(path).size === 3)
    // exact duplicates of the probe vectors: they MUST enter the top-5
    IvfIndex.append((100 until 110).map(i => (i.toLong, vec(i - 100)))
      .toDF("vec_id", "embedding"), "vec_id", "embedding", path)
    IndexSnapshots.snapshotIncremental(spark, path, "a2")
    // centroids + stats untouched by append -> shared; lists changed
    assert(objectKeys(path).size === 4,
      s"expected 3 + 1 new lists object, got ${objectKeys(path)}")
    // both generations remain independently restorable
    val (m2, lists2) = IvfIndex.load(spark, path)
    val probes = corpus.filter($"vec_id" < 3)
    val r2 = IvfIndex.probeIndexed(probes, lists2, "vec_id", "embedding",
      k = 5, m2, nProbe = 4).collect().toSeq
    IndexSnapshots.restore(spark, path, "a1")
    val (m1, lists1) = IvfIndex.load(spark, path)
    val r1 = IvfIndex.probeIndexed(probes, lists1, "vec_id", "embedding",
      k = 5, m1, nProbe = 4).collect().toSeq
    assert(r1 !== r2, "generations must differ (append visible in a2)")
    IndexSnapshots.restore(spark, path, "a2")
    val (m2b, lists2b) = IvfIndex.load(spark, path)
    assert(IvfIndex.probeIndexed(probes, lists2b, "vec_id", "embedding",
      k = 5, m2b, nProbe = 4).collect().toSeq === r2)
  }

  test("at() materializes a readable view once, reuses it, and prune " +
      "sweeps it as a cache; live index never disturbed") {
    val path = Files.createTempDirectory("isnap_at").toString
    TextIndex.save(docs, "doc_id", "text", path)
    val p0 = TextIndex.probe(spark, path, Seq("spark", "join"), k = 10)
      .collect().toSeq
    IndexSnapshots.snapshotIncremental(spark, path, "i1")
    TextIndex.delete(spark, path,
      docs.filter($"doc_id" % 2 === 0).select($"doc_id"))
    val at1 = IndexSnapshots.at(spark, path, "i1")
    assert(at1.endsWith(".view_i1"), s"incremental at() must serve a view: $at1")
    assert(TextIndex.probe(spark, at1, Seq("spark", "join"), k = 10)
      .collect().toSeq === p0, "time travel through the view")
    assert(IndexSnapshots.at(spark, path, "i1") === at1, "view reused")
    val f = hfs(path)
    // prune sweeps the view (hidden cache), keeps the tag; at() rebuilds
    assert(IndexSnapshots.prune(spark, path, keepLast = 5) === Seq.empty)
    assert(!f.exists(new Path(at1)), "prune must sweep materialized views")
    assert(TextIndex.probe(spark, IndexSnapshots.at(spark, path, "i1"),
      Seq("spark", "join"), k = 10).collect().toSeq === p0)
  }

  test("view lifecycle: viewStats sees held views, dropView reclaims one, " +
      "and the at() maxViews cap bounds copies with answers unchanged") {
    val path = Files.createTempDirectory("isnap_views").toString
    TextIndex.save(docs, "doc_id", "text", path)
    def probeAt(p: String) = TextIndex.probe(spark, p,
      Seq("spark", "join"), k = 10).collect().toSeq
    val p0 = probeAt(path)
    // four generations: snapshot, mutate, snapshot, ... so each tag's
    // view has distinct content
    IndexSnapshots.snapshotIncremental(spark, path, "v1")
    val perTag = scala.collection.mutable.Map("v1" -> p0)
    Seq("v2", "v3", "v4").zipWithIndex.foreach { case (tag, i) =>
      TextIndex.delete(spark, path,
        docs.filter($"doc_id" === (i * 7 + 1).toLong).select($"doc_id"))
      IndexSnapshots.snapshotIncremental(spark, path, tag)
      perTag(tag) = probeAt(path)
      Thread.sleep(20) // distinct mtimes for the LRU order
    }
    // uncapped reads accumulate: 3 views held, viewStats sees each
    Seq("v1", "v2", "v3").foreach { t =>
      IndexSnapshots.at(spark, path, t); Thread.sleep(20)
    }
    val held = IndexSnapshots.viewStats(spark, path).collect()
      .map(r => (r.getString(0), r.getLong(2))).toSeq
    assert(held.map(_._1).sorted === Seq("v1", "v2", "v3"))
    assert(held.forall(_._2 > 0), s"view bytes must be positive: $held")
    // dropView reclaims exactly one; the tag itself still time-travels
    assert(IndexSnapshots.dropView(spark, path, "v2"))
    assert(!IndexSnapshots.dropView(spark, path, "v2"), "second drop no-op")
    assert(IndexSnapshots.viewStats(spark, path).collect()
      .map(_.getString(0)).sorted.toSeq === Seq("v1", "v3"))
    assert(probeAt(IndexSnapshots.at(spark, path, "v2")) === perTag("v2"))
    // capped read: v4 under maxViews=2 evicts down to {newest other, v4}
    assert(IndexSnapshots.viewStats(spark, path).count() === 3)
    probeAt(IndexSnapshots.at(spark, path, "v4", maxViews = 2))
    val afterCap = IndexSnapshots.viewStats(spark, path).collect()
      .map(_.getString(0)).sorted.toSeq
    assert(afterCap.size === 2 && afterCap.contains("v4"),
      s"cap must hold <= 2 views incl. the just-read one: $afterCap")
    // evicted tags re-materialize with unchanged answers
    Seq("v1", "v2", "v3", "v4").foreach { t =>
      assert(probeAt(IndexSnapshots.at(spark, path, t, maxViews = 2))
        === perTag(t), s"answers unchanged for $t")
    }
    assert(IndexSnapshots.viewStats(spark, path).count() <= 2)
    // prune still sweeps every view (cache rule unchanged)
    IndexSnapshots.prune(spark, path, keepLast = 9)
    assert(IndexSnapshots.viewStats(spark, path).count() === 0)
    // the cap also enforces on a REF-LESS (full-copy) tag's capped read:
    // it holds no view of its own, but older tags' stale views must
    // still evict or a full-copy-serving stream never reclaims
    IndexSnapshots.snapshot(spark, path, "vfull")
    IndexSnapshots.at(spark, path, "v1"); Thread.sleep(20)
    IndexSnapshots.at(spark, path, "v2"); Thread.sleep(20)
    assert(IndexSnapshots.viewStats(spark, path).count() === 2)
    val atFull = IndexSnapshots.at(spark, path, "vfull", maxViews = 1)
    assert(atFull.endsWith("vfull"), "full-copy tag serves its own dir")
    assert(IndexSnapshots.viewStats(spark, path).collect()
      .map(_.getString(0)).toSeq === Seq("v2"),
      "capped ref-less read must evict down to maxViews other views")
  }

  test("prune refcounts the object store: survivors' objects stay, " +
      "orphans and crashed-copy staging are collected") {
    val path = Files.createTempDirectory("isnap_gc").toString
    TextIndex.save(docs, "doc_id", "text", path)
    IndexSnapshots.snapshotIncremental(spark, path, "g1")
    Thread.sleep(20)
    TextIndex.delete(spark, path,
      docs.filter($"doc_id" % 4 === 0).select($"doc_id"))
    IndexSnapshots.snapshotIncremental(spark, path, "g2")
    assert(objectKeys(path).size === 6, "two disjoint generations")
    // a crashed object copy leaves hidden staging in _objects
    val f = hfs(path)
    f.mkdirs(new Path(s"$path/_snapshots/_objects/.tmp_deadbeef"))
    val p2 = TextIndex.probe(spark, IndexSnapshots.at(spark, path, "g2"),
      Seq("spark"), k = 10).collect().toSeq
    assert(IndexSnapshots.prune(spark, path, keepLast = 1) === Seq("g1"))
    val after = objectKeys(path)
    assert(after.size === 3, s"g1's orphans + staging collected: $after")
    assert(!after.exists(_.startsWith(".")), "crashed staging swept")
    // the survivor still resolves through the store
    assert(TextIndex.probe(spark, IndexSnapshots.at(spark, path, "g2"),
      Seq("spark"), k = 10).collect().toSeq === p2)
    IndexSnapshots.restore(spark, path, "g2")
    assert(TextIndex.probe(spark, path, Seq("spark"), k = 10)
      .collect().toSeq === p2)
    // drop leaves orphans; explicit gcObjects reclaims them
    IndexSnapshots.drop(spark, path, "g2")
    assert(objectKeys(path).size === 3)
    assert(IndexSnapshots.gcObjects(spark, path).size === 3)
    assert(objectKeys(path) === Seq.empty)
  }

  test("drop + re-snapshot under the same tag never serves the dropped " +
      "generation through a stale view") {
    val path = Files.createTempDirectory("isnap_stale").toString
    TextIndex.save(docs, "doc_id", "text", path)
    IndexSnapshots.snapshotIncremental(spark, path, "latest")
    val v0 = IndexSnapshots.at(spark, path, "latest") // materialize view
    val p0 = TextIndex.probe(spark, v0, Seq("spark"), k = 10).collect().toSeq
    TextIndex.delete(spark, path,
      docs.filter($"doc_id" % 2 === 0).select($"doc_id"))
    val pLive = TextIndex.probe(spark, path, Seq("spark"), k = 10)
      .collect().toSeq
    IndexSnapshots.drop(spark, path, "latest")
    IndexSnapshots.snapshotIncremental(spark, path, "latest")
    val v1 = IndexSnapshots.at(spark, path, "latest")
    assert(TextIndex.probe(spark, v1, Seq("spark"), k = 10)
      .collect().toSeq === pLive,
      "re-snapshotted tag must serve the NEW generation")
    assert(pLive !== p0)
  }

  test("mixed full + incremental snapshots coexist: list, prune order, " +
      "restore both; dangling ref fails loudly") {
    val path = Files.createTempDirectory("isnap_mix").toString
    TextIndex.save(docs, "doc_id", "text", path)
    IndexSnapshots.snapshot(spark, path, "full1")
    Thread.sleep(20)
    TextIndex.delete(spark, path,
      docs.filter($"doc_id" % 3 === 0).select($"doc_id"))
    IndexSnapshots.snapshotIncremental(spark, path, "inc1")
    assert(IndexSnapshots.list(spark, path).select($"tag")
      .as[String].collect().toSeq === Seq("full1", "inc1"))
    // full tag serves directly; both restore
    assert(IndexSnapshots.at(spark, path, "full1").endsWith("full1"))
    IndexSnapshots.restore(spark, path, "full1")
    IndexSnapshots.restore(spark, path, "inc1")
    // dangling ref (external sabotage of the store) fails loudly
    val f = hfs(path)
    objectKeys(path).foreach(k =>
      f.delete(new Path(s"$path/_snapshots/_objects/$k"), true))
    intercept[IllegalArgumentException] {
      IndexSnapshots.restore(spark, path, "inc1")
    }
    intercept[IllegalArgumentException] {
      IndexSnapshots.at(spark, path, "inc1")
    }
  }

  test("property: a randomized snapshot/mutate/drop/prune/restore history " +
      "keeps every surviving tag bit-exact and the object store consistent") {
    val path = Files.createTempDirectory("isnap_prop").toString
    TextIndex.save(docs, "doc_id", "text", path)
    val rng = new scala.util.Random(1313L)
    def probeLive() = TextIndex.probe(spark, path, Seq("spark", "join"),
      k = 12).collect().toSeq
    // model: tag -> the live probe at snapshot time
    var model = Map.empty[String, Seq[org.apache.spark.sql.Row]]
    var tagN = 0
    var delMod = 2
    for (step <- 1 to 18) {
      rng.nextInt(6) match {
        case 0 | 1 => // snapshot the current generation
          tagN += 1
          val t = s"t$tagN"
          IndexSnapshots.snapshotIncremental(spark, path, t)
          model += t -> probeLive()
          Thread.sleep(12)
        case 2 => // small mutation: delete one rotating residue class
          delMod = (delMod % 6) + 2
          TextIndex.delete(spark, path,
            docs.filter($"doc_id" % 19 === delMod).select($"doc_id"))
        case 3 => // edit a couple of docs
          TextIndex.upsert(docs.filter($"doc_id" % 13 === (step % 13))
            .select($"doc_id",
              concat($"text", lit(s" rev$step")).as("text")),
            "doc_id", "text", path)
        case 4 if model.nonEmpty => // drop a random tag
          val t = model.keys.toSeq.sorted.apply(rng.nextInt(model.size))
          IndexSnapshots.drop(spark, path, t)
          model -= t
        case 5 if model.size > 1 => // prune to a random cap
          val keep = 1 + rng.nextInt(model.size)
          val dropped = IndexSnapshots.prune(spark, path, keepLast = keep)
          model --= dropped
        case _ => ()
      }
      // invariant 1: the inventory is exactly the model's tags
      assert(IndexSnapshots.list(spark, path).select($"tag")
        .as[String].collect().toSeq === model.keys.toSeq.sorted,
        s"step $step inventory")
      // invariant 2: one random surviving tag time-travels bit-exactly
      if (model.nonEmpty) {
        val t = model.keys.toSeq.sorted.apply(rng.nextInt(model.size))
        assert(TextIndex.probe(spark, IndexSnapshots.at(spark, path, t),
          Seq("spark", "join"), k = 12).collect().toSeq === model(t),
          s"step $step tag $t time travel")
      }
    }
    // final: every survivor restores bit-exactly (newest last, so the
    // live index ends on a restorable generation), and gc is settled
    for (t <- model.keys.toSeq.sorted) {
      IndexSnapshots.restore(spark, path, t)
      assert(probeLive() === model(t), s"final restore of $t")
    }
    // explicit gc (drops leave orphans by contract) must never touch an
    // object a surviving tag still references
    IndexSnapshots.gcObjects(spark, path)
    for (t <- model.keys.toSeq.sorted)
      assert(TextIndex.probe(spark, IndexSnapshots.at(spark, path, t),
        Seq("spark", "join"), k = 12).collect().toSeq === model(t),
        s"post-gc time travel of $t")
  }

  test("crash mid-snapshot leaves only hidden staging: list ignores it, " +
      "the rerun completes, quiescence and immutability still hold") {
    val path = Files.createTempDirectory("isnap_crash").toString
    TextIndex.save(docs, "doc_id", "text", path)
    val f = hfs(path)
    // simulate a snapshotIncremental that died mid-staging
    f.mkdirs(new Path(s"$path/_snapshots/.tmp_c1"))
    assert(IndexSnapshots.list(spark, path).count() === 0L)
    IndexSnapshots.snapshotIncremental(spark, path, "c1")
    assert(IndexSnapshots.list(spark, path).select($"tag")
      .as[String].collect().toSeq === Seq("c1"))
    intercept[IllegalArgumentException] {
      IndexSnapshots.snapshotIncremental(spark, path, "c1") // immutable
    }
    // quiescence: a crashed index mutation blocks incremental snapshots
    val leftover = new Path(s"$path/postings_del")
    f.mkdirs(leftover)
    intercept[IllegalArgumentException] {
      IndexSnapshots.snapshotIncremental(spark, path, "c2")
    }
    f.delete(leftover, true)
  }
}
