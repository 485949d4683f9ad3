package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Homoglyph skeleton + syllable/readability contracts (q241/q242). */
class HomoglyphSpec extends SparkSpec {
  import spark.implicits._

  test("homoglyph table maps the pinned confusable code points 1:1") {
    val (from, to) = TextFunctions.homoglyphTable
    assert(from.length === to.length)
    assert(from.toSet.size === from.length) // no duplicate FROM keys
    assert(from.forall(_ >= 0x0370)) // every FROM char is non-Latin
    assert(to.forall(_ < 0x80)) // every TO char is ASCII
    // spot-pin the code points an encoding slip would most likely mangle
    val m = from.zip(to).toMap
    assert(m('а') === 'a' && m('е') === 'e' && m('о') === 'o')
    assert(m('ο') === 'o' && m('А') === 'A' && m('Х') === 'X')
  }

  test("skeleton collapses a corrupted copy onto its Latin source") {
    val src = "the spark merge operator keeps exact copies"
    val corrupted = src.map {
      case 'a' => 'а'; case 'e' => 'е'; case 'o' => 'о'
      case 'p' => 'р'; case 'c' => 'с'; case 'x' => 'х'
      case 'y' => 'у'; case c => c
    }
    assert(corrupted !== src) // the evasion really changed bytes
    val got = Seq((src, corrupted)).toDF("a", "b")
      .select(TextFunctions.homoglyphSkeleton($"a").as("sa"),
        TextFunctions.homoglyphSkeleton($"b").as("sb"))
      .head()
    assert(got.getString(0) === src) // Latin text is a fixed point
    assert(got.getString(1) === src) // corruption folds back
  }

  test("syllable heuristic: vowel-group runs floored at one per token") {
    val rows = Seq("hello world", "xyz rhythm", "mmm", "queueing area")
      .toDF("text")
      .select(TextFunctions.syllableCount($"text").as("y"))
      .collect().map(_.getLong(0)).toSeq
    // hello(e,o)=2 world(o)=1 | xyz(y)=1 rhythm(y)=1 | mmm→floor 1
    // queueing(ueuei)=1 area(a,ea)=2
    assert(rows === Seq(3L, 2L, 1L, 3L))
  }

  test("q241 bands reproduce the integer formula from the emitted counts") {
    val out = SparkEntry.queries("q241_readability")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (w, s, y, band) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val expected =
        if (s == 0 || w == 0) -1L
        else {
          val lhs = 206835L * s * w - 1015L * w * w - 84600L * y * s
          if (lhs >= 60000L * s * w) 2L
          else if (lhs >= 30000L * s * w) 1L else 0L
        }
      assert(band === expected, s"doc ${r.getLong(0)}")
    }
    assert(out.map(_.getLong(4)).toSet.subsetOf(Set(-1L, 0L, 1L, 2L)))
  }

  test("q246: naive decontam misses the homoglyph plants, skeleton catches all") {
    val out = SparkEntry.queries("q246_skeleton_decontam")(spark, sfDir)
      .collect()
    val planted = out.find(_.getString(0) == "planted").get
    assert(planted.getLong(1) > 0)
    assert(planted.getLong(2) === 0L) // the evasion defeats the naive digest
    assert(planted.getLong(3) === planted.getLong(1)) // skeleton catches all
    // control: skeleton never over-catches on uncorrupted current rows
    // beyond what the naive digest already flags (skeleton is a superset
    // fold of normalize, so hits can only grow via confusable collisions,
    // absent from the Latin-only fixture corpus)
    out.filter(_.getString(0) != "planted").foreach { r =>
      assert(r.getLong(3) === r.getLong(2), s"source ${r.getString(0)}")
    }
  }

  test("q242 clusters pair every planted corruption with its source") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val planted = docs.filter($"doc_id" % 5 === 0).count()
    val out = SparkEntry.queries("q242_homoglyph_dedup")(spark, sfDir)
      .collect()
    assert(out.nonEmpty && planted > 0)
    // every planted id (source + 1000000) appears in a cluster that also
    // holds its source id
    val clusters = out.map(_.getString(2).split(",").map(_.toLong).toSet)
    val plantedIds = docs.filter($"doc_id" % 5 === 0)
      .select($"doc_id").collect().map(_.getLong(0))
    plantedIds.foreach { id =>
      val c = clusters.find(_.contains(id + 1000000L))
      assert(c.exists(_.contains(id)), s"planted copy of $id not clustered")
    }
    // canonical ids are cluster minima; copies counted exactly
    out.foreach { r =>
      val ids = r.getString(2).split(",").map(_.toLong)
      assert(ids.min === r.getLong(0) && ids.length === r.getLong(1))
    }
  }
}
