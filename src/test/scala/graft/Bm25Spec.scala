package graft

import graft.operators.Bm25

/** BM25: driver-side formula replication, saturation/length semantics,
  * top-k determinism. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark merge join window scan"),
    (2L, "spark spark spark merge the the the the the the the the"),
    (3L, "join join merge"),
    (4L, "the a stream window"),
    (5L, "spark")).toDF("doc_id", "text")

  test("scores replicate the BM25 formula computed driver-side") {
    val terms = Seq("spark", "join")
    val got = Bm25.search(corpus, "doc_id", "text", terms, k = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val docs = Seq(
      1L -> "spark merge join window scan",
      2L -> "spark spark spark merge the the the the the the the the",
      3L -> "join join merge",
      4L -> "the a stream window",
      5L -> "spark")
    val n = docs.size
    val dls = docs.map { case (id, t) => id -> t.split(" ").length.toLong }.toMap
    val avgdl = dls.values.sum.toDouble / n
    def tf(id: Long, t: String) =
      docs.toMap.apply(id).split(" ").count(_ == t).toDouble
    val ref = docs.map { case (id, _) =>
      val s = terms.map { t =>
        val df = docs.count(_._2.split(" ").contains(t)).toDouble
        val idf = StrictMath.log((n - df + 0.5) / (df + 0.5) + 1.0)
        val f = tf(id, t)
        idf * (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * dls(id) / avgdl))
      }.sum
      id -> BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    assert(got === ref)
  }

  test("term frequency saturates and long documents are penalized") {
    val scores = Bm25.search(corpus, "doc_id", "text", Seq("spark"), k = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc 5 ("spark", dl=1) beats doc 2 (3x spark but dl=12): length norm
    assert(scores(5L) > scores(2L))
    // tf=3 beats tf=1 at comparable length? doc 2 still beats doc 1 (dl=5, tf=1)
    assert(scores(2L) > scores(1L))
    // absent term scores zero
    assert(scores(4L) === 0.0)
  }

  test("top-k truncates with deterministic id tiebreak") {
    val got = Bm25.search(corpus, "doc_id", "text", Seq("window"), k = 2)
      .collect().map(_.getLong(0)).toSeq
    // docs 1 and 4 both contain `window` once; 4 is shorter so ranks first
    assert(got === Seq(4L, 1L))
    val zerosFirst = Bm25.search(corpus, "doc_id", "text", Seq("nosuchterm"), k = 3)
      .collect().map(_.getLong(0)).toSeq
    // all-zero scores: pure id order
    assert(zerosFirst === Seq(1L, 2L, 3L))
  }

  test("parameter validation") {
    intercept[IllegalArgumentException] {
      Bm25.search(corpus, "doc_id", "text", Seq.empty, k = 3) }
    intercept[IllegalArgumentException] {
      Bm25.search(corpus, "doc_id", "text", Seq("a", "a"), k = 3) }
    intercept[IllegalArgumentException] {
      Bm25.search(corpus, "doc_id", "text", Seq("a"), k = 0) }
  }
}
