package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair encoding: a real subword tokenizer (Sennrich-style word-level
  * BPE), so token budgets (packing, context-length accounting) can use the
  * statistic that actually matters instead of whitespace counts.
  *
  * Scale shape (mirrors [[graft.operators.IvfIndex.fit]]'s bounded-model
  * pattern):
  *  - [[fit]] aggregates word frequencies distributed (explode + map-side
  *    combined count — the only cluster job), keeps the top `maxWords`
  *    words (TakeOrdered), and runs the merge loop driver-side over that
  *    bounded table with incremental pair-count maintenance. Training BPE
  *    on a frequency-capped vocabulary is the standard practice — the tail
  *    barely moves pair counts.
  *  - [[BpeModel.encode]]/[[BpeModel.tokenCount]] run on executors; the
  *    merge-rank table (nMerges entries) ships once per task via broadcast
  *    closure capture, and encoding memoizes per distinct word within a
  *    partition.
  *
  * Determinism: word selection orders by (count DESC, word ASC); merge
  * ties break by (pair count DESC, left ASC, right ASC). Same corpus →
  * same merges on any partitioning.
  */
object Bpe {

  /** End-of-word marker (merges can capture word-final pieces). */
  val EOW = "</w>"

  final case class BpeModel(merges: Seq[(String, String)]) extends Serializable {

    @transient private lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** Encode one word (no whitespace) into BPE pieces; the last piece
      * carries the end-of-word marker. */
    def encodeWord(word: String): Seq[String] = {
      if (word.isEmpty) return Seq.empty
      var pieces = word.map(_.toString).toVector :+ EOW
      var done = false
      while (!done && pieces.length > 1) {
        var best = Int.MaxValue
        var bestIdx = -1
        var i = 0
        while (i < pieces.length - 1) {
          val r = ranks.getOrElse((pieces(i), pieces(i + 1)), Int.MaxValue)
          if (r < best) { best = r; bestIdx = i }
          i += 1
        }
        if (bestIdx < 0 || best == Int.MaxValue) done = true
        else pieces = (pieces.take(bestIdx) :+
          (pieces(bestIdx) + pieces(bestIdx + 1))) ++ pieces.drop(bestIdx + 2)
      }
      pieces
    }

    /** Encode a whitespace-tokenized text into pieces. */
    def encode(text: String): Seq[String] =
      text.split(" ").iterator.filter(_.nonEmpty).flatMap(encodeWord).toSeq

    /** Word→pieceCount memo, owned by THIS model (a shared per-thread
      * cache would leak counts between different models). Transient: each
      * deserialized task-side copy builds its own, which still amortizes
      * encoding to a hash lookup per word occurrence within a task —
      * corpora repeat words heavily. */
    @transient private lazy val wordMemo =
      new java.util.concurrent.ConcurrentHashMap[String, Integer]()

    /** BPE piece count per text column — executor-side, memoized per
      * distinct word. */
    def tokenCount(df: DataFrame, textCol: String,
        out: String = "bpe_tokens"): DataFrame = {
      val model = this
      val enc = udf { text: String =>
        if (text == null) 0
        else {
          var n = 0
          text.split(" ").foreach { w =>
            if (w.nonEmpty)
              n += model.wordMemo.computeIfAbsent(w,
                (key: String) => model.encodeWord(key).length)
          }
          n
        }
      }
      df.withColumn(out, enc(col(textCol)))
    }
  }

  /** Train `nMerges` BPE merges on the corpus's word-frequency table. */
  def fit(docs: DataFrame, textCol: String, nMerges: Int,
      maxWords: Int = 50000): BpeModel = {
    require(nMerges >= 0 && maxWords >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    val wordFreq: Array[(String, Long)] = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxWords)
      .as[(String, Long)].collect()

    // mutable word table: symbol sequences with counts
    val words: Array[Array[String]] =
      wordFreq.map { case (w, _) => (w.map(_.toString) :+ EOW).toArray }
    val counts: Array[Long] = wordFreq.map(_._2)

    // pair -> total count, and pair -> word indexes containing it
    val pairCount = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val pairWords = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.Set[Int]]
    def addPairsOf(wi: Int, sign: Long): Unit = {
      val syms = words(wi)
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        val nc = pairCount.getOrElse(p, 0L) + sign * counts(wi)
        if (nc <= 0L) { pairCount.remove(p); pairWords.get(p).foreach(_.remove(wi)) }
        else {
          pairCount(p) = nc
          if (sign > 0)
            pairWords.getOrElseUpdate(p,
              scala.collection.mutable.Set.empty[Int]) += wi
        }
        i += 1
      }
    }
    words.indices.foreach(addPairsOf(_, 1L))

    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var m = 0
    while (m < nMerges && pairCount.nonEmpty) {
      // deterministic argmax: count DESC, then (left, right) ASC
      val best = pairCount.iterator.reduce { (a, b) =>
        if (a._2 != b._2) { if (a._2 > b._2) a else b }
        else if (implicitly[Ordering[(String, String)]].lteq(a._1, b._1)) a else b
      }._1
      merges += best
      val affected = pairWords.getOrElse(best, Set.empty[Int]).toArray
      affected.foreach { wi =>
        addPairsOf(wi, -1L) // retract this word's pair contributions
        val syms = words(wi)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
            out += syms(i) + syms(i + 1); i += 2
          } else { out += syms(i); i += 1 }
        }
        words(wi) = out.toArray
        addPairsOf(wi, 1L) // re-add with the merged symbol
      }
      pairCount.remove(best)
      pairWords.remove(best)
      m += 1
    }
    BpeModel(merges.toSeq)
  }
}
