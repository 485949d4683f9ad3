package graft

import graft.operators.AssocRules

/** AssocRules: hand-checked counts/confidence, Apriori-prune losslessness,
  * and exact threshold boundaries. */
class AssocRulesSpec extends SparkSpec {
  import spark.implicits._

  // baskets: 1:{a,b,c} 2:{a,b} 3:{a,b} 4:{a,c} 5:{b}  (a=1, b=2, c=3)
  private val facts = Seq(
    (1L, 1L), (1L, 2L), (1L, 3L),
    (2L, 1L), (2L, 2L),
    (3L, 1L), (3L, 2L),
    (4L, 1L), (4L, 3L),
    (5L, 2L)).toDF("basket", "item")

  test("frequent pairs and hand-derived confidence rules") {
    val pairs = AssocRules.frequentPairs(facts, "basket", "item", minPairCount = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs === Map((1L, 2L) -> 3L, (1L, 3L) -> 2L))
    val rules = AssocRules.rules(facts, "basket", "item",
        minPairCount = 2, minConfCenti = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // a->b 3/4=75%  b->a 3/4=75%  c->a 2/2=100%  a->c 2/4=50% (dropped)
    assert(rules === Map(
      (1L, 2L) -> ((3L, 4L, 4L, 5L)),
      (2L, 1L) -> ((3L, 4L, 4L, 5L)),
      (3L, 1L) -> ((2L, 2L, 4L, 5L))))
  }

  test("duplicate (basket, item) facts do not inflate counts") {
    val noisy = facts.union(facts).union(facts)
    val a = AssocRules.rules(facts, "basket", "item", 2, 60)
      .orderBy("antecedent", "consequent").collect().toSeq
    val b = AssocRules.rules(noisy, "basket", "item", 2, 60)
      .orderBy("antecedent", "consequent").collect().toSeq
    assert(a === b)
  }

  test("apriori pruning is lossless vs unpruned pair counting") {
    val es = (for (i <- 0 until 500) yield {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"mb:$i".getBytes("UTF-8"))
      val basket = ((h(0) & 0xff).toLong * 256 + (h(1) & 0xff)) % 80
      val item = ((h(2) & 0xff).toLong * 256 + (h(3) & 0xff)) % 30
      (basket, item)
    }).toDF("basket", "item")
    val pruned = AssocRules.frequentPairs(es, "basket", "item", 3)
      .orderBy("item_a", "item_b").collect().toSeq
    // unpruned reference: count all pairs, filter at the end
    val b = es.distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byBasket = b.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val counts = scala.collection.mutable.Map.empty[(Long, Long), Long]
      .withDefaultValue(0L)
    byBasket.values.foreach { items =>
      for { x <- items; y <- items if x < y } counts((x, y)) += 1
    }
    val naive = counts.filter(_._2 >= 3).toSeq.sortBy(_._1)
    assert(pruned.map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))) === naive)
    assert(naive.nonEmpty, "generated baskets must contain frequent pairs")
  }

  test("confidence boundary: exact threshold kept, below dropped") {
    // a->c confidence exactly 50%
    val at50 = AssocRules.rules(facts, "basket", "item", 2, 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(at50.contains((1L, 3L)), "conf == threshold must be kept")
    val at51 = AssocRules.rules(facts, "basket", "item", 2, 51)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!at51.contains((1L, 3L)))
  }

  test("parameter validation") {
    intercept[IllegalArgumentException] {
      AssocRules.frequentPairs(facts, "basket", "item", 0)
    }
    intercept[IllegalArgumentException] {
      AssocRules.rules(facts, "basket", "item", 2, 101)
    }
  }
}
