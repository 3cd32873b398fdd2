package graft

import graft.operators.TextAnalysis

/** [[TextAnalysis.vocabDiff]] — corpus snapshot vocabulary drift. */
class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  test("vocabDiff: statuses, ppm shares, minDf prune on the max side") {
    val olds = Seq((1L, "apple banana"), (2L, "apple cherry"),
      (3L, "apple")).toDF("doc_id", "text")
    val news = Seq((10L, "banana banana durian"), (11L, "banana durian"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabDiff(olds, news, "doc_id", "text",
        minDf = 2L)
      .as[(String, Long, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    // apple: df 3 -> 0 over n=3/2 docs: shares 1e6 -> 0, vanished
    assert(got("apple") == ((3L, 0L, 1000000L, 0L, -1000000L, "vanished")))
    // banana: 1/3 -> 2/2: 333333 -> 1000000, grown (df counted per DOC,
    // not per occurrence: "banana banana" counts once)
    assert(got("banana") ==
      ((1L, 2L, 333333L, 1000000L, 666667L, "grown")))
    // durian: 0 -> 2, new
    assert(got("durian") == ((0L, 2L, 0L, 1000000L, 1000000L, "new")))
    // cherry: max(1, 0) < minDf -> pruned
    assert(!got.contains("cherry"), got.keys.toString)
  }

  test("greedyGenerate: argmax walk, lexicographic ties, dead-end stop") {
    // lang "en": "a b" x2, "a c" x1 -> seed = a (most frequent),
    // successor of a = b (count 2 > 1); b has no successor -> stop
    val docs = Seq(("en", "a b"), ("en", "a b"), ("en", "a c"),
      ("fr", "x y x y x")).toDF("lang", "text")
    val got = TextAnalysis.greedyGenerate(docs, "lang", "text", steps = 3)
      .as[(String, Long, String)].collect()
      .groupBy(_._1).map { case (l, rs) =>
        l -> rs.sortBy(_._2).map(_._3).toSeq }
    assert(got("en") == Seq("a", "b"), got.toString)
    // fr: x most frequent; x->y (2), y->x (2) -> alternates, full walk
    assert(got("fr") == Seq("x", "y", "x", "y"), got.toString)
  }

  test("vocabDiff: null text drops from counts and doc totals") {
    val olds = Seq((1L, "x y"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val news = Seq((3L, "x")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabDiff(olds, news, "doc_id", "text",
        minDf = 1L)
      .as[(String, Long, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r._4).toMap
    // n_a = 1 (null-text doc excluded): share of x is 1e6, not 5e5
    assert(got("x") == 1000000L, got.toString)
  }
}
