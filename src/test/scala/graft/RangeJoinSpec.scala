package graft

import graft.operators.{RangeJoin, TextAnalysis}

/** Range-join window semantics and TF-IDF vs hand-computed values. */
class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  test("countInWindow: half-open (lt-w, lt], cross-bucket, zero-count rows kept") {
    val left = Seq((1L, 100L, 10L), (1L, 250L, 11L), (2L, 100L, 12L))
      .toDF("k", "t", "id")
    val right = Seq(
      (1L, 100L), // == lt of left 10 -> inclusive
      (1L, 1L),   // lt - w < 1? 100-100=0 < 1 -> in range for left 10
      (1L, 0L),   // exactly lt - w -> EXCLUDED (half-open)
      (1L, 200L), // in (150, 250] for left 11
      (3L, 100L)  // other key
    ).toDF("k", "t")
    val got = RangeJoin.countInWindow(left, right, "k", "t", "id", windowSize = 100L)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 2L, 11L -> 1L, 12L -> 0L))
  }

  test("tfidf: counts and smoothed idf match hand computation") {
    val docs = Seq((1L, "apple banana apple"), (2L, "banana cherry")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidf(docs, "doc_id", "text")
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // N=2; df(apple)=1, df(banana)=2, df(cherry)=1
    def idf(df: Long) = math.log(3.0 / (df + 1.0)) + 1.0
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got((1L, "apple")) == (2L, 1L, r6(2 * idf(1))))
    assert(got((1L, "banana")) == (1L, 2L, r6(1 * idf(2))))
    assert(got((2L, "cherry")) == (1L, 1L, r6(1 * idf(1))))
  }

  test("topTerms: deterministic rank by (tfidf desc, term asc)") {
    val docs = Seq((1L, "x y z x y x")).toDF("doc_id", "text")
    val got = TextAnalysis.topTerms(docs, "doc_id", "text", 2)
      .orderBy("rnk").as[(Long, Int, String, Long, Double)].collect()
    assert(got.map(_._3).toSeq == Seq("x", "y")) // tf 3 > 2 > 1
  }

  test("bm25TopK: e6 scores replay the formula; rank by (score desc, doc asc)") {
    val docs = Seq((1L, "apple banana apple"), (2L, "banana cherry"),
      (3L, "durian durian banana")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, "doc_id", "text",
        Seq(1L -> "apple banana", 2L -> "cherry"), 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // N=3, dl = (3, 2, 3), avgdl = 8/3; df: apple 1, banana 3, cherry 1
    val avgdl = 8.0 / 3
    def idf(df: Long) = math.log(1.0 + (3 - df + 0.5) / (df + 0.5))
    def e6(df: Long, tf: Long, dl: Long): Long =
      math.floor(idf(df) * ((tf * (1.2 + 1.0)) /
        (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))) * 1000000.0).toLong
    assert(got((1L, 1L)) == (1L, e6(1, 2, 3) + e6(3, 1, 3))) // both terms hit
    assert(got((1L, 2L)) == (2L, e6(3, 1, 2))) // shorter doc outranks d3...
    assert(got((1L, 3L)) == (3L, e6(3, 1, 3))) // ...on the same shared term
    assert(got((2L, 1L)) == (2L, e6(1, 1, 2)))
    assert(!got.contains((2L, 2L))) // cherry appears in one doc only
  }

  test("pmiPairs: doc-level counts, minDf prune, outlier-doc skip") {
    // df: a=4, b=3, c=2, x=1; N=4; d3 keeps 3 vocab terms
    val docs = Seq((1L, "a b"), (2L, "a b a"), (3L, "a b c"),
      (4L, "c a x")).toDF("doc_id", "text")
    val keepAll = TextAnalysis.pmiPairs(docs, "doc_id", "text",
        minDf = 2, maxTermsPerDoc = 10)
      .orderBy("term_a", "term_b")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    def pmi(nab: Long, na: Long, nb: Long, n: Long): Long =
      math.floor(math.log((nab * n).toDouble / (na * nb).toDouble)
        * 1000000.0).toLong
    assert(keepAll == Seq(
      ("a", "b", 4L, 3L, 3L, pmi(3, 4, 3, 4)),
      ("a", "c", 4L, 2L, 2L, pmi(2, 4, 2, 4))))
    // with maxTermsPerDoc=2, d3 (3 kept terms) drops out of PAIRING but
    // still counts toward df/N; (a,c) falls under minDf and vanishes
    val capped = TextAnalysis.pmiPairs(docs, "doc_id", "text",
        minDf = 2, maxTermsPerDoc = 2)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(capped == Seq(("a", "b", 4L, 3L, 2L, pmi(2, 4, 3, 4))))
  }
}
