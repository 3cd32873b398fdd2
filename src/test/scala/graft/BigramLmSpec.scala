package graft

import graft.operators.TextAnalysis

/** Bigram LM quality score vs a hand-computed model. */
class BigramLmSpec extends SparkSuite {
  import spark.implicits._

  test("bigramLmScore: hand-computed smoothed surprisal, contracts") {
    // train (en): "a b a b" -> bigrams (a,b)x2, (b,a)x1;
    // ctx(a)=2, ctx(b)=1; V = |{a,b,x}| = 3 (the one-token doc "x"
    // contributes no bigram but IS vocabulary)
    val train = Seq((1L, "a b a b", "en"), (2L, "x", "en"))
      .toDF("id", "text", "lang")
    val score = Seq(
      (10L, "a b c", "en"),   // seen bigram + unseen continuation
      (11L, "solo", "en"),    // 1 token -> no bigram -> dropped
      (12L, "a b", "fr"),     // no fr model -> dropped
      (13L, null.asInstanceOf[String], "en")) // null text -> dropped
      .toDF("id", "text", "lang")
    val got = TextAnalysis.bigramLmScore(train, score, "id", "text", "lang")
      .as[(Long, String, Long, Long)].collect().toSet
    // term(a,b) = floor(1e6*ln((2+3)/(2+1))) = 510825
    // term(b,c) = floor(1e6*ln((1+3)/(0+1))) = 1386294
    // nll = (510825 + 1386294) div 2 = 948559
    assert(got == Set((10L, "en", 2L, 948559L)), got.toString)
  }

  test("bigramLmScore: repeated bigrams weight by tf; lower nll = more fluent") {
    val train = Seq((1L, "the cat sat on the mat the cat ran", "en"))
      .toDF("id", "text", "lang")
    val score = Seq(
      (10L, "the cat sat", "en"),       // in-distribution
      (11L, "mat ran sat cat the", "en")) // scrambled
      .toDF("id", "text", "lang")
    val rows = TextAnalysis.bigramLmScore(train, score, "id", "text", "lang")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    assert(rows(10L) < rows(11L),
      s"fluent doc must score lower surprisal: $rows")
  }
}
