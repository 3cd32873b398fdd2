package graft

import graft.operators.Retrieval

/** RRF fusion vs hand-computed floor-e6 reciprocal-rank sums. */
class RetrievalSpec extends SparkSuite {
  import spark.implicits._

  // ranker A: q1 -> [10, 11, 12]; ranker B: q1 -> [11, 13]
  private def rankA =
    Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
      .toDF("query_id", "doc_id", "rnk")
  private def rankB =
    Seq((1L, 11L, 1L), (1L, 13L, 2L)).toDF("query_id", "doc_id", "rnk")

  test("rrfFuse: doc in both lists sums both reciprocal ranks") {
    val got = Retrieval.rrfFuse(Seq(rankA, rankB), k0 = 60, topK = 10)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._3 -> r).toMap
    // doc 11: 1e6 div 62 + 1e6 div 61 = 16129 + 16393 = 32522, 2 rankers
    assert(got(11L) == (1L, 1L, 11L, 32522L, 2L))
    // doc 10: 1e6 div 61 = 16393, 1 ranker — rank 2
    assert(got(10L) == (1L, 2L, 10L, 16393L, 1L))
    // doc 13: 1e6 div 62 = 16129 beats doc 12's 1e6 div 63 = 15873
    assert(got(13L) == (1L, 3L, 13L, 16129L, 1L))
    assert(got(12L) == (1L, 4L, 12L, 15873L, 1L))
  }

  test("rrfFuse: equal scores tie-break by doc_id ascending") {
    // two docs each rank 1 in exactly one ranker -> identical rrf_e6
    val a = Seq((1L, 20L, 1L)).toDF("query_id", "doc_id", "rnk")
    val b = Seq((1L, 7L, 1L)).toDF("query_id", "doc_id", "rnk")
    val got = Retrieval.rrfFuse(Seq(a, b), k0 = 60, topK = 2)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(got.map(_._3).toSeq == Seq(7L, 20L))
    assert(got.forall(_._4 == 1000000L / 61))
  }

  test("evalMetrics: hand-computed recall/MRR/nDCG; unretrieved relevance counts") {
    val rankings = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
      .toDF("query_id", "doc_id", "rnk")
    // doc 11 retrieved and relevant (grade 2); doc 99 relevant but missed
    val relevance = Seq((1L, 11L, 2L), (1L, 99L, 1L))
      .toDF("query_id", "doc_id", "rel")
    val got = Retrieval.evalMetrics(rankings, relevance, k = 3).collect()
    assert(got.length == 1)
    val r = got.head
    def term(rel: Long, rank: Long): Long =
      math.floor(rel.toDouble / (math.log(rank.toDouble + 1.0) /
        math.log(2.0)) * 1e6).toLong
    val dcg = term(2, 2)
    val idcg = term(2, 1) + term(1, 2)
    assert(r.getAs[Long]("n_relevant") == 2 &&
      r.getAs[Long]("n_retrieved") == 3 && r.getAs[Long]("hits") == 1)
    assert(r.getAs[Long]("recall_ppm") == 500000L)
    assert(r.getAs[Long]("mrr_e6") == 500000L)
    assert(r.getAs[Long]("dcg_e6") == dcg, s"dcg ${r.getAs[Long]("dcg_e6")} vs $dcg")
    assert(r.getAs[Long]("idcg_e6") == idcg)
    assert(r.getAs[Long]("ndcg_ppm") == dcg * 1000000L / idcg)
    // a query with rankings but no relevance: zeroed metrics, null ratios
    val none = Retrieval.evalMetrics(rankings,
      relevance.limit(0), k = 3).collect().head
    assert(none.getAs[Long]("n_relevant") == 0 &&
      none.isNullAt(none.fieldIndex("recall_ppm")) &&
      none.isNullAt(none.fieldIndex("mrr_e6")))
  }

  test("rrfFuse: topK truncates the fused list, not the inputs") {
    val got = Retrieval.rrfFuse(Seq(rankA, rankB), k0 = 60, topK = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == 2 && got.map(_._3).toSet == Set(11L, 10L))
  }
}
