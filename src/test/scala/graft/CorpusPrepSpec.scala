package graft

import graft.operators.{CorpusPrep, Sampling}
import org.apache.spark.sql.functions._

/** Corpus-assembly operators: deterministic sampling and token-budget
  * packing (the q59/q60 oracles check end-to-end values; these cover
  * the branches the fixtures do not reach).
  */
class CorpusPrepSpec extends SparkSuite {
  import spark.implicits._

  test("hashSample: deterministic, partition-invariant, rate-plausible") {
    val df = spark.range(10000).toDF("id")
    val a = Sampling.hashSample(df, "id", 20).select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(df.repartition(7), "id", 20)
      .select("id").as[Long].collect().toSet
    assert(a == b, "sample membership must not depend on partitioning")
    assert(math.abs(a.size - 2000) < 150, s"got ${a.size} of ~2000")
    // distinct salts give (near-)independent samples
    val c = Sampling.hashSample(df, "id", 20, salt = "other")
      .select("id").as[Long].collect().toSet
    assert(a != c)
    val overlap = a.intersect(c).size.toDouble / a.size
    assert(overlap > 0.1 && overlap < 0.35, s"overlap $overlap vs ~0.2")
  }

  test("stratifiedHashSample applies per-stratum rates with default fallback") {
    val df = (0 until 4000).map(i => (i.toLong, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    val got = Sampling.stratifiedHashSample(df, "lang", "id",
      rates = Map("en" -> 10), defaultPct = 80)
    val byLang = got.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(math.abs(byLang("en") - 200) < 60, s"en ${byLang("en")} of ~200")
    assert(math.abs(byLang("de") - 1600) < 120, s"de ${byLang("de")} of ~1600")
  }

  test("packByBudget: inclusive prefix cut, priority order, admitFirst branch") {
    val docs = Seq(
      // lang en: priorities 9,8,7 with tokens 50,40,30 — budget 100
      // admits 9 (50) and 8 (90) but not 7 (120)
      (1L, "en", 50L, 9.0), (2L, "en", 40L, 8.0), (3L, "en", 30L, 7.0),
      // lang de: the single best doc alone exceeds the budget
      (4L, "de", 500L, 9.0), (5L, "de", 60L, 8.0))
      .toDF("doc_id", "lang", "n_tokens", "quality")
    val strict = CorpusPrep.packByBudget(docs, "lang", "quality", "doc_id",
        "n_tokens", 100L).select("doc_id").as[Long].collect().toSet
    assert(strict == Set(1L, 2L), s"strict pack got $strict")
    val lenient = CorpusPrep.packByBudget(docs, "lang", "quality", "doc_id",
        "n_tokens", 100L, admitFirst = true)
      .select("doc_id").as[Long].collect().toSet
    // de's oversized best doc is admitted; its runner-up still is not
    assert(lenient == Set(1L, 2L, 4L), s"admitFirst pack got $lenient")
  }

  test("packByBudget ties on priority break by id — deterministic membership") {
    val docs = (0 until 10).map(i => (i.toLong, "en", 10L, 1.0))
      .toDF("doc_id", "lang", "n_tokens", "quality")
    val got = CorpusPrep.packByBudget(docs, "lang", "quality", "doc_id",
        "n_tokens", 45L).select("doc_id").as[Long].collect().toSet
    assert(got == Set(0L, 1L, 2L, 3L), s"got $got") // ids 0-3 = 40 tokens
  }
}
