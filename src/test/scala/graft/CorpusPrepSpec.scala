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

  test("chunk: windows cover every token exactly once modulo overlap") {
    // 95 tokens, 50-token chunks, 10 overlap (step 40) -> starts 0,40,80
    val text = (1 to 95).map(i => s"t$i").mkString(" ")
    val rows = CorpusPrep.chunk(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", chunkTokens = 50, overlap = 10)
      .orderBy("chunk_idx")
      .select("chunk_idx", "chunk_len").as[(Long, Int)].collect().toSeq
    assert(rows == Seq((0L, 50), (1L, 50), (2L, 15)), s"got $rows")
    // chunk lengths sum = n + overlap * (n_chunks - 1): full coverage,
    // each interior boundary counted twice
    assert(rows.map(_._2).sum == 95 + 10 * (rows.size - 1))
  }

  test("chunk edge cases: short doc = one chunk; empty/null docs = none") {
    val df = Seq(
      (1L, "only five little tokens here"),
      (2L, ""), (3L, null.asInstanceOf[String]),
      (4L, (1 to 50).map(_.toString).mkString(" ")) // exactly one full window
    ).toDF("doc_id", "text")
    val got = CorpusPrep.chunk(df, "doc_id", "text", 50, 10)
      .select("id", "chunk_len").as[(Long, Int)].collect().toSeq.sorted
    assert(got == Seq((1L, 5), (4L, 50)), s"got $got")
  }

  test("chunk fingerprints re-derive the original document") {
    // distinct tokens => distinct shingle fingerprints per chunk; the
    // overlap region must appear at the tail of chunk i and the head of
    // chunk i+1 (context continuity, the property training relies on)
    val toks = (1 to 90).map(i => s"w$i")
    val rows = CorpusPrep.chunk(Seq((7L, toks.mkString(" "))).toDF("doc_id", "text"),
        "doc_id", "text", 50, 10).orderBy("chunk_idx").collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def fp(s: String) = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(rows(0).getAs[String]("chunk_fp") == fp(toks.take(50).mkString(" ")))
    assert(rows(1).getAs[String]("chunk_fp") == fp(toks.slice(40, 90).mkString(" ")))
  }
}
