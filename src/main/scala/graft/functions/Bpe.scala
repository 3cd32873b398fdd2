package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Real byte-pair-encoding subword tokenizer (SURVEY §3.3 "text
  * analysis" — upgrades the regex "BPE-ish" ESTIMATE in
  * [[TextFunctions.bpeTokenCount]] to an actual trained merge table, so
  * token budgets match what a subword-tokenized LLM would see).
  *
  * Standard BPE throughout:
  *  - TRAIN ([[Bpe.train]]): start from characters; `numMerges` times,
  *    merge the adjacent symbol pair with the highest frequency-weighted
  *    count. DETERMINISTIC: ties break to the lexicographically smallest
  *    (left, right) pair — no hash-order or RNG anywhere — and training
  *    stops early when no pair repeats (count < 2). Training is
  *    driver-side over a (word, count) table by design: like any
  *    tokenizer build it runs ONCE offline over an aggregated word
  *    histogram (tiny vs the corpus — Zipf), never per job. The
  *    committed artifact is `fixtures/bpe_merges.parquet`
  *    ([[graft.tools.BpeTrain]]).
  *  - ENCODE ([[encodeWord]]): repeatedly apply the LOWEST-RANK merge
  *    present in the word (left-to-right, non-overlapping) until none
  *    applies — the exact GPT-2-style greedy encode; words are the same
  *    lowercased whitespace tokens as [[TextFunctions.tokens]], so BPE
  *    counts nest cleanly under the existing text operators.
  *
  * Executor-side shape: the merge table is a few hundred string pairs —
  * it ships in the task closure; per-executor encode results are
  * memoized in a size-capped cache (word frequencies are Zipf, so the
  * cache absorbs almost every lookup at any corpus size).
  */
final class Bpe(val merges: IndexedSeq[(String, String)]) extends Serializable {

  @transient private lazy val rank: Map[(String, String), Int] =
    merges.iterator.zipWithIndex.toMap

  private val MaxCacheEntries = 100000
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

  /** BPE tokens of one (already lowercased) word. */
  def encodeWord(word: String): Array[String] = {
    if (word.isEmpty) return Array.empty
    val hit = cache.get(word)
    if (hit != null) return hit
    var syms = word.map(_.toString).toArray
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var j = 0
      while (j < syms.length - 1) {
        val r = rank.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) bestRank = r
        j += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else syms = Bpe.applyMerge(syms, merges(bestRank))
    }
    if (cache.size < MaxCacheEntries) cache.put(word, syms)
    syms
  }

  /** BPE tokens of a text: [[TextFunctions.tokens]]' word split (lower,
    * trim, whitespace), each word encoded independently.
    */
  def encode(text: String): Array[String] =
    Bpe.words(text).flatMap(encodeWord)

  def count(text: String): Int = Bpe.words(text).map(encodeWord(_).length).sum
}

object Bpe {

  /** Null text = no words (every text operator in this repo is
    * null-safe; Spark hands null through to String-typed UDFs).
    */
  private[functions] def words(text: String): Array[String] =
    if (text == null) Array.empty
    else text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)

  /** One left-to-right non-overlapping application of merge `m`. */
  private[functions] def applyMerge(
      syms: Array[String], m: (String, String)): Array[String] = {
    val out = Array.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == m._1 && syms(j + 1) == m._2) {
        out += (m._1 + m._2)
        j += 2
      } else {
        out += syms(j)
        j += 1
      }
    }
    out.result()
  }

  /** Train a merge table from a (word, count) histogram. See class doc
    * for the determinism contract (count-desc, then lexicographic pair).
    */
  def train(wordCounts: Seq[(String, Long)], numMerges: Int): IndexedSeq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be non-negative")
    var words = wordCounts
      .map { case (w, c) => (w.map(_.toString).toArray, c) }.toVector
    val out = Vector.newBuilder[(String, String)]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          j += 1
        }
      }
      // a merge seen once compresses nothing it will ever see again —
      // stop, keeping the vocab honest about what the data supports
      val candidates = pairCounts.filter(_._2 >= 2)
      if (candidates.isEmpty) exhausted = true
      else {
        val best = candidates.toSeq
          .sortBy { case ((l, r), c) => (-c, l, r) }.head._1
        out += best
        words = words.map { case (syms, c) => (applyMerge(syms, best), c) }
        i += 1
      }
    }
    out.result()
  }

  /** Persist / load the merge table (rank-ordered parquet). */
  def save(merges: IndexedSeq[(String, String)], spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "left", "right").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  def load(spark: SparkSession, path: String): Bpe =
    new Bpe(spark.read.parquet(path).orderBy("rank").collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toIndexedSeq)

  /** Column functions. UDFs, deliberately: greedy merge application is
    * iterative per word — there is no Catalyst-expressible form — and
    * the closure ships only the small merge table. The per-executor
    * memo cache keeps the amortized cost near a hash lookup per word.
    */
  def countUdf(bpe: Bpe): UserDefinedFunction = udf((s: String) => bpe.count(s))

  def tokensUdf(bpe: Bpe): UserDefinedFunction = udf((s: String) => bpe.encode(s))

  def bpeCount(bpe: Bpe)(text: Column): Column = countUdf(bpe)(text)
  def bpeTokens(bpe: Bpe)(text: Column): Column = tokensUdf(bpe)(text)
}
