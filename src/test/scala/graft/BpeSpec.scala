package graft

import graft.functions.Bpe
import org.apache.spark.sql.functions._
import scala.util.Random

/** The trained subword tokenizer: training determinism, greedy-encode
  * correctness against an independent reference, and the committed
  * artifact pin.
  *
  * Reference implementation used below: applying the learned merges
  * SEQUENTIALLY in rank order is equivalent to the production greedy
  * lowest-rank loop — a pair involving a merged symbol can only have
  * been learned AFTER the merge that created the symbol, so no earlier-
  * rank pair can ever (re)appear once its rank has passed. Two
  * different algorithms agreeing on random inputs is the check.
  */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  private def refEncode(merges: IndexedSeq[(String, String)], word: String): Seq[String] = {
    var syms: Seq[String] = word.map(_.toString)
    merges.foreach { m =>
      val out = Seq.newBuilder[String]
      var j = 0
      while (j < syms.length) {
        if (j < syms.length - 1 && syms(j) == m._1 && syms(j + 1) == m._2) {
          out += (m._1 + m._2); j += 2
        } else { out += syms(j); j += 1 }
      }
      syms = out.result()
    }
    syms
  }

  test("training is deterministic and ties break lexicographically") {
    // 'ab' and 'cd' both occur 3 times -> first merge must be (a,b)
    val hist = Seq(("ab", 3L), ("cd", 3L), ("abe", 0L))
    val m1 = Bpe.train(hist, 2)
    assert(m1.head == ("a", "b"), s"lexicographic tie-break violated: $m1")
    assert(Bpe.train(hist, 2) == m1)
    // unseen-pair exhaustion stops early instead of padding
    assert(Bpe.train(Seq(("xy", 1L)), 10).isEmpty,
      "a pair seen once must not become a merge")
  }

  test("greedy encode equals the sequential-rank reference on random data") {
    val rnd = new Random(23)
    val alphabet = "abcde"
    def word(n: Int) = Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
    (1 to 3).foreach { trial =>
      val hist = Seq.fill(50)((word(2 + rnd.nextInt(8)), 1L + rnd.nextInt(20)))
        .groupBy(_._1).map { case (w, cs) => (w, cs.map(_._2).sum) }.toSeq.sorted
      val merges = Bpe.train(hist, 30)
      assert(merges.nonEmpty, s"trial $trial trained nothing")
      val bpe = new Bpe(merges)
      (1 to 200).map(_ => word(1 + rnd.nextInt(12))).foreach { w =>
        val got = bpe.encodeWord(w).toSeq
        assert(got == refEncode(merges, w), s"trial $trial word $w")
        assert(got.mkString == w, s"tokens must reconstruct the word: $w")
      }
    }
  }

  test("count = per-word token counts over the tokens() word split") {
    val merges = Bpe.train(Seq(("hash", 5L), ("join", 5L)), 10)
    val bpe = new Bpe(merges)
    val text = "  Hash JOIN   hash \t unknownword "
    val wordCounts = Seq("hash", "join", "hash", "unknownword")
      .map(bpe.encodeWord(_).length)
    assert(bpe.count(text) == wordCounts.sum)
    assert(bpe.encode(text).length == bpe.count(text))
    assert(bpe.count("") == 0 && bpe.count("   ") == 0)
    // null text through the UDF path (Spark passes null to String UDFs)
    assert(bpe.count(null) == 0 && bpe.encode(null).isEmpty)
    val withNull = Seq((1L, "hash join"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val counts = withNull.select(col("doc_id"),
        graft.functions.Bpe.countUdf(bpe)(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(counts(2L) == 0, "null text must count 0, not NPE the task")
  }

  test("committed artifacts are mutually consistent (merges reproduce word table)") {
    val bpe = Bpe.load(spark, "/root/repo/fixtures/bpe_merges.parquet")
    assert(bpe.merges.nonEmpty)
    val words = spark.read.parquet("/root/repo/fixtures/bpe_words.parquet")
      .select("word", "n_bpe", "toks")
      .as[(String, Int, Seq[String])].collect()
    assert(words.length >= 30, "word table must cover the fixture vocab")
    words.foreach { case (w, n, toks) =>
      val got = bpe.encodeWord(w).toSeq
      assert(got == toks && got.length == n,
        s"artifact drift for '$w': code says $got, table says $toks")
    }
    assert(words.exists(_._2 > 1),
      "the bounded vocab must actually split some words into subwords")
  }

  test("committed word table COVERS every testdata scale factor (q90 oracle closure)") {
    // q90's oracle joins exploded words against the committed vocab; a
    // word present in any SF's documents but absent from the table
    // would silently undercount on the oracle side. Closure is a data
    // property, so pin it here against the actual testdata.
    val vocab = spark.read.parquet("/root/repo/fixtures/bpe_words.parquet")
      .select("word")
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val missing = spark.read
        .parquet(s"/root/testdata/$sf/documents.parquet")
        .where(col("text").isNotNull)
        .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("word"))
        .distinct()
        .join(vocab, Seq("word"), "left_anti")
        .collect()
      assert(missing.isEmpty,
        s"$sf has words outside the committed vocab: ${missing.mkString(", ")} " +
          "— rerun graft.tools.BpeTrain")
    }
  }

  test("chunk with the BPE tokenizer: windows hold subword tokens") {
    import graft.operators.CorpusPrep
    val bpe = Bpe.load(spark, "/root/repo/fixtures/bpe_merges.parquet")
    val docs = Seq((1L, "hash join scan filter group data vector order line table"),
      (2L, "big dup fast"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = CorpusPrep.chunk(docs, "doc_id", "text", chunkTokens = 6,
        overlap = 2, tokensOf = Bpe.bpeTokens(bpe))
      .orderBy("id", "chunk_idx")
      .select("id", "chunk_idx", "chunk_len", "chunk_fp")
      .as[(Long, Long, Int, String)].collect().toSeq
    // driver-side reference over the same encode
    val want = Seq(1L, 2L).flatMap { id =>
      val toks = bpe.encode(docs.where(col("doc_id") === id)
        .select("text").as[String].head()).toSeq
      val step = 4
      val nChunks = (math.max(toks.length - 2, 1) + step - 1) / step
      (0 until nChunks).map { ci =>
        val w = toks.slice(ci * step, ci * step + 6)
        val md = java.security.MessageDigest.getInstance("MD5")
        (id, ci.toLong, w.length,
          md.digest(w.mkString(" ").getBytes("UTF-8"))
            .map("%02x".format(_)).mkString)
      }
    }
    assert(got == want, s"got $got\nwant $want")
    assert(got.exists(_._3 == 6), "full windows must exist")
  }
}
