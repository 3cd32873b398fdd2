package graft.tools

import graft.functions.{Bpe, TextFunctions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Trains the committed BPE tokenizer artifacts:
  *
  *  - `fixtures/bpe_merges.parquet` — the rank-ordered merge table,
  *    trained on the sf0.01 documents word histogram with a BOUNDED
  *    merge budget (subword splits must actually occur; an unbounded
  *    vocab over a small fixture would memorize every word whole and
  *    degenerate into word counting);
  *  - `fixtures/bpe_words.parquet` — (word, n_bpe, toks) for every
  *    distinct word across ALL testdata scale factors, encoded with the
  *    trained table. This is the ORACLE's side of q90: DuckDB cannot
  *    replay an iterative greedy merge, but it can join exploded words
  *    against this closed vocabulary table — closed by construction
  *    over the testdata, while the Spark side encodes for real and
  *    needs no table.
  *
  * Deterministic end to end: the histogram is exact counts, training
  * ties break lexicographically ([[Bpe.train]]), and encode is greedy
  * by rank. Usage: `sbt "runMain graft.tools.BpeTrain [sfDir ...]"`.
  */
object BpeTrain {
  val NumMerges = 40

  def main(args: Array[String]): Unit = {
    val sfDirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val trainDir = sfDirs.find(_.endsWith("sf0.01")).getOrElse(sfDirs.head)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("bpe-train")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._

    def wordsOf(dir: String) = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("text").isNotNull)
      .select(explode(TextFunctions.tokens(col("text"))).as("word"))

    val histogram = wordsOf(trainDir).groupBy("word").count()
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    val merges = Bpe.train(histogram, NumMerges)
    Bpe.save(merges, spark, "fixtures/bpe_merges.parquet")

    val bpe = new Bpe(merges)
    val vocab = sfDirs.map(wordsOf).reduce(_ union _)
      .distinct().as[String].collect().sorted
    vocab.map { w =>
      val toks = bpe.encodeWord(w)
      (w, toks.length, toks.toSeq)
    }.toSeq.toDF("word", "n_bpe", "toks").coalesce(1)
      .write.mode("overwrite").parquet("fixtures/bpe_words.parquet")

    println(s"trained ${merges.size} merges on $trainDir; " +
      s"word table: ${vocab.length} words, " +
      s"multi-token: ${vocab.count(bpe.encodeWord(_).length > 1)}")
    spark.stop()
  }
}
