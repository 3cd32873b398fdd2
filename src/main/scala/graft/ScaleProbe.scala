package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

/** 10×-bench-scale stress probe (50k docs / 20k vectors with planted
  * 10-member near-dup families) — empirical check that the dedup/ANN
  * paths scale linearly-ish and the skew guards hold. Not part of the
  * driver gates; run manually: `sbt "runMain graft.ScaleProbe <dir>"`.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/scale10"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: $n rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    time("minhashLSH(0.7) @50k docs")(
      Dedup.minhashLSH(docs, "doc_id", "text", threshold = 0.7).count())
    time("ngramJaccard(0.5) @50k docs")(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5).count())
    time("simhashPairs(3) @50k docs")(
      Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3).count())
    time("dedupGroups @50k docs")(
      Dedup.connectedComponents(
        Dedup.minhashLSH(docs, "doc_id", "text", threshold = 0.7)).count())
    time("cosineNearDup(0.9) @20k vecs")(
      Similarity.cosineNearDupPairs(embs, "vec_id", "embedding",
        dim = 64, threshold = 0.9, numBlocks = 16, planesPerBlock = 4).count())
    time("lshTopK @20k corpus")(
      Similarity.lshTopK(embs, embs.where(col("vec_id") < 10),
        "vec_id", "embedding", dim = 64, k = 5).count())
    time("bruteTopK @20k corpus")(
      Similarity.bruteForceTopK(embs, embs.where(col("vec_id") < 10),
        "vec_id", "embedding", 5).count())
    val ivf = IvfIndex.build(embs, "vec_id", "embedding", nLists = 64)
    time("ivfSearch @20k corpus")(
      IvfIndex.search(ivf, embs, embs.where(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nProbe = 8).count())
    time("kmodes fit @50k docs")(
      { val df = docs.select(KModes.assemble(col("lang"), col("source"),
          floor(col("n_chars") / 100).cast("int")).as("features"))
        val m = new KModes().setK(8).setMaxIter(10).setSeed(42L).fit(df)
        m.transform(df).groupBy("prediction").count().count() })
    spark.stop()
  }
}
