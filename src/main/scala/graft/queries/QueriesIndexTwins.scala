package graft

import graft.functions.{Distances, TextFunctions}
import graft.operators._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Query+oracle registrations: one family slice of the [[Queries]]
  * surface (split from the former monolithic Queries.scala; the
  * registry maps stay in [[Queries]]).
  */
private[graft] trait QueriesIndexTwins { this: Queries.type =>
  // ------------------------------------------------- persisted-index twins

  /** Scratch dir for the persisted-index queries: one per (tag, JVM) —
    * repeated bench passes OVERWRITE the same tree (each invocation
    * starts with a mode-overwrite save, so reuse is deterministic)
    * instead of leaking a fresh parquet index per call — and a shutdown
    * hook removes everything at JVM exit. Distinct JVMs (verify vs
    * bench) still get distinct temp trees, so concurrent runs never
    * collide.
    */
  private[graft] val scratchDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private[graft] lazy val scratchCleanup: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      scratchDirs.values.foreach { p =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(): Unit
        }
        rm(new java.io.File(p))
      }))
  private[graft] def scratchDir(tag: String): String = {
    scratchCleanup
    scratchDirs.getOrElseUpdate(tag,
      java.nio.file.Files.createTempDirectory(s"graft_$tag").toString)
  }

  /** q54's operator through the FULL persisted-index lifecycle
    * ([[IndexStore]]): build+save the corpus LSH index from part of the
    * corpus, APPEND the rest (exercising the exact-dup merge and the
    * cap-at-load design on real data), load it back, and probe the
    * incoming batch via [[Dedup.minhashLSHJoinIndexed]]. The oracle is
    * q54's — the persisted path must hash-match the inline rebuild,
    * which is exactly the append ≡ rebuild invariant at data scale.
    */
  def dedupIndexLoad(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val path = scratchDir("corpus_idx")
    IndexStore.saveCorpusIndex(
      docs.where(col("doc_id") >= 100 && col("doc_id") < 300),
      "doc_id", "text", path)
    IndexStore.appendCorpusIndex(
      docs.where(col("doc_id") >= 300), "doc_id", "text", path)
    Dedup.minhashLSHJoinIndexed(docs.where(col("doc_id") < 100),
        IndexStore.loadCorpusIndex(s, path), "doc_id", "text",
        threshold = 0.7)
      .orderBy("new_id", "corpus_id")
  }

  /** q24's ANN top-k through the persisted vector index: save the
    * sign-pattern index for part of the embedding corpus, append the
    * rest, load, and run [[Similarity.lshTopKIndexed]] with the same
    * hyperplane geometry (carried by the index meta). Oracle = q24's
    * full-algorithm DuckDB replay.
    */
  def annIndexLoad(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val path = scratchDir("vec_idx")
    IndexStore.saveVectorIndex(e.where(col("vec_id") < 400), "vec_id",
      "embedding", path, dim = 64, numBlocks = 8, planesPerBlock = 8)
    IndexStore.appendVectorIndex(e.where(col("vec_id") >= 400), "vec_id",
      "embedding", path)
    Similarity.lshTopKIndexed(IndexStore.loadVectorIndex(s, path),
        e.where(col("vec_id") < 10), "vec_id", "embedding",
        dim = 64, k = 5, numBlocks = 8, planesPerBlock = 8)
      .orderBy("query_id", "rank")
  }

  /** q55's honest nProbe=2/16 IVF through the persisted model: train the
    * coarse quantizer on the first 400 planted-cluster vectors (ample —
    * every cluster is ~25 rows even at the smallest SF, and the oracle
    * argument only needs the quantizer to keep planted clusters
    * compact), save, APPEND the remaining vectors against the frozen
    * centroids, load, search. Oracle = q55's brute-force SQL, exact by
    * the same planted-separation argument.
    */
  def ivfIndexLoad(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), clusteredVec.as("cv"))
    val path = scratchDir("ivf_idx")
    IndexStore.saveIvf(IvfIndex.build(e.where(col("vec_id") < 400),
      "vec_id", "cv", nLists = 16, trainFraction = 1.0, kmeansMaxIter = 10), path)
    IndexStore.appendIvf(e.where(col("vec_id") >= 400), "vec_id", "cv", path)
    IvfIndex.search(IndexStore.loadIvf(s, path), e,
        e.where(col("vec_id") < 10), "vec_id", "cv", k = 5, nProbe = 2)
      .orderBy("query_id", "rank")
  }
}
