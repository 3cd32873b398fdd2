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

  /** The dilution construction shared by the corpus/text ingest
    * fixtures (q253/q255/q257/q258): text + 2× its token count of
    * doc-unique `<prefix><id>x<i>` filler tokens. Two structural
    * properties, one per screen family: it caps jaccard between ANY
    * two distinct constructed texts at ≈ 1/3 while exact copies stay
    * at 1.0 with identical minhash signatures (LSH candidacy certain —
    * the corpus rounds' determinism), and it gives BM25 self-matches
    * ≥ 2n df=1 filler terms (≥ 150M e6 probed vs ≤ 11.1M cross — the
    * text rounds' threshold margin). Mirrored CTE-for-CTE by the
    * oracles' `dil`/[[textDilSql]] expressions.
    */
  private def dilutedText(prefix: String) = concat(col("text"), lit(" "),
    concat_ws(" ", transform(
      sequence(lit(1), size(TextFunctions.tokens(col("text"))) * 2),
      i => concat(lit(prefix), col("doc_id").cast("string"), lit("x"),
        i.cast("string")))))

  /** The shared fixture: cc-diluted corpus over base docs [100, 300)
    * (non-null text, ≥ 10 tokens; checkpointed — reused by the index
    * build and the batch-even copies) plus the head batch at
    * `doc_id + off`: evens = exact corpus copies, odds = fresh
    * zz-diluted texts.
    */
  private def dilutionFixture(
      s: SparkSession, dir: String, off: Int): (DataFrame, DataFrame) = {
    val base = t(s, dir, "documents")
      .where(col("doc_id") >= 100 && col("doc_id") < 300 &&
        col("text").isNotNull &&
        size(TextFunctions.tokens(col("text"))) >= 10)
      .select(col("doc_id"), col("text"))
    val corpus = base.select(col("doc_id"), dilutedText("cc").as("text"))
      .localCheckpoint(true)
    val evens = corpus
      .where(col("doc_id") < 200 && pmod(col("doc_id"), lit(2)) === 0)
      .select((col("doc_id") + off).as("doc_id"), col("text"))
    val odds = base
      .where(col("doc_id") < 200 && pmod(col("doc_id"), lit(2)) === 1)
      .select((col("doc_id") + off).as("doc_id"), col("text"))
      .select(col("doc_id"), dilutedText("zz").as("text"))
    (corpus, evens.unionByName(odds))
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

  /** q247: cosine THRESHOLD screen through the persisted vector index
    * — [[Similarity.cosineJoinIndexed]], the embedding member of the
    * indexed-screen family (q84 MinHash text, q245 perceptual media,
    * this one semantic) and the batch twin of the
    * [[graft.streaming.StreamOps.vectorGateIndexed]] admission gate:
    * save the sign-pattern index for part of the planted-cluster
    * corpus ([[clusteredVec]] — same-cluster cos ≈ 0.99, cross ≤ 0.5),
    * append the rest, load, and emit EVERY corpus match at cos ≥ 0.9
    * for a 50-vector batch: each batch vector surfaces its own corpus
    * copy at cos 1.0 (the re-ingest check — no self-exclusion) plus
    * its entire planted cluster at ≈ 0.99, and nothing cross-cluster. Oracle: the q24 full-algorithm replay at the
    * q25 recall geometry (16 blocks × 4 planes; hyperplane literals →
    * sign blocks → bucket join → cosine), with the ranked top-k tail
    * swapped for the threshold filter; exact
    * because no bucket can exceed the 10000 cap at verify SF and sign
    * agreement across engines is a one-in-~1e13 |dot| < ulp event.
    */
  def vectorScreenIndexed(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), clusteredVec.as("cv"))
    val path = scratchDir("vec_screen_idx")
    IndexStore.saveVectorIndex(e.where(col("vec_id") < 400), "vec_id",
      "cv", path, dim = 32, numBlocks = 16, planesPerBlock = 4)
    IndexStore.appendVectorIndex(e.where(col("vec_id") >= 400), "vec_id",
      "cv", path)
    Similarity.cosineJoinIndexed(IndexStore.loadVectorIndex(s, path),
        e.where(col("vec_id") < 50), "vec_id", "cv",
        dim = 32, threshold = 0.9, numBlocks = 16, planesPerBlock = 4)
      .orderBy("new_id", "corpus_id")
  }

  val vectorScreenIndexedSql: String =
    s"""${annSigPrefix(16, 4, dim = 32, vecSql = clusteredVecSql)},
       |q AS (SELECT vec_id, block_idx, band_hash FROM sig
       |  WHERE vec_id < 50),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS new_id, c.vec_id AS corpus_id
       |  FROM q JOIN sig c
       |    ON q.block_idx = c.block_idx AND q.band_hash = c.band_hash),
       |scored AS (
       |  SELECT cand.new_id, cand.corpus_id,
       |    COALESCE(list_dot_product(qe.v, ce.v) /
       |      (sqrt(list_dot_product(qe.v, qe.v)) *
       |       sqrt(list_dot_product(ce.v, ce.v))), 0.0) AS cos
       |  FROM cand JOIN e qe ON qe.vec_id = cand.new_id
       |            JOIN e ce ON ce.vec_id = cand.corpus_id)
       |SELECT new_id, corpus_id, round(cos, 6) AS cos
       |FROM scored WHERE cos >= 0.9
       |ORDER BY new_id, corpus_id""".stripMargin

  /** q250: TWO INGEST ROUNDS through the persisted vector index
    * ([[IndexStore.ingestVector]]) — the semantic sibling of q248's
    * media ingest loop, on the planted-cluster fixture: corpus = even
    * clusters below vec_id 300; ingest 1 = [300, 400) (even clusters
    * reject against the corpus at cos ≈ 0.99, odd clusters are
    * admitted); ingest 2 = [400, 500) (every vector is a duplicate —
    * the odd-cluster ones ONLY against ingest 1's admissions). The
    * oracle replays both rounds at full algorithm depth: sign blocks
    * from the hyperplane literals, candidate buckets, unrounded-cos
    * thresholding, best-match ordering on the rounded cos, the
    * admitted set, and the round-2 rescreen against
    * corpus ∪ admissions.
    */
  def vectorIngestRounds(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), clusteredVec.as("cv"))
    val path = scratchDir("vec_ingest")
    IndexStore.saveVectorIndex(
      e.where(col("vec_id") < 300 && pmod(col("vec_id"), lit(16)) % 2 === 0),
      "vec_id", "cv", path, dim = 32, numBlocks = 16, planesPerBlock = 4)
    val v1 = IndexStore.ingestVector(
        e.where(col("vec_id") >= 300 && col("vec_id") < 400),
        "vec_id", "cv", path, threshold = 0.9)
      .withColumn("ingest", lit(1))
    val v2 = IndexStore.ingestVector(
        e.where(col("vec_id") >= 400 && col("vec_id") < 500),
        "vec_id", "cv", path, threshold = 0.9)
      .withColumn("ingest", lit(2))
    v1.unionByName(v2)
      .select(col("ingest"), col("vec_id"), col("status"),
        col("n_matches"), col("best_corpus_id"), col("best_cos"))
      .orderBy("vec_id")
  }

  val vectorIngestRoundsSql: String = {
    val cosOf = (q: String, c: String) =>
      s"""COALESCE(list_dot_product($q.v, $c.v) /
         |      (sqrt(list_dot_product($q.v, $q.v)) *
         |       sqrt(list_dot_product($c.v, $c.v))), 0.0)""".stripMargin
    s"""${annSigPrefix(16, 4, dim = 32, vecSql = clusteredVecSql)},
       |corpus AS (SELECT vec_id FROM e
       |  WHERE vec_id < 300 AND (vec_id % 16) % 2 = 0),
       |i1 AS (SELECT vec_id FROM e WHERE vec_id >= 300 AND vec_id < 400),
       |i2 AS (SELECT vec_id FROM e WHERE vec_id >= 400 AND vec_id < 500),
       |cand1 AS (SELECT DISTINCT q.vec_id AS new_id, c.vec_id AS corpus_id
       |  FROM sig q JOIN sig c
       |    ON q.block_idx = c.block_idx AND q.band_hash = c.band_hash
       |  WHERE q.vec_id IN (SELECT vec_id FROM i1)
       |    AND c.vec_id IN (SELECT vec_id FROM corpus)),
       |m1 AS (SELECT cand1.new_id, cand1.corpus_id,
       |    round(${cosOf("qe", "ce")}, 6) AS cos
       |  FROM cand1 JOIN e qe ON qe.vec_id = cand1.new_id
       |             JOIN e ce ON ce.vec_id = cand1.corpus_id
       |  WHERE ${cosOf("qe", "ce")} >= 0.9),
       |r1 AS (SELECT new_id, corpus_id, cos,
       |    row_number() OVER (PARTITION BY new_id
       |                       ORDER BY cos DESC, corpus_id ASC) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY new_id) AS BIGINT) AS n
       |  FROM m1),
       |b1 AS (SELECT new_id, corpus_id AS best_corpus_id, cos AS best_cos,
       |    n FROM r1 WHERE rn = 1),
       |v1 AS (SELECT i1.vec_id,
       |    CASE WHEN b.new_id IS NULL THEN 'admitted'
       |         ELSE 'duplicate' END AS status,
       |    COALESCE(b.n, 0) AS n_matches, b.best_corpus_id, b.best_cos
       |  FROM i1 LEFT JOIN b1 b ON b.new_id = i1.vec_id),
       |idx2 AS (SELECT vec_id FROM corpus
       |  UNION ALL
       |  SELECT vec_id FROM v1 WHERE status = 'admitted'),
       |cand2 AS (SELECT DISTINCT q.vec_id AS new_id, c.vec_id AS corpus_id
       |  FROM sig q JOIN sig c
       |    ON q.block_idx = c.block_idx AND q.band_hash = c.band_hash
       |  WHERE q.vec_id IN (SELECT vec_id FROM i2)
       |    AND c.vec_id IN (SELECT vec_id FROM idx2)),
       |m2 AS (SELECT cand2.new_id, cand2.corpus_id,
       |    round(${cosOf("qe", "ce")}, 6) AS cos
       |  FROM cand2 JOIN e qe ON qe.vec_id = cand2.new_id
       |             JOIN e ce ON ce.vec_id = cand2.corpus_id
       |  WHERE ${cosOf("qe", "ce")} >= 0.9),
       |r2 AS (SELECT new_id, corpus_id, cos,
       |    row_number() OVER (PARTITION BY new_id
       |                       ORDER BY cos DESC, corpus_id ASC) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY new_id) AS BIGINT) AS n
       |  FROM m2),
       |b2 AS (SELECT new_id, corpus_id AS best_corpus_id, cos AS best_cos,
       |    n FROM r2 WHERE rn = 1),
       |v2 AS (SELECT i2.vec_id,
       |    CASE WHEN b.new_id IS NULL THEN 'admitted'
       |         ELSE 'duplicate' END AS status,
       |    COALESCE(b.n, 0) AS n_matches, b.best_corpus_id, b.best_cos
       |  FROM i2 LEFT JOIN b2 b ON b.new_id = i2.vec_id)
       |SELECT CAST(1 AS INT) AS ingest, vec_id, status, n_matches,
       |  best_corpus_id, best_cos FROM v1
       |UNION ALL
       |SELECT CAST(2 AS INT) AS ingest, vec_id, status, n_matches,
       |  best_corpus_id, best_cos FROM v2
       |ORDER BY vec_id""".stripMargin
  }

  /** q245: the PERCEPTUAL media index through its full persisted
    * lifecycle — the q241 hash family operated the way a 100 TB ingest
    * actually runs: decode each corpus slice ONCE, persist the 64-bit
    * dHashes with their pigeonhole band keys
    * ([[IndexStore.saveMediaIndex]]), append the next ingest slice
    * (pure parquet appends, novel signatures only grow the band
    * table), then screen a new batch against the LOADED index
    * ([[Dedup.hammingJoinIndexed]]) — corpus assets are never decoded
    * or rehashed again. Fixture: the q241 dHash classes; corpus =
    * docs 100+ (saved [100, 300), appended [300, ∞)), batch = docs
    * < 100 — every batch asset is a re-encoded copy of some corpus
    * class, so each must surface ALL its corpus-side copies at
    * hamming 0 and nothing else (cross classes hold the ≥ 5-bit
    * margin). Oracle: hashes join from the committed dhash golden
    * table on both sides, then the screen replays as the plain
    * batch × corpus Hamming join — append ≡ rebuild by construction,
    * so persistence adds nothing the SQL has to model.
    */
  def mediaIndexLoad(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // checkpointed: save, append, and probe each take a slice of this
    // frame — lazy, the per-asset decode would run once per lifecycle
    // stage; materialized, the whole corpus decodes exactly once
    val hashes = t(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap { id =>
        Multimodal.dhash64(Fixtures.dhashAssetFor(id).media)
          .map(dh => (id, dh))
      }).toDF("doc_id", "dh")
      .localCheckpoint(true)
    val path = scratchDir("media_idx")
    IndexStore.saveMediaIndex(
      hashes.where(col("doc_id") >= 100 && col("doc_id") < 300),
      "doc_id", "dh", path)
    IndexStore.appendMediaIndex(hashes.where(col("doc_id") >= 300),
      "doc_id", "dh", path)
    Dedup.hammingJoinIndexed(hashes.where(col("doc_id") < 100),
        IndexStore.loadMediaIndex(s, path), "doc_id", "dh")
      .orderBy("new_id", "corpus_id")
  }

  val mediaIndexLoadSql: String =
    s"""WITH d AS (SELECT doc_id, doc_id % ${Fixtures.DhashClasses} AS gid,
       |    CAST((doc_id // ${Fixtures.DhashClasses}) % 2 AS INT) AS variant
       |  FROM documents),
       |g AS (SELECT * FROM read_parquet(
       |        '/root/repo/fixtures/dhash_golden.parquet/*.parquet')),
       |h AS (SELECT d.doc_id, g.dh FROM d
       |  JOIN g ON g.gid = d.gid AND g.variant = d.variant)
       |SELECT b.doc_id AS new_id, c.doc_id AS corpus_id,
       |  CAST(bit_count(xor(b.dh, c.dh)) AS INT) AS hamming
       |FROM h b JOIN h c
       |  ON b.doc_id < 100 AND c.doc_id >= 100
       |  AND bit_count(xor(b.dh, c.dh)) <= 3
       |ORDER BY new_id, corpus_id""".stripMargin

  /** q248: TWO INGEST ROUNDS through the persisted media index
    * ([[IndexStore.ingestMedia]]) — the full production loop: screen →
    * reject duplicates → append admissions → repeat, with the second
    * round's duplicates proving the index GREW. Fixture: corpus = even
    * dHash classes below id 280; ingest 1 = ids [280, 390) (one asset
    * per class: even classes reject against the corpus, odd classes
    * are novel and admitted); ingest 2 = ids [390, 500) (same class
    * sweep at the other JPEG quality — every asset is a duplicate, but
    * the odd-class ones match ONLY ingest 1's admissions: cross-batch
    * dedup through the growing index, never a corpus rescan). The
    * oracle replays both rounds from the committed golden table —
    * round-1 verdicts, the admitted set, and round-2 verdicts against
    * corpus ∪ admissions — so the index lifecycle must be transparent
    * (ingest ≡ replay) for the hashes to match.
    */
  def mediaIngestRounds(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // fixed [0, 500) slice at every SF: the round structure (which
    // classes are where) is the fixture, not the corpus size; scale
    // behavior of this path is probed in ScaleProbe's r9 rows
    val hashes = t(s, dir, "documents").select(col("doc_id")).as[Long]
      .filter((id: Long) => id < 500)
      .mapPartitions(_.flatMap { id =>
        Multimodal.dhash64(Fixtures.dhashAssetFor(id).media)
          .map(dh => (id, dh))
      }).toDF("doc_id", "dh")
      .localCheckpoint(true)
    val path = scratchDir("media_ingest")
    IndexStore.saveMediaIndex(
      hashes.where(col("doc_id") < 280 &&
        pmod(pmod(col("doc_id"), lit(Fixtures.DhashClasses)), lit(2)) === 0),
      "doc_id", "dh", path)
    val v1 = IndexStore.ingestMedia(
        hashes.where(col("doc_id") >= 280 && col("doc_id") < 390),
        "doc_id", "dh", path)
      .withColumn("ingest", lit(1))
    val v2 = IndexStore.ingestMedia(hashes.where(col("doc_id") >= 390),
        "doc_id", "dh", path)
      .withColumn("ingest", lit(2))
    v1.unionByName(v2)
      .select(col("ingest"), col("asset_id"), col("status"),
        col("n_matches"), col("best_corpus_id"), col("best_hamming"))
      .orderBy("asset_id")
  }

  /** q253: TWO INGEST ROUNDS through the persisted CORPUS (MinHash-LSH)
    * index — the lexical member of the ingest-round family finally
    * oracled end to end. The raw documents table is too densely
    * self-similar for this (at jaccard ≥ 0.6 nearly every slice has
    * cross-slice partners whose LSH candidacy is probabilistic — the
    * round-9 finding), so the fixture DILUTES: every corpus doc is a
    * real document's text plus 2× its token count of doc-unique filler
    * tokens, which caps jaccard between ANY two distinct constructed
    * texts at ≈ 1/3 (shared base shingles over a 5×-ish union) while
    * exact copies stay at jaccard 1.0 — and an exact copy has the
    * IDENTICAL minhash signature, so its candidacy is certain, not
    * banded luck. Every ≥-0.7 pair in the construction is therefore an
    * exact-text pair: the verdict is deterministic and the DuckDB
    * oracle replays the construction plus brute-force exact jaccard.
    * Round 1: even-base batch docs are exact corpus copies (rejected,
    * n_matches 1, best_jaccard 1.0), odd-base docs are fresh dilutions
    * (admitted). Round 2: exact copies of round 1's ADMISSIONS — every
    * one rejected against a doc that was not in the corpus when the
    * query started: cross-batch growth through the persisted index,
    * proven by hash.
    */
  def corpusIngestRounds(s: SparkSession, dir: String): DataFrame = {
    val (corpus, heads) = dilutionFixture(s, dir, off = 200)
    val path = scratchDir("corpus_ingest_rounds")
    IndexStore.saveCorpusIndex(corpus, "doc_id", "text", path)
    val batch1 = heads.localCheckpoint(true)
    val v1 = IndexStore.ingestCorpus(batch1, "doc_id", "text", path,
      threshold = 0.7).withColumn("ingest", lit(1))
    val batch2 = batch1
      .join(v1.where(col("status") === "admitted").select("doc_id"),
        Seq("doc_id"))
      .select((col("doc_id") + 200).as("doc_id"), col("text"))
    val v2 = IndexStore.ingestCorpus(batch2, "doc_id", "text", path,
      threshold = 0.7).withColumn("ingest", lit(2))
    v1.unionByName(v2)
      .select(col("ingest"), col("doc_id"), col("status"),
        col("n_matches"), col("best_corpus_id"), col("best_jaccard"))
      .orderBy("doc_id")
  }

  val corpusIngestRoundsSql: String = {
    def dil(prefix: String, idExpr: String): String =
      s"""array_to_string(['$prefix' || CAST($idExpr AS VARCHAR) || 'x' ||
         |      CAST(i AS VARCHAR) for i in range(1, 2 * len(toks) + 1)], ' ')"""
        .stripMargin
    val toksOf = duckToks
    val shOf = duckShingles
    s"""WITH base AS (
       |  SELECT doc_id, text, $toksOf AS toks FROM documents
       |  WHERE doc_id >= 100 AND doc_id < 300 AND text IS NOT NULL),
       |base10 AS (SELECT * FROM base WHERE len(toks) >= 10),
       |corpus AS (SELECT doc_id,
       |    text || ' ' || ${dil("cc", "doc_id")} AS text
       |  FROM base10),
       |evens AS (SELECT doc_id + 200 AS doc_id, text FROM corpus
       |  WHERE doc_id < 200 AND doc_id % 2 = 0),
       |odds AS (SELECT doc_id + 200 AS doc_id,
       |    text || ' ' || ${dil("zz", "doc_id + 200")} AS text
       |  FROM base10 WHERE doc_id < 200 AND doc_id % 2 = 1),
       |b1 AS (SELECT * FROM evens UNION ALL SELECT * FROM odds),
       |csh AS (SELECT doc_id, $shOf AS sh
       |  FROM (SELECT doc_id, $toksOf AS toks FROM corpus)),
       |b1sh AS (SELECT doc_id, $shOf AS sh
       |  FROM (SELECT doc_id, $toksOf AS toks FROM b1)),
       |m1 AS (SELECT * FROM (
       |    SELECT b.doc_id AS doc_id, c.doc_id AS corpus_id,
       |      round(CAST(len(list_intersect(b.sh, c.sh)) AS DOUBLE) /
       |            len(list_distinct(list_concat(b.sh, c.sh))), 4) AS jaccard
       |    FROM b1sh b JOIN csh c ON true)
       |  WHERE jaccard >= 0.7),
       |r1 AS (SELECT doc_id, corpus_id, jaccard,
       |    row_number() OVER (PARTITION BY doc_id
       |                       ORDER BY jaccard DESC, corpus_id) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n
       |  FROM m1),
       |best1 AS (SELECT doc_id, corpus_id AS best_corpus_id,
       |    jaccard AS best_jaccard, n FROM r1 WHERE rn = 1),
       |v1 AS (SELECT b.doc_id,
       |    CASE WHEN best1.doc_id IS NULL THEN 'admitted'
       |         ELSE 'duplicate' END AS status,
       |    COALESCE(best1.n, 0) AS n_matches, best1.best_corpus_id,
       |    best1.best_jaccard
       |  FROM b1 b LEFT JOIN best1 ON best1.doc_id = b.doc_id),
       |idx2 AS (SELECT * FROM csh
       |  UNION ALL
       |  SELECT doc_id, sh FROM b1sh WHERE doc_id IN
       |    (SELECT doc_id FROM v1 WHERE status = 'admitted')),
       |b2sh AS (SELECT doc_id + 200 AS doc_id, sh FROM b1sh
       |  WHERE doc_id IN (SELECT doc_id FROM v1 WHERE status = 'admitted')),
       |m2 AS (SELECT * FROM (
       |    SELECT b.doc_id AS doc_id, c.doc_id AS corpus_id,
       |      round(CAST(len(list_intersect(b.sh, c.sh)) AS DOUBLE) /
       |            len(list_distinct(list_concat(b.sh, c.sh))), 4) AS jaccard
       |    FROM b2sh b JOIN idx2 c ON true)
       |  WHERE jaccard >= 0.7),
       |r2 AS (SELECT doc_id, corpus_id, jaccard,
       |    row_number() OVER (PARTITION BY doc_id
       |                       ORDER BY jaccard DESC, corpus_id) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n
       |  FROM m2),
       |best2 AS (SELECT doc_id, corpus_id AS best_corpus_id,
       |    jaccard AS best_jaccard, n FROM r2 WHERE rn = 1),
       |v2 AS (SELECT b.doc_id,
       |    CASE WHEN best2.doc_id IS NULL THEN 'admitted'
       |         ELSE 'duplicate' END AS status,
       |    COALESCE(best2.n, 0) AS n_matches, best2.best_corpus_id,
       |    best2.best_jaccard
       |  FROM b2sh b LEFT JOIN best2 ON best2.doc_id = b.doc_id)
       |SELECT CAST(1 AS INT) AS ingest, doc_id, status, n_matches,
       |  best_corpus_id, best_jaccard FROM v1
       |UNION ALL
       |SELECT CAST(2 AS INT) AS ingest, doc_id, status, n_matches,
       |  best_corpus_id, best_jaccard FROM v2
       |ORDER BY doc_id""".stripMargin
  }

  /** q252: COMPACTION TRANSPARENCY through the ingest lifecycle — the
    * q248 two-round fixture with [[IndexStore.compactIndex]] run
    * between the rounds: a long-running index is compacted on some
    * maintenance cadence while ingest continues, and the rewrite must
    * be invisible to every verdict. The oracle is therefore EXACTLY
    * q248's two-round replay ([[mediaIngestRoundsSql]] — shared, not
    * copied): if compaction moved, lost, or duplicated a single row,
    * round 2's screen against the compacted index would drift from the
    * replay and the hash check would fail. File-count effects (the
    * actual point of compaction) are non-deterministic layout, pinned
    * by IndexStoreSpec instead.
    */
  def mediaIngestCompacted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashes = t(s, dir, "documents").select(col("doc_id")).as[Long]
      .filter((id: Long) => id < 500)
      .mapPartitions(_.flatMap { id =>
        Multimodal.dhash64(Fixtures.dhashAssetFor(id).media)
          .map(dh => (id, dh))
      }).toDF("doc_id", "dh")
      .localCheckpoint(true)
    val path = scratchDir("media_ingest_compacted")
    IndexStore.saveMediaIndex(
      hashes.where(col("doc_id") < 280 &&
        pmod(pmod(col("doc_id"), lit(Fixtures.DhashClasses)), lit(2)) === 0),
      "doc_id", "dh", path)
    val v1 = IndexStore.ingestMedia(
        hashes.where(col("doc_id") >= 280 && col("doc_id") < 390),
        "doc_id", "dh", path)
      .withColumn("ingest", lit(1))
    // v1 rides ingestMedia's internally checkpointed verdict — already
    // materialized, so the compact's file swap can't touch its plan
    IndexStore.compactIndex(s, path): Unit
    val v2 = IndexStore.ingestMedia(hashes.where(col("doc_id") >= 390),
        "doc_id", "dh", path)
      .withColumn("ingest", lit(2))
    v1.unionByName(v2)
      .select(col("ingest"), col("asset_id"), col("status"),
        col("n_matches"), col("best_corpus_id"), col("best_hamming"))
      .orderBy("asset_id")
  }

  /** q251: INTRA-BATCH COLLAPSE composed into an ingest round — the
    * composition [[IndexStore.ingestMedia]]'s contract hands to the
    * caller ("dedup is against the INDEX only; two mutually-near novel
    * assets in the same batch are both admitted — collapse a batch
    * first with [[Dedup.hammingPairs]]"), registered end to end so
    * exactly ONE member of every intra-batch near-dup family reaches
    * the index. Fixture: corpus = even dHash classes below id 280 (as
    * q248); batch = ids [280, 500) — every class exactly twice, once
    * per JPEG-quality variant, so the batch is 110 two-member near-dup
    * families with zero exact duplicates. Collapse rule: an asset with
    * ANY smaller-id batch partner within Hamming ≤ 3 is 'collapsed'
    * (best = lexicographic (hamming, partner) min — the ingest
    * verdict's own convention); [[Dedup.hammingPairs]]' pigeonhole
    * recall is EXACT at maxDist ≤ 3, so the rule is deterministic and
    * the DuckDB oracle replays it brute-force. Family heads then run
    * one [[IndexStore.ingestMedia]] round: even-class heads reject
    * against the corpus, odd-class heads admit — one admission per
    * family, co-admission eliminated.
    */
  def mediaIngestCollapsed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashes = t(s, dir, "documents").select(col("doc_id")).as[Long]
      .filter((id: Long) => id < 500)
      .mapPartitions(_.flatMap { id =>
        Multimodal.dhash64(Fixtures.dhashAssetFor(id).media)
          .map(dh => (id, dh))
      }).toDF("doc_id", "dh")
      .localCheckpoint(true)
    val path = scratchDir("media_ingest_collapsed")
    IndexStore.saveMediaIndex(
      hashes.where(col("doc_id") < 280 &&
        pmod(pmod(col("doc_id"), lit(Fixtures.DhashClasses)), lit(2)) === 0),
      "doc_id", "dh", path)
    val batch = hashes.where(col("doc_id") >= 280)
    // consumed twice (collapsed verdicts + survivor anti-join)
    val pairs = Dedup.hammingPairs(batch, "doc_id", "dh", maxDist = 3)
      .localCheckpoint(true)
    val collapsed = pairs
      .groupBy(col("id_b").as("asset_id"))
      .agg(count(lit(1)).as("n_matches"),
        min(struct(col("hamming"), col("id_a").as("corpus_id"))).as("__best"))
      .select(col("asset_id"), lit("collapsed").as("status"),
        col("n_matches"), col("__best.corpus_id").as("best_corpus_id"),
        col("__best.hamming").as("best_hamming"))
    val survivors = batch.join(
      pairs.select(col("id_b").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    IndexStore.ingestMedia(survivors, "doc_id", "dh", path)
      .unionByName(collapsed)
      .orderBy("asset_id")
  }

  val mediaIngestCollapsedSql: String =
    s"""WITH d AS (SELECT doc_id, doc_id % ${Fixtures.DhashClasses} AS gid,
       |    CAST((doc_id // ${Fixtures.DhashClasses}) % 2 AS INT) AS variant
       |  FROM documents WHERE doc_id < 500),
       |g AS (SELECT * FROM read_parquet(
       |        '/root/repo/fixtures/dhash_golden.parquet/*.parquet')),
       |h AS (SELECT d.doc_id, d.gid, g.dh FROM d
       |  JOIN g ON g.gid = d.gid AND g.variant = d.variant),
       |corpus AS (SELECT doc_id, dh FROM h
       |  WHERE doc_id < 280 AND gid % 2 = 0),
       |b AS (SELECT doc_id, dh FROM h WHERE doc_id >= 280),
       |ip AS (SELECT b2.doc_id AS asset_id, b1.doc_id AS partner,
       |    CAST(bit_count(xor(b1.dh, b2.dh)) AS INT) AS hamming
       |  FROM b b1 JOIN b b2 ON b1.doc_id < b2.doc_id
       |    AND bit_count(xor(b1.dh, b2.dh)) <= 3),
       |rc AS (SELECT asset_id, partner, hamming,
       |    row_number() OVER (PARTITION BY asset_id
       |                       ORDER BY hamming, partner) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY asset_id) AS BIGINT) AS n
       |  FROM ip),
       |coll AS (SELECT asset_id, 'collapsed' AS status, n AS n_matches,
       |    partner AS best_corpus_id, hamming AS best_hamming
       |  FROM rc WHERE rn = 1),
       |surv AS (SELECT doc_id, dh FROM b
       |  WHERE doc_id NOT IN (SELECT asset_id FROM coll)),
       |m AS (SELECT s.doc_id AS asset_id, c.doc_id AS corpus_id,
       |    CAST(bit_count(xor(s.dh, c.dh)) AS INT) AS hamming
       |  FROM surv s JOIN corpus c ON bit_count(xor(s.dh, c.dh)) <= 3),
       |r AS (SELECT asset_id, corpus_id, hamming,
       |    row_number() OVER (PARTITION BY asset_id
       |                       ORDER BY hamming, corpus_id) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY asset_id) AS BIGINT) AS n
       |  FROM m),
       |bst AS (SELECT asset_id, corpus_id AS best_corpus_id,
       |    hamming AS best_hamming, n FROM r WHERE rn = 1),
       |v AS (SELECT s.doc_id AS asset_id,
       |    CASE WHEN bst.asset_id IS NULL THEN 'admitted'
       |         ELSE 'duplicate' END AS status,
       |    COALESCE(bst.n, 0) AS n_matches, bst.best_corpus_id,
       |    bst.best_hamming
       |  FROM surv s LEFT JOIN bst ON bst.asset_id = s.doc_id)
       |SELECT asset_id, status, n_matches, best_corpus_id, best_hamming
       |FROM v
       |UNION ALL
       |SELECT asset_id, status, n_matches, best_corpus_id, best_hamming
       |FROM coll
       |ORDER BY asset_id""".stripMargin

  /** q254: INTRA-BATCH COLLAPSE composed into a VECTOR ingest round —
    * q251's semantic sibling, promoted from its IndexStoreSpec pin to
    * an oracled registration (round-10 verdict ask #2). Fixture:
    * corpus = even planted clusters below vec_id 300 (q250's save);
    * batch = one base vector per cluster (vec_id ∈ [304, 320), all 16
    * clusters exactly once) plus a ×2-SCALED twin of each at id + 200
    * — 16 two-member exact-ray families (cos exactly 1.0, and a scaled
    * vector shares every sign block with its base by construction, so
    * [[Similarity.cosineNearDupPairs]]' candidacy is certain, not
    * banded luck), with every cross-family batch cos ≤ 0.5 (one base
    * per cluster — no probabilistic same-cluster batch pairs). The
    * collapse rule is therefore deterministic: a batch vector with a
    * smaller-id partner at cos ≥ 0.9 is 'collapsed' (best =
    * lexicographic (−cos, partner) min, the ingest verdict's own
    * convention) and the DuckDB oracle replays it brute-force. Family
    * heads then run one [[IndexStore.ingestVector]] round: even-cluster
    * bases reject against the corpus (full-algorithm sign-block replay
    * in the oracle, as q250), odd-cluster bases admit — one admission
    * per family, co-admission eliminated.
    */
  def vectorIngestCollapsed(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), clusteredVec.as("cv"))
    val path = scratchDir("vec_ingest_collapsed")
    IndexStore.saveVectorIndex(
      e.where(col("vec_id") < 300 && pmod(col("vec_id"), lit(16)) % 2 === 0),
      "vec_id", "cv", path, dim = 32, numBlocks = 16, planesPerBlock = 4)
    val bases = e.where(col("vec_id") >= 304 && col("vec_id") < 320)
    val twins = bases.select((col("vec_id") + 200).as("vec_id"),
      transform(col("cv"), x => x * lit(2.0)).as("cv"))
    // consumed by the pair scan and the survivor anti-join
    val batch = bases.unionByName(twins).localCheckpoint(true)
    val pairs = Similarity.cosineNearDupPairs(batch, "vec_id", "cv",
        dim = 32, threshold = 0.9, numBlocks = 16, planesPerBlock = 4)
      .localCheckpoint(true)
    val collapsed = pairs
      .groupBy(col("id_b").as("vec_id"))
      .agg(count(lit(1)).as("n_matches"),
        min(struct((-col("cos")).as("negcos"), col("id_a").as("corpus_id")))
          .as("__best"))
      .select(col("vec_id"), lit("collapsed").as("status"),
        col("n_matches"), col("__best.corpus_id").as("best_corpus_id"),
        (-col("__best.negcos")).as("best_cos"))
    val survivors = batch.join(
      pairs.select(col("id_b").as("vec_id")).distinct(),
      Seq("vec_id"), "left_anti")
    IndexStore.ingestVector(survivors, "vec_id", "cv", path, threshold = 0.9)
      .unionByName(collapsed)
      .orderBy("vec_id")
  }

  val vectorIngestCollapsedSql: String = {
    val cosOf = (q: String, c: String) =>
      s"""COALESCE(list_dot_product($q.v, $c.v) /
         |      (sqrt(list_dot_product($q.v, $q.v)) *
         |       sqrt(list_dot_product($c.v, $c.v))), 0.0)""".stripMargin
    s"""${annSigPrefix(16, 4, dim = 32, vecSql = clusteredVecSql)},
       |bases AS (SELECT vec_id, v FROM e
       |  WHERE vec_id >= 304 AND vec_id < 320),
       |twins AS (SELECT vec_id + 200 AS vec_id,
       |    list_transform(v, x -> x * 2.0E0) AS v FROM bases),
       |b AS (SELECT * FROM bases UNION ALL SELECT * FROM twins),
       |ip AS (SELECT * FROM (
       |    SELECT b2.vec_id AS vec_id, b1.vec_id AS partner,
       |      round(${cosOf("b1", "b2")}, 6) AS cos
       |    FROM b b1 JOIN b b2 ON b1.vec_id < b2.vec_id)
       |  WHERE cos >= 0.9),
       |rc AS (SELECT vec_id, partner, cos,
       |    row_number() OVER (PARTITION BY vec_id
       |                       ORDER BY cos DESC, partner ASC) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY vec_id) AS BIGINT) AS n
       |  FROM ip),
       |coll AS (SELECT vec_id, 'collapsed' AS status, n AS n_matches,
       |    partner AS best_corpus_id, cos AS best_cos
       |  FROM rc WHERE rn = 1),
       |surv AS (SELECT vec_id FROM b
       |  WHERE vec_id NOT IN (SELECT vec_id FROM coll)),
       |corpus AS (SELECT vec_id FROM e
       |  WHERE vec_id < 300 AND (vec_id % 16) % 2 = 0),
       |cand AS (SELECT DISTINCT q.vec_id AS new_id, c.vec_id AS corpus_id
       |  FROM sig q JOIN sig c
       |    ON q.block_idx = c.block_idx AND q.band_hash = c.band_hash
       |  WHERE q.vec_id IN (SELECT vec_id FROM surv)
       |    AND c.vec_id IN (SELECT vec_id FROM corpus)),
       |m AS (SELECT cand.new_id, cand.corpus_id,
       |    round(${cosOf("qe", "ce")}, 6) AS cos
       |  FROM cand JOIN e qe ON qe.vec_id = cand.new_id
       |            JOIN e ce ON ce.vec_id = cand.corpus_id
       |  WHERE ${cosOf("qe", "ce")} >= 0.9),
       |r AS (SELECT new_id, corpus_id, cos,
       |    row_number() OVER (PARTITION BY new_id
       |                       ORDER BY cos DESC, corpus_id ASC) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY new_id) AS BIGINT) AS n
       |  FROM m),
       |bst AS (SELECT new_id, corpus_id AS best_corpus_id,
       |    cos AS best_cos, n FROM r WHERE rn = 1),
       |v AS (SELECT s.vec_id,
       |    CASE WHEN bst.new_id IS NULL THEN 'admitted'
       |         ELSE 'duplicate' END AS status,
       |    COALESCE(bst.n, 0) AS n_matches, bst.best_corpus_id,
       |    bst.best_cos
       |  FROM surv s LEFT JOIN bst ON bst.new_id = s.vec_id)
       |SELECT vec_id, status, n_matches, best_corpus_id, best_cos FROM v
       |UNION ALL
       |SELECT vec_id, status, n_matches, best_corpus_id, best_cos FROM coll
       |ORDER BY vec_id""".stripMargin
  }

  /** q255: INTRA-BATCH COLLAPSE composed into a CORPUS ingest round —
    * q251's lexical sibling (round-10 verdict ask #2: the corpus
    * path's candidate generation — shingle → minhash → band equi-join
    * — differs enough from the media/vector screens that it deserves
    * its own oracle). Fixture: q253's dilution construction (every
    * ≥ 0.7 jaccard pair in it is an exact-text pair, with certain LSH
    * candidacy — identical minhash signatures); batch = q253's
    * round-1 heads PLUS an exact copy of every head at id + 400, so
    * the batch is all two-member exact-text families. Collapse rule:
    * a doc with a smaller-id batch partner at jaccard ≥ 0.7 is
    * 'collapsed' ([[Dedup.minhashLSH]] over the batch — deterministic
    * here by the dilution argument); family heads then run one
    * [[IndexStore.ingestCorpus]] round (even-base heads reject as
    * exact corpus copies, odd-base heads admit). The DuckDB oracle
    * replays construction, collapse, and screen brute-force.
    */
  def corpusIngestCollapsed(s: SparkSession, dir: String): DataFrame = {
    val (corpus, heads) = dilutionFixture(s, dir, off = 200)
    val path = scratchDir("corpus_ingest_collapsed")
    IndexStore.saveCorpusIndex(corpus, "doc_id", "text", path)
    val copies = heads.select((col("doc_id") + 400).as("doc_id"), col("text"))
    // consumed by the pair scan and the survivor anti-join
    val batch = heads.unionByName(copies).localCheckpoint(true)
    val pairs = Dedup.minhashLSH(batch, "doc_id", "text", threshold = 0.7)
      .localCheckpoint(true)
    val collapsed = pairs
      .groupBy(col("id_b").as("doc_id"))
      .agg(count(lit(1)).as("n_matches"),
        min(struct((-col("jaccard")).as("negj"), col("id_a").as("corpus_id")))
          .as("__best"))
      .select(col("doc_id"), lit("collapsed").as("status"),
        col("n_matches"), col("__best.corpus_id").as("best_corpus_id"),
        (-col("__best.negj")).as("best_jaccard"))
    val survivors = batch.join(
      pairs.select(col("id_b").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    IndexStore.ingestCorpus(survivors, "doc_id", "text", path,
        threshold = 0.7)
      .unionByName(collapsed)
      .orderBy("doc_id")
  }

  val corpusIngestCollapsedSql: String = {
    def dil(prefix: String, idExpr: String): String =
      s"""array_to_string(['$prefix' || CAST($idExpr AS VARCHAR) || 'x' ||
         |      CAST(i AS VARCHAR) for i in range(1, 2 * len(toks) + 1)], ' ')"""
        .stripMargin
    val toksOf = duckToks
    val shOf = duckShingles
    val jacc = (a: String, b: String) =>
      s"""round(CAST(len(list_intersect($a.sh, $b.sh)) AS DOUBLE) /
         |            len(list_distinct(list_concat($a.sh, $b.sh))), 4)"""
        .stripMargin
    s"""WITH base AS (
       |  SELECT doc_id, text, $toksOf AS toks FROM documents
       |  WHERE doc_id >= 100 AND doc_id < 300 AND text IS NOT NULL),
       |base10 AS (SELECT * FROM base WHERE len(toks) >= 10),
       |corpus AS (SELECT doc_id,
       |    text || ' ' || ${dil("cc", "doc_id")} AS text
       |  FROM base10),
       |evens AS (SELECT doc_id + 200 AS doc_id, text FROM corpus
       |  WHERE doc_id < 200 AND doc_id % 2 = 0),
       |odds AS (SELECT doc_id + 200 AS doc_id,
       |    text || ' ' || ${dil("zz", "doc_id + 200")} AS text
       |  FROM base10 WHERE doc_id < 200 AND doc_id % 2 = 1),
       |heads AS (SELECT * FROM evens UNION ALL SELECT * FROM odds),
       |copies AS (SELECT doc_id + 400 AS doc_id, text FROM heads),
       |b AS (SELECT * FROM heads UNION ALL SELECT * FROM copies),
       |bsh AS (SELECT doc_id, $shOf AS sh
       |  FROM (SELECT doc_id, $toksOf AS toks FROM b)),
       |ip AS (SELECT * FROM (
       |    SELECT b2.doc_id AS doc_id, b1.doc_id AS partner,
       |      ${jacc("b1", "b2")} AS jaccard
       |    FROM bsh b1 JOIN bsh b2 ON b1.doc_id < b2.doc_id)
       |  WHERE jaccard >= 0.7),
       |rc AS (SELECT doc_id, partner, jaccard,
       |    row_number() OVER (PARTITION BY doc_id
       |                       ORDER BY jaccard DESC, partner ASC) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n
       |  FROM ip),
       |coll AS (SELECT doc_id, 'collapsed' AS status, n AS n_matches,
       |    partner AS best_corpus_id, jaccard AS best_jaccard
       |  FROM rc WHERE rn = 1),
       |ssh AS (SELECT * FROM bsh
       |  WHERE doc_id NOT IN (SELECT doc_id FROM coll)),
       |csh AS (SELECT doc_id, $shOf AS sh
       |  FROM (SELECT doc_id, $toksOf AS toks FROM corpus)),
       |m AS (SELECT * FROM (
       |    SELECT s.doc_id AS doc_id, c.doc_id AS corpus_id,
       |      ${jacc("s", "c")} AS jaccard
       |    FROM ssh s JOIN csh c ON true)
       |  WHERE jaccard >= 0.7),
       |r AS (SELECT doc_id, corpus_id, jaccard,
       |    row_number() OVER (PARTITION BY doc_id
       |                       ORDER BY jaccard DESC, corpus_id) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n
       |  FROM m),
       |bst AS (SELECT doc_id, corpus_id AS best_corpus_id,
       |    jaccard AS best_jaccard, n FROM r WHERE rn = 1),
       |v AS (SELECT s.doc_id,
       |    CASE WHEN bst.doc_id IS NULL THEN 'admitted'
       |         ELSE 'duplicate' END AS status,
       |    COALESCE(bst.n, 0) AS n_matches, bst.best_corpus_id,
       |    bst.best_jaccard
       |  FROM ssh s LEFT JOIN bst ON bst.doc_id = s.doc_id)
       |SELECT doc_id, status, n_matches, best_corpus_id, best_jaccard
       |FROM v
       |UNION ALL
       |SELECT doc_id, status, n_matches, best_corpus_id, best_jaccard
       |FROM coll
       |ORDER BY doc_id""".stripMargin
  }

  /** q256: IVF REBUILD through the persisted model — the read-side
    * maintenance op ([[IndexStore.rebuildIvf]]) registered end to end
    * (round-10 verdict ask #3): train the coarse quantizer on a
    * 200-vector PREFIX of the planted-cluster corpus, append the rest
    * against those frozen (now drift-stale) centroids — the documented
    * IVF decay scenario — then REBUILD on the full corpus (retrain +
    * reassign + atomic generation swap) and search the rebuilt model
    * at the honest nProbe = 2/16. Oracle = q55's brute-force SQL,
    * exact by the same planted-separation argument: the rebuilt
    * quantizer is a full-corpus [[IvfIndex.build]] with q55's own
    * parameters, so every planted cluster is compact and an honest
    * 2-probe recovers the all-same-cluster true top-5.
    */
  def ivfRebuildSearch(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), clusteredVec.as("cv"))
    val path = scratchDir("ivf_rebuild")
    IndexStore.saveIvf(
      IvfIndex.build(e.where(col("vec_id") < 200), "vec_id", "cv",
        nLists = 16, trainFraction = 1.0, kmeansMaxIter = 10), path)
    IndexStore.appendIvf(e.where(col("vec_id") >= 200), "vec_id", "cv", path)
    IndexStore.rebuildIvf(e, "vec_id", "cv", path,
      trainFraction = 1.0, kmeansMaxIter = 10)
    IvfIndex.search(IndexStore.loadIvf(s, path), e,
        e.where(col("vec_id") < 10), "vec_id", "cv", k = 5, nProbe = 2)
      .orderBy("query_id", "rank")
  }

  /** q257: TWO INGEST ROUNDS through the persisted TEXT (BM25) index —
    * [[IndexStore.ingestText]] end to end, completing four-for-four
    * ingest-round kind parity (q248 media, q250 vector, q253 corpus,
    * this one lexical). The BM25 screen has no probabilistic recall
    * (every query-term ∩ postings pair is scored exactly), so unlike
    * the LSH rounds ANY fixture is engine-deterministic; the q253
    * dilution construction is reused anyway because it gives the
    * THRESHOLD a structural margin: each corpus doc is a real text
    * plus 2× its token count of doc-unique `cc` filler, so an exact
    * copy screened as a query matches its original on every filler
    * term too — ≥ 20 df=1 terms at idf ≈ ln(134) each, probed ≥ 150.5M
    * e6 at verify SF — while any non-copy pair shares only base-text
    * terms (probed ≤ 11.1M e6). At minScoreE6 = 30M: round 1's even
    * heads (exact corpus copies at id+300) all reject with their
    * original as best match, the odd heads (fresh `zz` dilutions)
    * all admit; round 2 re-screens exact copies of round 1's
    * ADMISSIONS (at +300 again) — every one rejects against a doc
    * that was not in the index when the query started, the cross-batch
    * growth proof, with round-2 scores computed over the GROWN stats
    * (N, df, avgdl include the admissions — the replay the oracle
    * reproduces from idx2 = corpus ∪ admitted). The DuckDB oracle
    * replays construction and both BM25 rounds at full algorithm
    * depth with the q113 fixed-parenthesization e6 discipline, so the
    * hash compare is exact.
    */
  def textIngestRounds(s: SparkSession, dir: String): DataFrame = {
    val (corpus, heads) = dilutionFixture(s, dir, off = 300)
    val path = scratchDir("text_ingest_rounds")
    IndexStore.saveTextIndex(corpus, "doc_id", "text", path)
    val batch1 = heads.localCheckpoint(true)
    val v1 = IndexStore.ingestText(batch1, "doc_id", "text", path,
      minScoreE6 = 30000000L).withColumn("ingest", lit(1))
    val batch2 = batch1
      .join(v1.where(col("status") === "admitted").select("doc_id"),
        Seq("doc_id"))
      .select((col("doc_id") + 300).as("doc_id"), col("text"))
    val v2 = IndexStore.ingestText(batch2, "doc_id", "text", path,
      minScoreE6 = 30000000L).withColumn("ingest", lit(2))
    v1.unionByName(v2)
      .select(col("ingest"), col("doc_id"), col("status"),
        col("n_matches"), col("best_corpus_id"), col("best_score_e6"))
      .orderBy("doc_id")
  }

  /** The q257/q258 dilution construction's filler expression (DuckDB). */
  private def textDilSql(prefix: String, idExpr: String): String =
    s"""array_to_string(['$prefix' || CAST($idExpr AS VARCHAR) || 'x' ||
       |      CAST(i AS VARCHAR) for i in range(1, 2 * len(toks) + 1)], ' ')"""
      .stripMargin

  /** One full BM25 round as DuckDB CTEs (the q113/q249 scoring chain:
    * index stats derived from `idx`, queries = `batch` docs, threshold
    * 30M e6), suffixed by `r` so several rounds compose in one WITH.
    * Ends at `best_$r` (per-query best match + match count at
    * threshold); `pairPred` further restricts the scored pairs (the
    * q258 collapse round's `corpus_id < doc_id`); `maxDfPpm` replays
    * the engine's high-df term prune (df · 1e6 > ppm · N dropped
    * before scoring — the q260 round). Shared by the q257, q258 and
    * q260 oracles.
    */
  private def bm25RoundSql(
      idx: String, batch: String, r: String,
      pairPred: String = "TRUE",
      maxDfPpm: Option[Long] = None): String = {
    val toksOf = duckToks
    val dfKept = maxDfPpm match {
      case None => s"df_$r AS (SELECT term, COUNT(*) AS df FROM tfq_$r GROUP BY 1),"
      case Some(ppm) =>
        s"""dfa_$r AS (SELECT term, COUNT(*) AS df FROM tfq_$r GROUP BY 1),
           |df_$r AS (SELECT a.term, a.df FROM dfa_$r a CROSS JOIN st_$r s
           |  WHERE a.df * 1000000 <= $ppm * s.n),""".stripMargin
    }
    s"""tok_$r AS (SELECT doc_id, unnest(toks) AS term
       |  FROM (SELECT doc_id, $toksOf AS toks FROM $idx)),
       |tf_$r AS (SELECT doc_id, term, COUNT(*) AS tf
       |  FROM tok_$r GROUP BY 1, 2),
       |dl_$r AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
       |  FROM tf_$r GROUP BY 1),
       |st_$r AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl
       |  FROM dl_$r),
       |qt_$r AS (SELECT doc_id AS query_id,
       |    unnest(list_distinct($toksOf)) AS term FROM $batch),
       |tfq_$r AS (SELECT * FROM tf_$r
       |  WHERE term IN (SELECT DISTINCT term FROM qt_$r)),
       |$dfKept
       |sc_$r AS (
       |  SELECT q.query_id, t.doc_id,
       |    CAST(FLOOR(
       |      ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) *
       |      ((t.tf * (1.2 + 1.0)) /
       |       (t.tf + 1.2 * (0.25 + 0.75 *
       |         (l.dl / (CAST(s.sumdl AS DOUBLE) / s.n))))) *
       |      1000000.0) AS BIGINT) AS e6
       |  FROM tfq_$r t JOIN qt_$r q USING (term) JOIN df_$r d USING (term)
       |    JOIN dl_$r l USING (doc_id) CROSS JOIN st_$r s),
       |m_$r AS (SELECT * FROM (
       |    SELECT query_id AS doc_id, doc_id AS corpus_id,
       |      CAST(SUM(e6) AS BIGINT) AS score_e6
       |    FROM sc_$r GROUP BY query_id, doc_id)
       |  WHERE score_e6 >= 30000000 AND ($pairPred)),
       |r_$r AS (SELECT doc_id, corpus_id, score_e6,
       |    row_number() OVER (PARTITION BY doc_id
       |                       ORDER BY score_e6 DESC, corpus_id ASC) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n
       |  FROM m_$r),
       |best_$r AS (SELECT doc_id, corpus_id AS best_corpus_id,
       |    score_e6 AS best_score_e6, n FROM r_$r WHERE rn = 1)"""
      .stripMargin
  }

  /** admitted/duplicate verdict CTE over a round's `best_$r`. */
  private def bm25VerdictSql(batch: String, r: String): String =
    s"""v_$r AS (SELECT b.doc_id,
       |    CASE WHEN bb.doc_id IS NULL THEN 'admitted'
       |         ELSE 'duplicate' END AS status,
       |    COALESCE(bb.n, 0) AS n_matches, bb.best_corpus_id,
       |    bb.best_score_e6
       |  FROM $batch b LEFT JOIN best_$r bb ON bb.doc_id = b.doc_id)"""
      .stripMargin

  /** The q257/q258 shared fixture CTEs: diluted corpus + round-1 head
    * batch (evens = exact corpus copies at id+300, odds = fresh `zz`
    * dilutions at id+300).
    */
  private def textFixtureSql: String = {
    val toksOf = duckToks
    s"""base AS (
       |  SELECT doc_id, text, $toksOf AS toks FROM documents
       |  WHERE doc_id >= 100 AND doc_id < 300 AND text IS NOT NULL),
       |base10 AS (SELECT * FROM base WHERE len(toks) >= 10),
       |corpus AS (SELECT doc_id,
       |    text || ' ' || ${textDilSql("cc", "doc_id")} AS text
       |  FROM base10),
       |evens AS (SELECT doc_id + 300 AS doc_id, text FROM corpus
       |  WHERE doc_id < 200 AND doc_id % 2 = 0),
       |odds AS (SELECT doc_id + 300 AS doc_id,
       |    text || ' ' || ${textDilSql("zz", "doc_id + 300")} AS text
       |  FROM base10 WHERE doc_id < 200 AND doc_id % 2 = 1),
       |b1 AS (SELECT * FROM evens UNION ALL SELECT * FROM odds)"""
      .stripMargin
  }

  val textIngestRoundsSql: String =
    s"""WITH $textFixtureSql,
       |${bm25RoundSql("corpus", "b1", "1")},
       |${bm25VerdictSql("b1", "1")},
       |adm1 AS (SELECT b1.doc_id, b1.text FROM b1
       |  JOIN v_1 v ON v.doc_id = b1.doc_id WHERE v.status = 'admitted'),
       |idx2 AS (SELECT doc_id, text FROM corpus
       |  UNION ALL SELECT doc_id, text FROM adm1),
       |b2 AS (SELECT doc_id + 300 AS doc_id, text FROM adm1),
       |${bm25RoundSql("idx2", "b2", "2")},
       |${bm25VerdictSql("b2", "2")}
       |SELECT CAST(1 AS INT) AS ingest, doc_id, status, n_matches,
       |  best_corpus_id, best_score_e6 FROM v_1
       |UNION ALL
       |SELECT CAST(2 AS INT) AS ingest, doc_id, status, n_matches,
       |  best_corpus_id, best_score_e6 FROM v_2
       |ORDER BY doc_id""".stripMargin

  /** q258: INTRA-BATCH COLLAPSE composed into a TEXT ingest round —
    * completing collapse → ingest four-for-four (q251 media, q254
    * vector, q255 corpus, this one lexical). The collapse rule is the
    * BM25 self-screen itself: the batch is indexed in memory
    * ([[TextAnalysis.textIndex]] over the batch) and screened against
    * itself with the SAME scoring chain the ingest round uses; a doc
    * with any smaller-id batch partner at score_e6 ≥ 30M is
    * 'collapsed' (best = highest score, ties smallest partner — the
    * verdict convention, and the metric matches the ingest verdicts,
    * unlike a jaccard-based collapse would). Fixture: q257's heads
    * plus an exact copy of every head at id+400 — two-member
    * exact-text families whose within-family score carries the
    * structural filler margin (≥150M) while every cross-batch pair
    * stays ≤ ~11M, so exactly the copies collapse. Family heads then
    * run one [[IndexStore.ingestText]] round (even-base heads reject
    * as exact corpus copies, odd-base heads admit). The oracle
    * replays construction, the self-screen collapse (intra-batch
    * stats: N = batch size), and the ingest screen brute-force — all
    * e6-integer exact.
    */
  def textIngestCollapsed(s: SparkSession, dir: String): DataFrame = {
    val (corpus, heads) = dilutionFixture(s, dir, off = 300)
    val path = scratchDir("text_ingest_collapsed")
    IndexStore.saveTextIndex(corpus, "doc_id", "text", path)
    val copies = heads.select((col("doc_id") + 400).as("doc_id"), col("text"))
    val batch = heads.unionByName(copies)
    // since round 13 the self-screen composition IS the operator:
    // collapseFirst runs the intra-batch BM25 collapse (smaller-id
    // partners at the round's own threshold) and only family heads
    // pay the index screen — this query pins the integrated path
    // against the same full-replay oracle
    IndexStore.ingestText(batch, "doc_id", "text", path,
        minScoreE6 = 30000000L, collapseFirst = true)
      .orderBy("doc_id")
  }

  val textIngestCollapsedSql: String =
    s"""WITH $textFixtureSql,
       |copies AS (SELECT doc_id + 400 AS doc_id, text FROM b1),
       |b AS (SELECT * FROM b1 UNION ALL SELECT * FROM copies),
       |${bm25RoundSql("b", "b", "c", pairPred = "corpus_id < doc_id")},
       |coll AS (SELECT doc_id, 'collapsed' AS status, n AS n_matches,
       |    best_corpus_id, best_score_e6 FROM best_c),
       |surv AS (SELECT * FROM b
       |  WHERE doc_id NOT IN (SELECT doc_id FROM coll)),
       |${bm25RoundSql("corpus", "surv", "1")},
       |${bm25VerdictSql("surv", "1")}
       |SELECT doc_id, status, n_matches, best_corpus_id, best_score_e6
       |FROM v_1
       |UNION ALL
       |SELECT doc_id, status, n_matches, best_corpus_id, best_score_e6
       |FROM coll
       |ORDER BY doc_id""".stripMargin

  /** q259: the [[IndexStore.ingestText]] cost guardrail as a DRY-RUN
    * readout — per term shared between a batch and a persisted text
    * index, the EXACT number of (term, query, doc) rows the round's
    * BM25 screen would score: df (postings rows carrying the term) ×
    * n_queries (batch docs carrying it). Σ pairs is the volume the
    * guardrail compares against `maxScreenPairs`, and the top rows are
    * the dense terms its raise names — the sizing readout an operator
    * runs BEFORE an expensive decontamination round. Plain documents
    * (no dilution): real shared vocabulary is exactly what makes the
    * estimate non-trivial. The oracle replays tokenize → df → per-term
    * query counts → product, all integer-exact.
    */
  def textScreenEstimate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val corpus = docs
      .where(col("doc_id") >= 100 && col("doc_id") < 300 &&
        col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    val path = scratchDir("text_screen_estimate")
    IndexStore.saveTextIndex(corpus, "doc_id", "text", path)
    val batch = docs.where(col("doc_id") >= 300 && col("doc_id") < 400)
      .select(col("doc_id"), col("text"))
    IndexStore.estimateTextScreen(batch, "doc_id", "text", path)
      .orderBy(col("pairs").desc, col("term"))
  }

  val textScreenEstimateSql: String = {
    val toksOf = duckToks
    s"""WITH corpus AS (SELECT doc_id, text FROM documents
       |  WHERE doc_id >= 100 AND doc_id < 300 AND text IS NOT NULL),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf
       |  FROM (SELECT doc_id, unnest($toksOf) AS term FROM corpus)
       |  GROUP BY 1, 2),
       |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
       |  FROM tf GROUP BY 1),
       |batch AS (SELECT doc_id, text FROM documents
       |  WHERE doc_id >= 300 AND doc_id < 400 AND text IS NOT NULL),
       |qt AS (SELECT doc_id AS query_id,
       |    unnest(list_distinct($toksOf)) AS term FROM batch),
       |nq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n_queries
       |  FROM qt GROUP BY 1)
       |SELECT d.term, d.df, n.n_queries, d.df * n.n_queries AS pairs
       |FROM df d JOIN nq n USING (term)
       |ORDER BY pairs DESC, d.term""".stripMargin
  }

  /** q260: a TEXT ingest round under the high-df term PRUNE
    * (`maxDfPpm`) — the structural fix for exact BM25's worst scale
    * law registered as an oracled query: terms whose df exceeds 5% of
    * the corpus (integer rule df·1e6 > 50000·N) are dropped from every
    * score sum BEFORE the scoring join multiplies their postings. On
    * the dilution fixture the decision margin survives pruning by
    * construction — an exact copy's ≥20 df=1 filler matches carry the
    * ≥150M e6 self-score, while the pruned terms are the common base-
    * text words that dominate volume and carry idf ≈ 0 — so the
    * verdict pattern matches q257 round 1 (even heads reject against
    * their originals, odd heads admit) but every SCORE is the pruned
    * sum, which the oracle replays at full algorithm depth with the
    * same integer prune rule. Guardrail coherence is part of the
    * contract: the estimate inside the round applies the same prune,
    * so budget and actual volume stay one number.
    */
  def textIngestPruned(s: SparkSession, dir: String): DataFrame = {
    val (corpus, heads) = dilutionFixture(s, dir, off = 300)
    val path = scratchDir("text_ingest_pruned")
    IndexStore.saveTextIndex(corpus, "doc_id", "text", path)
    IndexStore.ingestText(heads, "doc_id", "text", path,
        minScoreE6 = 30000000L, maxDfPpm = Some(50000L))
      .orderBy("doc_id")
  }

  val textIngestPrunedSql: String =
    s"""WITH $textFixtureSql,
       |${bm25RoundSql("corpus", "b1", "1", maxDfPpm = Some(50000L))},
       |${bm25VerdictSql("b1", "1")}
       |SELECT doc_id, status, n_matches, best_corpus_id, best_score_e6
       |FROM v_1 ORDER BY doc_id""".stripMargin

  /** q261: SHARD-PARALLEL index build —
    * [[IndexStore.mergeTextIndexes]] registered at full oracle depth.
    * The 100 TB build path: no single job tokenizes a 100 TB corpus,
    * so K builders each save a disjoint id range as its own index and
    * the merge unions them. Merge ≡ single build is exact BY DESIGN
    * (the text index stores no corpus statistic — N/df/Σdl derive from
    * the unioned relations at probe time), and this query proves it
    * end-to-end: the corpus is split by doc_id parity into two shard
    * indexes, merged, and an ingest round runs against the MERGED
    * index — while the oracle replays the round against the single
    * undivided corpus. Any merge defect (lost rows, doubled df,
    * shard-boundary skew) would shift scores and break the hash.
    */
  def textIndexMerged(s: SparkSession, dir: String): DataFrame = {
    val (corpus, heads) = dilutionFixture(s, dir, off = 300)
    val shardA = scratchDir("text_merge_shard_a")
    val shardB = scratchDir("text_merge_shard_b")
    val out = scratchDir("text_merge_out")
    IndexStore.saveTextIndex(
      corpus.where(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text",
      shardA)
    IndexStore.saveTextIndex(
      corpus.where(pmod(col("doc_id"), lit(2)) === 1), "doc_id", "text",
      shardB)
    IndexStore.mergeTextIndexes(s, Seq(shardA, shardB), out)
    IndexStore.ingestText(heads, "doc_id", "text", out,
        minScoreE6 = 30000000L)
      .orderBy("doc_id")
  }

  val textIndexMergedSql: String =
    s"""WITH $textFixtureSql,
       |${bm25RoundSql("corpus", "b1", "1")},
       |${bm25VerdictSql("b1", "1")}
       |SELECT doc_id, status, n_matches, best_corpus_id, best_score_e6
       |FROM v_1 ORDER BY doc_id""".stripMargin

  /** q262: TOMBSTONE DELETES are stat-exact immediately —
    * [[IndexStore.deleteFromTextIndex]] registered at full oracle
    * depth. Every EVEN corpus doc is deleted (half the index, a large
    * statistic shift), then q257's round-1 batch screens against the
    * remaining index: the even heads — exact copies of the DELETED
    * docs — flip from 'duplicate' to 'admitted' (their originals are
    * gone and their doc-unique filler terms now match nothing), and
    * every surviving score is computed over corpus-minus-deleted
    * statistics (N, df, avgdl all shrink), which the oracle replays
    * brute-force over exactly the odd half. No vacuum runs: this pins
    * the tombstone-at-load path ([[IndexStore.loadTextIndex]]'s
    * anti-join), the heavy tables still physically hold the deleted
    * rows.
    */
  def textDeleteScreen(s: SparkSession, dir: String): DataFrame = {
    val (corpus, heads) = dilutionFixture(s, dir, off = 300)
    val path = scratchDir("text_delete_screen")
    IndexStore.saveTextIndex(corpus, "doc_id", "text", path)
    IndexStore.deleteFromTextIndex(s, path,
      corpus.where(pmod(col("doc_id"), lit(2)) === 0).select("doc_id"))
    IndexStore.ingestText(heads, "doc_id", "text", path,
        minScoreE6 = 30000000L)
      .orderBy("doc_id")
  }

  val textDeleteScreenSql: String =
    s"""WITH $textFixtureSql,
       |live AS (SELECT * FROM corpus WHERE doc_id % 2 = 1),
       |${bm25RoundSql("live", "b1", "1")},
       |${bm25VerdictSql("b1", "1")}
       |SELECT doc_id, status, n_matches, best_corpus_id, best_score_e6
       |FROM v_1 ORDER BY doc_id""".stripMargin

  /** q263: the full delete → VACUUM → ingest lifecycle —
    * [[IndexStore.vacuumTextIndex]] composed with two post-vacuum
    * ingest rounds. Same deletion as q262 (every even corpus doc),
    * but the tombstones are FOLDED into the heavy tables before any
    * screen — vacuum must not change a single verdict or score
    * (vacuum ≡ fresh build over the live corpus), and the index must
    * keep ingesting normally afterwards: round 1 screens q257's head
    * batch against the vacuumed index, round 2 re-screens exact
    * copies of round 1's admissions against the GROWN index
    * (post-vacuum appends exercise the graveyard-aware monotone
    * guard). The oracle replays both rounds brute-force from the odd
    * half of the corpus.
    */
  def textVacuumRounds(s: SparkSession, dir: String): DataFrame = {
    val (corpus, heads) = dilutionFixture(s, dir, off = 300)
    val path = scratchDir("text_vacuum_rounds")
    IndexStore.saveTextIndex(corpus, "doc_id", "text", path)
    IndexStore.deleteFromTextIndex(s, path,
      corpus.where(pmod(col("doc_id"), lit(2)) === 0).select("doc_id"))
    IndexStore.vacuumTextIndex(s, path)
    val batch1 = heads.localCheckpoint(true)
    val v1 = IndexStore.ingestText(batch1, "doc_id", "text", path,
      minScoreE6 = 30000000L).withColumn("ingest", lit(1))
    val batch2 = batch1
      .join(v1.where(col("status") === "admitted").select("doc_id"),
        Seq("doc_id"))
      .select((col("doc_id") + 300).as("doc_id"), col("text"))
    val v2 = IndexStore.ingestText(batch2, "doc_id", "text", path,
      minScoreE6 = 30000000L).withColumn("ingest", lit(2))
    v1.unionByName(v2)
      .select(col("ingest"), col("doc_id"), col("status"),
        col("n_matches"), col("best_corpus_id"), col("best_score_e6"))
      .orderBy("doc_id")
  }

  val textVacuumRoundsSql: String =
    s"""WITH $textFixtureSql,
       |live AS (SELECT * FROM corpus WHERE doc_id % 2 = 1),
       |${bm25RoundSql("live", "b1", "1")},
       |${bm25VerdictSql("b1", "1")},
       |adm1 AS (SELECT b1.doc_id, b1.text FROM b1
       |  JOIN v_1 v ON v.doc_id = b1.doc_id WHERE v.status = 'admitted'),
       |idx2 AS (SELECT doc_id, text FROM live
       |  UNION ALL SELECT doc_id, text FROM adm1),
       |b2 AS (SELECT doc_id + 300 AS doc_id, text FROM adm1),
       |${bm25RoundSql("idx2", "b2", "2")},
       |${bm25VerdictSql("b2", "2")}
       |SELECT CAST(1 AS INT) AS ingest, doc_id, status, n_matches,
       |  best_corpus_id, best_score_e6 FROM v_1
       |UNION ALL
       |SELECT CAST(2 AS INT) AS ingest, doc_id, status, n_matches,
       |  best_corpus_id, best_score_e6 FROM v_2
       |ORDER BY doc_id""".stripMargin

  /** q273: RECTIFICATION through the text index —
    * [[IndexStore.replaceTextDocs]] (verdict-13 ask #4) composed into
    * an ingest round: every fourth corpus doc is REPLACED under one
    * lease (tombstoned, its rectified text re-appended under a fresh
    * id — ids are never reused), then q262's head batch screens
    * against the post-replace corpus. The head copies of REPLACED
    * docs flip from 'duplicate' to 'admitted' (their originals are
    * gone and the replacements carry different rr-filler vocabulary,
    * so the copies match nothing at threshold), heads of UNREPLACED
    * evens stay duplicates, and every score is computed over the
    * post-replace statistics (N unchanged — one doc out, one in — but
    * df and Σdl shift with the rectified text). The oracle replays
    * the screen brute-force over exactly corpus-minus-replaced-plus-
    * replacements.
    */
  def textReplaceScreen(s: SparkSession, dir: String): DataFrame = {
    val (corpus, heads) = dilutionFixture(s, dir, off = 300)
    val path = scratchDir("text_replace_screen")
    IndexStore.saveTextIndex(corpus, "doc_id", "text", path)
    val base = t(s, dir, "documents")
      .where(col("doc_id") >= 100 && col("doc_id") < 300 &&
        col("text").isNotNull &&
        size(TextFunctions.tokens(col("text"))) >= 10)
      .select(col("doc_id"), col("text"))
    val repl = base
      .where(col("doc_id") < 200 && pmod(col("doc_id"), lit(4)) === 0)
      .select((col("doc_id") + 200).as("doc_id"), col("text"))
      .select(col("doc_id"), dilutedText("rr").as("text"))
    val oldIds = corpus
      .where(col("doc_id") < 200 && pmod(col("doc_id"), lit(4)) === 0)
      .select("doc_id")
    IndexStore.replaceTextDocs(repl, "doc_id", "text", path, oldIds)
    IndexStore.ingestText(heads, "doc_id", "text", path,
        minScoreE6 = 30000000L)
      .orderBy("doc_id")
  }

  val textReplaceScreenSql: String =
    s"""WITH $textFixtureSql,
       |repl AS (SELECT doc_id + 200 AS doc_id,
       |    text || ' ' || ${textDilSql("rr", "doc_id + 200")} AS text
       |  FROM base10 WHERE doc_id < 200 AND doc_id % 4 = 0),
       |live AS (SELECT doc_id, text FROM corpus
       |    WHERE NOT (doc_id < 200 AND doc_id % 4 = 0)
       |  UNION ALL SELECT doc_id, text FROM repl),
       |${bm25RoundSql("live", "b1", "1")},
       |${bm25VerdictSql("b1", "1")}
       |SELECT doc_id, status, n_matches, best_corpus_id, best_score_e6
       |FROM v_1 ORDER BY doc_id""".stripMargin

  /** q274: RECTIFICATION through the MEDIA index —
    * [[IndexStore.replaceMediaAssets]] (the replace* family's
    * perceptual member) composed into two ingest rounds: every
    * `gid % 4 == 0` corpus asset is REPLACED under one lease by the
    * SAME dHash class's other-JPEG-quality variant under a fresh id
    * (the re-encode/re-crawl shape: new bytes, new asset id, same
    * perceptual content), round 1 screens a batch against the
    * post-replace index (copies of replaced classes now match the
    * REPLACEMENT ids, never the tombstoned originals),
    * [[IndexStore.vacuumMediaIndex]] folds the replace's tombstones
    * between the rounds (probe-invisible by contract), and round 2
    * re-screens against the grown index. The oracle replays both
    * rounds brute-force over corpus−replaced+replacements from the
    * golden dHash fixture.
    */
  def mediaReplaceRounds(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashes = t(s, dir, "documents").select(col("doc_id")).as[Long]
      .filter((id: Long) => id < 500)
      .mapPartitions(_.flatMap { id =>
        Multimodal.dhash64(Fixtures.dhashAssetFor(id).media)
          .map(dh => (id, dh))
      }).toDF("doc_id", "dh")
      .localCheckpoint(true)
    val path = scratchDir("media_replace")
    val gid = pmod(col("doc_id"), lit(Fixtures.DhashClasses))
    val corpus = hashes.where(col("doc_id") < 200 && pmod(gid, lit(2)) === 0)
    IndexStore.saveMediaIndex(corpus, "doc_id", "dh", path)
    val replaced = corpus.where(pmod(gid, lit(4)) === 0)
    // the rectified asset: same class, other variant, fresh id + 200
    val repl = replaced
      .select((col("doc_id") + Fixtures.DhashClasses).as("doc_id"))
      .join(hashes, Seq("doc_id"))
      .select((col("doc_id") - Fixtures.DhashClasses + 200).as("doc_id"),
        col("dh"))
    IndexStore.replaceMediaAssets(repl, "doc_id", "dh", path,
      replaced.select("doc_id"))
    val v1 = IndexStore.ingestMedia(
        hashes.where(col("doc_id") >= 400 && col("doc_id") < 450),
        "doc_id", "dh", path)
      .withColumn("ingest", lit(1))
    IndexStore.vacuumMediaIndex(s, path)
    val v2 = IndexStore.ingestMedia(hashes.where(col("doc_id") >= 450),
        "doc_id", "dh", path)
      .withColumn("ingest", lit(2))
    v1.unionByName(v2)
      .select(col("ingest"), col("asset_id"), col("status"),
        col("n_matches"), col("best_corpus_id"), col("best_hamming"))
      .orderBy("asset_id")
  }

  val mediaReplaceRoundsSql: String =
    s"""WITH d AS (SELECT doc_id, doc_id % ${Fixtures.DhashClasses} AS gid,
       |    CAST((doc_id // ${Fixtures.DhashClasses}) % 2 AS INT) AS variant
       |  FROM documents WHERE doc_id < 500),
       |g AS (SELECT * FROM read_parquet(
       |        '/root/repo/fixtures/dhash_golden.parquet/*.parquet')),
       |h AS (SELECT d.doc_id, d.gid, g.dh FROM d
       |  JOIN g ON g.gid = d.gid AND g.variant = d.variant),
       |corpus0 AS (SELECT doc_id, gid, dh FROM h
       |  WHERE doc_id < 200 AND gid % 2 = 0),
       |repl AS (SELECT c.doc_id + 200 AS doc_id, h2.dh
       |  FROM corpus0 c JOIN h h2
       |    ON h2.doc_id = c.doc_id + ${Fixtures.DhashClasses}
       |  WHERE c.gid % 4 = 0),
       |live AS (SELECT doc_id, dh FROM corpus0 WHERE gid % 4 <> 0
       |  UNION ALL SELECT doc_id, dh FROM repl),
       |i1 AS (SELECT doc_id, dh FROM h
       |  WHERE doc_id >= 400 AND doc_id < 450),
       |i2 AS (SELECT doc_id, dh FROM h WHERE doc_id >= 450),
       |m1 AS (SELECT i1.doc_id AS asset_id, c.doc_id AS corpus_id,
       |    CAST(bit_count(xor(i1.dh, c.dh)) AS INT) AS hamming
       |  FROM i1 JOIN live c ON bit_count(xor(i1.dh, c.dh)) <= 3),
       |r1 AS (SELECT asset_id, corpus_id, hamming,
       |    row_number() OVER (PARTITION BY asset_id
       |                       ORDER BY hamming, corpus_id) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY asset_id) AS BIGINT) AS n
       |  FROM m1),
       |b1 AS (SELECT asset_id, corpus_id AS best_corpus_id,
       |    hamming AS best_hamming, n FROM r1 WHERE rn = 1),
       |v1 AS (SELECT i1.doc_id AS asset_id,
       |    CASE WHEN b.asset_id IS NULL THEN 'admitted'
       |         ELSE 'duplicate' END AS status,
       |    COALESCE(b.n, 0) AS n_matches, b.best_corpus_id,
       |    b.best_hamming
       |  FROM i1 LEFT JOIN b1 b ON b.asset_id = i1.doc_id),
       |idx2 AS (SELECT doc_id, dh FROM live
       |  UNION ALL
       |  SELECT doc_id, dh FROM i1 WHERE doc_id IN
       |    (SELECT asset_id FROM v1 WHERE status = 'admitted')),
       |m2 AS (SELECT i2.doc_id AS asset_id, c.doc_id AS corpus_id,
       |    CAST(bit_count(xor(i2.dh, c.dh)) AS INT) AS hamming
       |  FROM i2 JOIN idx2 c ON bit_count(xor(i2.dh, c.dh)) <= 3),
       |r2 AS (SELECT asset_id, corpus_id, hamming,
       |    row_number() OVER (PARTITION BY asset_id
       |                       ORDER BY hamming, corpus_id) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY asset_id) AS BIGINT) AS n
       |  FROM m2),
       |b2 AS (SELECT asset_id, corpus_id AS best_corpus_id,
       |    hamming AS best_hamming, n FROM r2 WHERE rn = 1),
       |v2 AS (SELECT i2.doc_id AS asset_id,
       |    CASE WHEN b.asset_id IS NULL THEN 'admitted'
       |         ELSE 'duplicate' END AS status,
       |    COALESCE(b.n, 0) AS n_matches, b.best_corpus_id,
       |    b.best_hamming
       |  FROM i2 LEFT JOIN b2 b ON b.asset_id = i2.doc_id)
       |SELECT CAST(1 AS INT) AS ingest, asset_id, status, n_matches,
       |  best_corpus_id, best_hamming FROM v1
       |UNION ALL
       |SELECT CAST(2 AS INT) AS ingest, asset_id, status, n_matches,
       |  best_corpus_id, best_hamming FROM v2
       |ORDER BY asset_id""".stripMargin

  /** q264: TAKEDOWN deletes through the MEDIA ingest lifecycle —
    * [[IndexStore.deleteFromMediaIndex]] + [[IndexStore.vacuumMediaIndex]]
    * composed into q248's two-round fixture: every corpus asset of the
    * gid % 4 == 0 dHash classes is tombstoned before round 1 (their
    * round-1 batch copies flip from 'duplicate' to 'admitted' — the
    * deleted originals can no longer match), the vacuum folds the
    * tombstones between the rounds (probe-invisible by contract), and
    * round 2 re-screens every class at the other JPEG quality against
    * the grown index — the formerly-deleted classes now match ROUND
    * 1's admissions, never the deleted originals. The oracle replays
    * both rounds from the committed golden with the live corpus
    * (gid % 4 ≠ 0), so a single resurrected or lost row breaks the
    * hash.
    */
  def mediaDeleteRounds(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashes = t(s, dir, "documents").select(col("doc_id")).as[Long]
      .filter((id: Long) => id < 500)
      .mapPartitions(_.flatMap { id =>
        Multimodal.dhash64(Fixtures.dhashAssetFor(id).media)
          .map(dh => (id, dh))
      }).toDF("doc_id", "dh")
      .localCheckpoint(true)
    val path = scratchDir("media_delete")
    val gid = pmod(col("doc_id"), lit(Fixtures.DhashClasses))
    val corpus = hashes.where(col("doc_id") < 280 && pmod(gid, lit(2)) === 0)
    IndexStore.saveMediaIndex(corpus, "doc_id", "dh", path)
    IndexStore.deleteFromMediaIndex(s, path,
      corpus.where(pmod(gid, lit(4)) === 0).select("doc_id"))
    val v1 = IndexStore.ingestMedia(
        hashes.where(col("doc_id") >= 280 && col("doc_id") < 390),
        "doc_id", "dh", path)
      .withColumn("ingest", lit(1))
    IndexStore.vacuumMediaIndex(s, path)
    val v2 = IndexStore.ingestMedia(hashes.where(col("doc_id") >= 390),
        "doc_id", "dh", path)
      .withColumn("ingest", lit(2))
    v1.unionByName(v2)
      .select(col("ingest"), col("asset_id"), col("status"),
        col("n_matches"), col("best_corpus_id"), col("best_hamming"))
      .orderBy("asset_id")
  }

  val mediaDeleteRoundsSql: String =
    s"""WITH d AS (SELECT doc_id, doc_id % ${Fixtures.DhashClasses} AS gid,
       |    CAST((doc_id // ${Fixtures.DhashClasses}) % 2 AS INT) AS variant
       |  FROM documents WHERE doc_id < 500),
       |g AS (SELECT * FROM read_parquet(
       |        '/root/repo/fixtures/dhash_golden.parquet/*.parquet')),
       |h AS (SELECT d.doc_id, d.gid, g.dh FROM d
       |  JOIN g ON g.gid = d.gid AND g.variant = d.variant),
       |corpus AS (SELECT doc_id, dh FROM h
       |  WHERE doc_id < 280 AND gid % 2 = 0 AND gid % 4 <> 0),
       |i1 AS (SELECT doc_id, dh FROM h
       |  WHERE doc_id >= 280 AND doc_id < 390),
       |i2 AS (SELECT doc_id, dh FROM h WHERE doc_id >= 390),
       |m1 AS (SELECT i1.doc_id AS asset_id, c.doc_id AS corpus_id,
       |    CAST(bit_count(xor(i1.dh, c.dh)) AS INT) AS hamming
       |  FROM i1 JOIN corpus c ON bit_count(xor(i1.dh, c.dh)) <= 3),
       |r1 AS (SELECT asset_id, corpus_id, hamming,
       |    row_number() OVER (PARTITION BY asset_id
       |                       ORDER BY hamming, corpus_id) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY asset_id) AS BIGINT) AS n
       |  FROM m1),
       |b1 AS (SELECT asset_id, corpus_id AS best_corpus_id,
       |    hamming AS best_hamming, n FROM r1 WHERE rn = 1),
       |v1 AS (SELECT i1.doc_id AS asset_id,
       |    CASE WHEN b.asset_id IS NULL THEN 'admitted'
       |         ELSE 'duplicate' END AS status,
       |    COALESCE(b.n, 0) AS n_matches, b.best_corpus_id,
       |    b.best_hamming
       |  FROM i1 LEFT JOIN b1 b ON b.asset_id = i1.doc_id),
       |idx2 AS (SELECT * FROM corpus
       |  UNION ALL
       |  SELECT doc_id, dh FROM i1 WHERE doc_id IN
       |    (SELECT asset_id FROM v1 WHERE status = 'admitted')),
       |m2 AS (SELECT i2.doc_id AS asset_id, c.doc_id AS corpus_id,
       |    CAST(bit_count(xor(i2.dh, c.dh)) AS INT) AS hamming
       |  FROM i2 JOIN idx2 c ON bit_count(xor(i2.dh, c.dh)) <= 3),
       |r2 AS (SELECT asset_id, corpus_id, hamming,
       |    row_number() OVER (PARTITION BY asset_id
       |                       ORDER BY hamming, corpus_id) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY asset_id) AS BIGINT) AS n
       |  FROM m2),
       |b2 AS (SELECT asset_id, corpus_id AS best_corpus_id,
       |    hamming AS best_hamming, n FROM r2 WHERE rn = 1),
       |v2 AS (SELECT i2.doc_id AS asset_id,
       |    CASE WHEN b.asset_id IS NULL THEN 'admitted'
       |         ELSE 'duplicate' END AS status,
       |    COALESCE(b.n, 0) AS n_matches, b.best_corpus_id,
       |    b.best_hamming
       |  FROM i2 LEFT JOIN b2 b ON b.asset_id = i2.doc_id)
       |SELECT CAST(1 AS INT) AS ingest, asset_id, status, n_matches,
       |  best_corpus_id, best_hamming FROM v1
       |UNION ALL
       |SELECT CAST(2 AS INT) AS ingest, asset_id, status, n_matches,
       |  best_corpus_id, best_hamming FROM v2
       |ORDER BY asset_id""".stripMargin

  /** q265: TAKEDOWN deletes through the VECTOR ingest lifecycle —
    * q264's semantic sibling on q250's planted-cluster fixture: every
    * corpus vector of cluster 0 (vec_id % 16 == 0) is tombstoned
    * before round 1, so ingest-1's cluster-0 vectors flip to
    * 'admitted'; the vacuum folds between the rounds (pruning the dead
    * families' reps/blocks); round 2's cluster-0 duplicates then match
    * ONLY round 1's admissions. Full sign-block + unrounded-cos
    * replay over the live corpus.
    */
  def vectorDeleteRounds(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), clusteredVec.as("cv"))
    val path = scratchDir("vec_delete")
    val corpus =
      e.where(col("vec_id") < 300 && pmod(col("vec_id"), lit(16)) % 2 === 0)
    IndexStore.saveVectorIndex(corpus, "vec_id", "cv", path,
      dim = 32, numBlocks = 16, planesPerBlock = 4)
    IndexStore.deleteFromVectorIndex(s, path,
      corpus.where(pmod(col("vec_id"), lit(16)) === 0).select("vec_id"))
    val v1 = IndexStore.ingestVector(
        e.where(col("vec_id") >= 300 && col("vec_id") < 400),
        "vec_id", "cv", path, threshold = 0.9)
      .withColumn("ingest", lit(1))
    IndexStore.vacuumVectorIndex(s, path)
    val v2 = IndexStore.ingestVector(
        e.where(col("vec_id") >= 400 && col("vec_id") < 500),
        "vec_id", "cv", path, threshold = 0.9)
      .withColumn("ingest", lit(2))
    v1.unionByName(v2)
      .select(col("ingest"), col("vec_id"), col("status"),
        col("n_matches"), col("best_corpus_id"), col("best_cos"))
      .orderBy("vec_id")
  }

  val vectorDeleteRoundsSql: String = {
    val cosOf = (q: String, c: String) =>
      s"""COALESCE(list_dot_product($q.v, $c.v) /
         |      (sqrt(list_dot_product($q.v, $q.v)) *
         |       sqrt(list_dot_product($c.v, $c.v))), 0.0)""".stripMargin
    s"""${annSigPrefix(16, 4, dim = 32, vecSql = clusteredVecSql)},
       |corpus AS (SELECT vec_id FROM e
       |  WHERE vec_id < 300 AND (vec_id % 16) % 2 = 0
       |    AND vec_id % 16 <> 0),
       |i1 AS (SELECT vec_id FROM e WHERE vec_id >= 300 AND vec_id < 400),
       |i2 AS (SELECT vec_id FROM e WHERE vec_id >= 400 AND vec_id < 500),
       |cand1 AS (SELECT DISTINCT q.vec_id AS new_id, c.vec_id AS corpus_id
       |  FROM sig q JOIN sig c
       |    ON q.block_idx = c.block_idx AND q.band_hash = c.band_hash
       |  WHERE q.vec_id IN (SELECT vec_id FROM i1)
       |    AND c.vec_id IN (SELECT vec_id FROM corpus)),
       |m1 AS (SELECT cand1.new_id, cand1.corpus_id,
       |    round(${cosOf("qe", "ce")}, 6) AS cos
       |  FROM cand1 JOIN e qe ON qe.vec_id = cand1.new_id
       |             JOIN e ce ON ce.vec_id = cand1.corpus_id
       |  WHERE ${cosOf("qe", "ce")} >= 0.9),
       |r1 AS (SELECT new_id, corpus_id, cos,
       |    row_number() OVER (PARTITION BY new_id
       |                       ORDER BY cos DESC, corpus_id ASC) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY new_id) AS BIGINT) AS n
       |  FROM m1),
       |b1 AS (SELECT new_id, corpus_id AS best_corpus_id, cos AS best_cos,
       |    n FROM r1 WHERE rn = 1),
       |v1 AS (SELECT i1.vec_id,
       |    CASE WHEN b.new_id IS NULL THEN 'admitted'
       |         ELSE 'duplicate' END AS status,
       |    COALESCE(b.n, 0) AS n_matches, b.best_corpus_id, b.best_cos
       |  FROM i1 LEFT JOIN b1 b ON b.new_id = i1.vec_id),
       |idx2 AS (SELECT vec_id FROM corpus
       |  UNION ALL
       |  SELECT vec_id FROM v1 WHERE status = 'admitted'),
       |cand2 AS (SELECT DISTINCT q.vec_id AS new_id, c.vec_id AS corpus_id
       |  FROM sig q JOIN sig c
       |    ON q.block_idx = c.block_idx AND q.band_hash = c.band_hash
       |  WHERE q.vec_id IN (SELECT vec_id FROM i2)
       |    AND c.vec_id IN (SELECT vec_id FROM idx2)),
       |m2 AS (SELECT cand2.new_id, cand2.corpus_id,
       |    round(${cosOf("qe", "ce")}, 6) AS cos
       |  FROM cand2 JOIN e qe ON qe.vec_id = cand2.new_id
       |             JOIN e ce ON ce.vec_id = cand2.corpus_id
       |  WHERE ${cosOf("qe", "ce")} >= 0.9),
       |r2 AS (SELECT new_id, corpus_id, cos,
       |    row_number() OVER (PARTITION BY new_id
       |                       ORDER BY cos DESC, corpus_id ASC) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY new_id) AS BIGINT) AS n
       |  FROM m2),
       |b2 AS (SELECT new_id, corpus_id AS best_corpus_id, cos AS best_cos,
       |    n FROM r2 WHERE rn = 1),
       |v2 AS (SELECT i2.vec_id,
       |    CASE WHEN b.new_id IS NULL THEN 'admitted'
       |         ELSE 'duplicate' END AS status,
       |    COALESCE(b.n, 0) AS n_matches, b.best_corpus_id, b.best_cos
       |  FROM i2 LEFT JOIN b2 b ON b.new_id = i2.vec_id)
       |SELECT CAST(1 AS INT) AS ingest, vec_id, status, n_matches,
       |  best_corpus_id, best_cos FROM v1
       |UNION ALL
       |SELECT CAST(2 AS INT) AS ingest, vec_id, status, n_matches,
       |  best_corpus_id, best_cos FROM v2
       |ORDER BY vec_id""".stripMargin
  }

  /** q266: TAKEDOWN deletes through the CORPUS (MinHash-LSH) ingest
    * lifecycle — the lexical sibling, on q253's dilution fixture:
    * every corpus doc with doc_id % 4 == 0 is tombstoned before
    * round 1 (a MIXED flip: even-base heads whose original was
    * deleted — base id % 4 == 0 — now admit, the other even-base
    * heads still reject at jaccard 1.0, odd-base heads admit as
    * always); the vacuum folds between the rounds (pruning the dead
    * singleton families' sets/bands); round 2 rejects exact copies of
    * round 1's admissions against the grown index. Construction
    * replay + brute-force exact jaccard over the live corpus.
    */
  def corpusDeleteRounds(s: SparkSession, dir: String): DataFrame = {
    val (corpus, heads) = dilutionFixture(s, dir, off = 200)
    val path = scratchDir("corpus_delete")
    IndexStore.saveCorpusIndex(corpus, "doc_id", "text", path)
    IndexStore.deleteFromCorpusIndex(s, path,
      corpus.where(pmod(col("doc_id"), lit(4)) === 0).select("doc_id"))
    val batch1 = heads.localCheckpoint(true)
    val v1 = IndexStore.ingestCorpus(batch1, "doc_id", "text", path,
      threshold = 0.7).withColumn("ingest", lit(1))
    IndexStore.vacuumCorpusIndex(s, path)
    val batch2 = batch1
      .join(v1.where(col("status") === "admitted").select("doc_id"),
        Seq("doc_id"))
      .select((col("doc_id") + 200).as("doc_id"), col("text"))
    val v2 = IndexStore.ingestCorpus(batch2, "doc_id", "text", path,
      threshold = 0.7).withColumn("ingest", lit(2))
    v1.unionByName(v2)
      .select(col("ingest"), col("doc_id"), col("status"),
        col("n_matches"), col("best_corpus_id"), col("best_jaccard"))
      .orderBy("doc_id")
  }

  val corpusDeleteRoundsSql: String = {
    def dil(prefix: String, idExpr: String): String =
      s"""array_to_string(['$prefix' || CAST($idExpr AS VARCHAR) || 'x' ||
         |      CAST(i AS VARCHAR) for i in range(1, 2 * len(toks) + 1)], ' ')"""
        .stripMargin
    val toksOf = duckToks
    val shOf = duckShingles
    s"""WITH base AS (
       |  SELECT doc_id, text, $toksOf AS toks FROM documents
       |  WHERE doc_id >= 100 AND doc_id < 300 AND text IS NOT NULL),
       |base10 AS (SELECT * FROM base WHERE len(toks) >= 10),
       |corpus AS (SELECT doc_id,
       |    text || ' ' || ${dil("cc", "doc_id")} AS text
       |  FROM base10),
       |evens AS (SELECT doc_id + 200 AS doc_id, text FROM corpus
       |  WHERE doc_id < 200 AND doc_id % 2 = 0),
       |odds AS (SELECT doc_id + 200 AS doc_id,
       |    text || ' ' || ${dil("zz", "doc_id + 200")} AS text
       |  FROM base10 WHERE doc_id < 200 AND doc_id % 2 = 1),
       |b1 AS (SELECT * FROM evens UNION ALL SELECT * FROM odds),
       |csh AS (SELECT doc_id, $shOf AS sh
       |  FROM (SELECT doc_id, $toksOf AS toks FROM corpus
       |        WHERE doc_id % 4 <> 0)),
       |b1sh AS (SELECT doc_id, $shOf AS sh
       |  FROM (SELECT doc_id, $toksOf AS toks FROM b1)),
       |m1 AS (SELECT * FROM (
       |    SELECT b.doc_id AS doc_id, c.doc_id AS corpus_id,
       |      round(CAST(len(list_intersect(b.sh, c.sh)) AS DOUBLE) /
       |            len(list_distinct(list_concat(b.sh, c.sh))), 4) AS jaccard
       |    FROM b1sh b JOIN csh c ON true)
       |  WHERE jaccard >= 0.7),
       |r1 AS (SELECT doc_id, corpus_id, jaccard,
       |    row_number() OVER (PARTITION BY doc_id
       |                       ORDER BY jaccard DESC, corpus_id) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n
       |  FROM m1),
       |best1 AS (SELECT doc_id, corpus_id AS best_corpus_id,
       |    jaccard AS best_jaccard, n FROM r1 WHERE rn = 1),
       |v1 AS (SELECT b.doc_id,
       |    CASE WHEN best1.doc_id IS NULL THEN 'admitted'
       |         ELSE 'duplicate' END AS status,
       |    COALESCE(best1.n, 0) AS n_matches, best1.best_corpus_id,
       |    best1.best_jaccard
       |  FROM b1 b LEFT JOIN best1 ON best1.doc_id = b.doc_id),
       |idx2 AS (SELECT * FROM csh
       |  UNION ALL
       |  SELECT doc_id, sh FROM b1sh WHERE doc_id IN
       |    (SELECT doc_id FROM v1 WHERE status = 'admitted')),
       |b2sh AS (SELECT doc_id + 200 AS doc_id, sh FROM b1sh
       |  WHERE doc_id IN (SELECT doc_id FROM v1 WHERE status = 'admitted')),
       |m2 AS (SELECT * FROM (
       |    SELECT b.doc_id AS doc_id, c.doc_id AS corpus_id,
       |      round(CAST(len(list_intersect(b.sh, c.sh)) AS DOUBLE) /
       |            len(list_distinct(list_concat(b.sh, c.sh))), 4) AS jaccard
       |    FROM b2sh b JOIN idx2 c ON true)
       |  WHERE jaccard >= 0.7),
       |r2 AS (SELECT doc_id, corpus_id, jaccard,
       |    row_number() OVER (PARTITION BY doc_id
       |                       ORDER BY jaccard DESC, corpus_id) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n
       |  FROM m2),
       |best2 AS (SELECT doc_id, corpus_id AS best_corpus_id,
       |    jaccard AS best_jaccard, n FROM r2 WHERE rn = 1),
       |v2 AS (SELECT b.doc_id,
       |    CASE WHEN best2.doc_id IS NULL THEN 'admitted'
       |         ELSE 'duplicate' END AS status,
       |    COALESCE(best2.n, 0) AS n_matches, best2.best_corpus_id,
       |    best2.best_jaccard
       |  FROM b2sh b LEFT JOIN best2 ON best2.doc_id = b.doc_id)
       |SELECT CAST(1 AS INT) AS ingest, doc_id, status, n_matches,
       |  best_corpus_id, best_jaccard FROM v1
       |UNION ALL
       |SELECT CAST(2 AS INT) AS ingest, doc_id, status, n_matches,
       |  best_corpus_id, best_jaccard FROM v2
       |ORDER BY doc_id""".stripMargin
  }

  /** q269: SHARD-PARALLEL build for the MEDIA index —
    * [[IndexStore.mergeMediaIndexes]] registered at full oracle depth:
    * q248's corpus is split by doc_id parity into two shard indexes
    * (the same dHash class lands in BOTH shards, so the merge's
    * band-row dedup is structurally exercised), merged, and the
    * standard TWO ingest rounds run against the merged index — while
    * the oracle replays them against the single undivided corpus
    * ([[mediaIngestRoundsSql]] shared verbatim, the q252 precedent):
    * a duplicated band row would double candidates, a lost member
    * would flip a verdict, and either breaks the hash.
    */
  def mediaIndexMerged(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashes = t(s, dir, "documents").select(col("doc_id")).as[Long]
      .filter((id: Long) => id < 500)
      .mapPartitions(_.flatMap { id =>
        Multimodal.dhash64(Fixtures.dhashAssetFor(id).media)
          .map(dh => (id, dh))
      }).toDF("doc_id", "dh")
      .localCheckpoint(true)
    val shardA = scratchDir("media_merge_shard_a")
    val shardB = scratchDir("media_merge_shard_b")
    val out = scratchDir("media_merge_out")
    val gid = pmod(col("doc_id"), lit(Fixtures.DhashClasses))
    val corpus = hashes.where(col("doc_id") < 280 && pmod(gid, lit(2)) === 0)
    IndexStore.saveMediaIndex(
      corpus.where(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "dh",
      shardA)
    IndexStore.saveMediaIndex(
      corpus.where(pmod(col("doc_id"), lit(2)) === 1), "doc_id", "dh",
      shardB)
    IndexStore.mergeMediaIndexes(s, Seq(shardA, shardB), out)
    val v1 = IndexStore.ingestMedia(
        hashes.where(col("doc_id") >= 280 && col("doc_id") < 390),
        "doc_id", "dh", out)
      .withColumn("ingest", lit(1))
    val v2 = IndexStore.ingestMedia(hashes.where(col("doc_id") >= 390),
        "doc_id", "dh", out)
      .withColumn("ingest", lit(2))
    v1.unionByName(v2)
      .select(col("ingest"), col("asset_id"), col("status"),
        col("n_matches"), col("best_corpus_id"), col("best_hamming"))
      .orderBy("asset_id")
  }

  /** q270: SHARD-PARALLEL build for the VECTOR index —
    * [[IndexStore.mergeVectorIndexes]] end to end: q250's corpus split
    * at vec_id 150, merged (rep-group consolidation by vector value —
    * exercised adversarially with cross-shard exact-dup families in
    * IndexStoreSpec; this fixture's vectors are distinct, so here the
    * merge must simply reproduce the single build), then the standard
    * two ingest rounds against the merged index vs the undivided
    * oracle ([[vectorIngestRoundsSql]] shared verbatim).
    */
  def vectorIndexMerged(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), clusteredVec.as("cv"))
    val shardA = scratchDir("vec_merge_shard_a")
    val shardB = scratchDir("vec_merge_shard_b")
    val out = scratchDir("vec_merge_out")
    val corpus =
      e.where(col("vec_id") < 300 && pmod(col("vec_id"), lit(16)) % 2 === 0)
    IndexStore.saveVectorIndex(corpus.where(col("vec_id") < 150),
      "vec_id", "cv", shardA, dim = 32, numBlocks = 16, planesPerBlock = 4)
    IndexStore.saveVectorIndex(corpus.where(col("vec_id") >= 150),
      "vec_id", "cv", shardB, dim = 32, numBlocks = 16, planesPerBlock = 4)
    IndexStore.mergeVectorIndexes(s, Seq(shardA, shardB), out)
    val v1 = IndexStore.ingestVector(
        e.where(col("vec_id") >= 300 && col("vec_id") < 400),
        "vec_id", "cv", out, threshold = 0.9)
      .withColumn("ingest", lit(1))
    val v2 = IndexStore.ingestVector(
        e.where(col("vec_id") >= 400 && col("vec_id") < 500),
        "vec_id", "cv", out, threshold = 0.9)
      .withColumn("ingest", lit(2))
    v1.unionByName(v2)
      .select(col("ingest"), col("vec_id"), col("status"),
        col("n_matches"), col("best_corpus_id"), col("best_cos"))
      .orderBy("vec_id")
  }

  /** q271: SHARD-PARALLEL build for the CORPUS (MinHash-LSH) index —
    * [[IndexStore.mergeCorpusIndexes]] end to end: q253's dilution
    * corpus split by doc_id parity, merged (exact-text family
    * consolidation — adversarial cross-shard families in
    * IndexStoreSpec), then the standard two ingest rounds vs the
    * undivided oracle ([[corpusIngestRoundsSql]] shared verbatim).
    */
  def corpusIndexMerged(s: SparkSession, dir: String): DataFrame = {
    val (corpus, heads) = dilutionFixture(s, dir, off = 200)
    val shardA = scratchDir("corpus_merge_shard_a")
    val shardB = scratchDir("corpus_merge_shard_b")
    val out = scratchDir("corpus_merge_out")
    IndexStore.saveCorpusIndex(
      corpus.where(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text",
      shardA)
    IndexStore.saveCorpusIndex(
      corpus.where(pmod(col("doc_id"), lit(2)) === 1), "doc_id", "text",
      shardB)
    IndexStore.mergeCorpusIndexes(s, Seq(shardA, shardB), out)
    val batch1 = heads.localCheckpoint(true)
    val v1 = IndexStore.ingestCorpus(batch1, "doc_id", "text", out,
      threshold = 0.7).withColumn("ingest", lit(1))
    val batch2 = batch1
      .join(v1.where(col("status") === "admitted").select("doc_id"),
        Seq("doc_id"))
      .select((col("doc_id") + 200).as("doc_id"), col("text"))
    val v2 = IndexStore.ingestCorpus(batch2, "doc_id", "text", out,
      threshold = 0.7).withColumn("ingest", lit(2))
    v1.unionByName(v2)
      .select(col("ingest"), col("doc_id"), col("status"),
        col("n_matches"), col("best_corpus_id"), col("best_jaccard"))
      .orderBy("doc_id")
  }

  /** q268: a TEXT ingest round under the LOSSLESS MaxScore candidate
    * prune — [[TextAnalysis.bm25ScoredIndexed]]'s `pruneThresholdE6`
    * registered end to end. Unlike q260's `maxDfPpm` (which DROPS
    * near-zero terms and changes scores by that documented rule), the
    * MaxScore cut never changes a score: per-term contributions are
    * bounded by ub = ⌊idf·(k1+1)·1e6⌋, a query's ascending-ub prefix
    * whose ub-sum stays under the threshold is non-essential, and only
    * docs carrying an essential term are scored — every ≥-threshold
    * verdict is bit-identical. On this fixture the prune provably has
    * work to skip (the shared base-text words' ubs sum below the 30M
    * threshold, so their whole postings lists leave the multiply; the
    * df=1 filler terms stay essential and carry every decision), yet
    * the oracle is EXACTLY the unpruned round-1 replay — the
    * losslessness proof at full algorithm depth.
    */
  def textIngestMaxscore(s: SparkSession, dir: String): DataFrame = {
    val (corpus, heads) = dilutionFixture(s, dir, off = 300)
    val path = scratchDir("text_ingest_maxscore")
    IndexStore.saveTextIndex(corpus, "doc_id", "text", path)
    IndexStore.ingestText(heads, "doc_id", "text", path,
        minScoreE6 = 30000000L, maxScorePrune = true)
      .orderBy("doc_id")
  }

  val textIngestMaxscoreSql: String =
    s"""WITH $textFixtureSql,
       |${bm25RoundSql("corpus", "b1", "1")},
       |${bm25VerdictSql("b1", "1")}
       |SELECT doc_id, status, n_matches, best_corpus_id, best_score_e6
       |FROM v_1 ORDER BY doc_id""".stripMargin

  /** q267: TAKEDOWN deletes through the persisted IVF model —
    * [[IndexStore.deleteFromIvf]] + [[IndexStore.vacuumIvf]] on q55's
    * planted-cluster fixture: the two nearest same-cluster neighbors
    * of every query (vec_ids 16–47) are tombstoned, phase 1 searches
    * the TOMBSTONE path (load anti-joins the inverted lists), the
    * vacuum folds, and phase 2 searches the folded model — both
    * phases must produce the identical brute-force top-5 over the
    * live corpus (the deleted vectors are gone from recall the moment
    * the delete returns, and the vacuum changes nothing). Honest
    * nProbe = 2/16 stays exact by the planted-separation argument:
    * clusters remain compact after losing two members each.
    */
  def ivfDeleteSearch(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), clusteredVec.as("cv"))
    val path = scratchDir("ivf_delete")
    IndexStore.saveIvf(
      IvfIndex.build(e, "vec_id", "cv", nLists = 16,
        trainFraction = 1.0, kmeansMaxIter = 10), path)
    IndexStore.deleteFromIvf(s, path,
      e.where(col("vec_id") >= 16 && col("vec_id") < 48).select("vec_id"))
    val s1 = IvfIndex.search(IndexStore.loadIvf(s, path), e,
        e.where(col("vec_id") < 10), "vec_id", "cv", k = 5, nProbe = 2)
      .withColumn("phase", lit(1))
    IndexStore.vacuumIvf(s, path)
    val s2 = IvfIndex.search(IndexStore.loadIvf(s, path), e,
        e.where(col("vec_id") < 10), "vec_id", "cv", k = 5, nProbe = 2)
      .withColumn("phase", lit(2))
    s1.unionByName(s2)
      .select(col("phase"), col("query_id"), col("rank"),
        col("neighbor_id"), col("cos"))
      .orderBy("phase", "query_id", "rank")
  }

  val ivfDeleteSearchSql: String =
    s"""WITH e AS (SELECT vec_id, $clusteredVecSql AS v FROM embeddings),
       |live AS (SELECT * FROM e WHERE vec_id < 16 OR vec_id >= 48),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    COALESCE(list_dot_product(q.v, c.v) /
       |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 0.0E0) AS cos
       |  FROM e q JOIN live c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < 10),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cos DESC, neighbor_id ASC) AS rank
       |  FROM scored),
       |top AS (SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos
       |  FROM ranked WHERE rank <= 5)
       |SELECT CAST(1 AS INT) AS phase, query_id, rank, neighbor_id, cos
       |FROM top
       |UNION ALL
       |SELECT CAST(2 AS INT) AS phase, query_id, rank, neighbor_id, cos
       |FROM top
       |ORDER BY phase, query_id, rank""".stripMargin

  val mediaIngestRoundsSql: String =
    s"""WITH d AS (SELECT doc_id, doc_id % ${Fixtures.DhashClasses} AS gid,
       |    CAST((doc_id // ${Fixtures.DhashClasses}) % 2 AS INT) AS variant
       |  FROM documents WHERE doc_id < 500),
       |g AS (SELECT * FROM read_parquet(
       |        '/root/repo/fixtures/dhash_golden.parquet/*.parquet')),
       |h AS (SELECT d.doc_id, d.gid, g.dh FROM d
       |  JOIN g ON g.gid = d.gid AND g.variant = d.variant),
       |corpus AS (SELECT doc_id, dh FROM h
       |  WHERE doc_id < 280 AND gid % 2 = 0),
       |i1 AS (SELECT doc_id, dh FROM h
       |  WHERE doc_id >= 280 AND doc_id < 390),
       |i2 AS (SELECT doc_id, dh FROM h WHERE doc_id >= 390),
       |m1 AS (SELECT i1.doc_id AS asset_id, c.doc_id AS corpus_id,
       |    CAST(bit_count(xor(i1.dh, c.dh)) AS INT) AS hamming
       |  FROM i1 JOIN corpus c ON bit_count(xor(i1.dh, c.dh)) <= 3),
       |r1 AS (SELECT asset_id, corpus_id, hamming,
       |    row_number() OVER (PARTITION BY asset_id
       |                       ORDER BY hamming, corpus_id) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY asset_id) AS BIGINT) AS n
       |  FROM m1),
       |b1 AS (SELECT asset_id, corpus_id AS best_corpus_id,
       |    hamming AS best_hamming, n FROM r1 WHERE rn = 1),
       |v1 AS (SELECT i1.doc_id AS asset_id,
       |    CASE WHEN b.asset_id IS NULL THEN 'admitted'
       |         ELSE 'duplicate' END AS status,
       |    COALESCE(b.n, 0) AS n_matches, b.best_corpus_id,
       |    b.best_hamming
       |  FROM i1 LEFT JOIN b1 b ON b.asset_id = i1.doc_id),
       |idx2 AS (SELECT * FROM corpus
       |  UNION ALL
       |  SELECT doc_id, dh FROM i1 WHERE doc_id IN
       |    (SELECT asset_id FROM v1 WHERE status = 'admitted')),
       |m2 AS (SELECT i2.doc_id AS asset_id, c.doc_id AS corpus_id,
       |    CAST(bit_count(xor(i2.dh, c.dh)) AS INT) AS hamming
       |  FROM i2 JOIN idx2 c ON bit_count(xor(i2.dh, c.dh)) <= 3),
       |r2 AS (SELECT asset_id, corpus_id, hamming,
       |    row_number() OVER (PARTITION BY asset_id
       |                       ORDER BY hamming, corpus_id) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY asset_id) AS BIGINT) AS n
       |  FROM m2),
       |b2 AS (SELECT asset_id, corpus_id AS best_corpus_id,
       |    hamming AS best_hamming, n FROM r2 WHERE rn = 1),
       |v2 AS (SELECT i2.doc_id AS asset_id,
       |    CASE WHEN b.asset_id IS NULL THEN 'admitted'
       |         ELSE 'duplicate' END AS status,
       |    COALESCE(b.n, 0) AS n_matches, b.best_corpus_id,
       |    b.best_hamming
       |  FROM i2 LEFT JOIN b2 b ON b.asset_id = i2.doc_id)
       |SELECT CAST(1 AS INT) AS ingest, asset_id, status, n_matches,
       |  best_corpus_id, best_hamming FROM v1
       |UNION ALL
       |SELECT CAST(2 AS INT) AS ingest, asset_id, status, n_matches,
       |  best_corpus_id, best_hamming FROM v2
       |ORDER BY asset_id""".stripMargin
}
