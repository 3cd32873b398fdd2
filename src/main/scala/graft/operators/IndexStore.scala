package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet persistence + incremental maintenance for the three ANN /
  * near-dup indexes (SURVEY §3.3 "100 TB posture"): the MinHash-LSH
  * corpus index ([[Dedup.CorpusIndex]]), the sign-pattern vector index
  * ([[Similarity.VectorIndex]]), and the IVF model ([[IvfIndex.Model]]).
  *
  * At 100 TB you do not rebuild an index per job: you build it ONCE,
  * persist it, and probe it from every batch and stream forever,
  * appending each day's admitted documents/vectors. This module is that
  * lifecycle. No reference counterpart (the reference is a clustering
  * lib; only its fitted model persists) — this is north-star surface.
  *
  * Design invariants:
  *  - **Append ≡ rebuild.** The stored band/block tables are UNCAPPED;
  *    the `maxBucketSize` cap is applied at LOAD ([[Dedup.capCorpusTables]])
  *    over the full merged table. Capping before persisting would freeze
  *    cap decisions made against the OLD bucket sizes — a bucket that
  *    grows past the cap after appends must be dropped everywhere, and
  *    one that was capped only because of since-merged duplicates must
  *    come back. The cap pass is one partial-count aggregation over a
  *    narrow (id + two longs) table — cheap relative to any probe.
  *  - **Monotone ids.** Append assumes (and ENFORCES, raising loudly)
  *    that new ids sort strictly after every existing member id — the
  *    natural shape of an ingest pipeline with increasing doc ids. This
  *    is what keeps group representatives stable: a rebuilt index picks
  *    rep = min member id per duplicate group, and with monotone ids an
  *    existing rep can never lose that minimum to an appended member.
  *  - **Exact-duplicate merge.** A new doc whose text (or vector)
  *    exactly equals an existing representative's joins that rep's
  *    member list instead of forming a new group — the sets/reps table
  *    carries the group key (text / vector) precisely so this merge is
  *    an equi-join, not a rebuild.
  *  - **Layout.** Each table is written repartitioned by its probe join
  *    key (band_hash / corpus_id / list_id), so files are clustered for
  *    row-group pruning. On a real cluster with a metastore, the same
  *    tables belong in `bucketBy(key).sortBy(key)` tables so the probe
  *    equi-join is shuffle-free on the corpus side; path-parquet keeps
  *    this module metastore-free while preserving the storage layout.
  *  - Build parameters (shingle/hash/band counts, hyperplane geometry)
  *    ride in a `meta` table so load/append can never drift from the
  *    parameters the index was built with.
  *
  * IVF append is deliberately different: the coarse quantizer is NOT
  * retrained (that would re-partition every existing list); new vectors
  * are assigned to the EXISTING centroids and appended to the inverted
  * lists — the standard IVF maintenance contract (retrain on compaction
  * cadence, not per batch). Its invariant is therefore "append ≡
  * assign-all with the same centroids", proven in IndexStoreSpec.
  */
object IndexStore {

  // ---------------------------------------------------------------
  // meta
  // ---------------------------------------------------------------

  private def writeMeta(
      spark: SparkSession, path: String, kv: Seq[(String, String)]): Unit = {
    import spark.implicits._
    kv.toDF("key", "value").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** The persisted build parameters of the index at `path` (public:
    * callers of the *Indexed probe operators need them to derive
    * matching query-side keys).
    */
  def readMeta(spark: SparkSession, path: String): Map[String, String] =
    spark.read.parquet(s"$path/meta").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  private def metaOf(
      spark: SparkSession, path: String, kind: String): Map[String, String] = {
    val m = readMeta(spark, path)
    require(m.get("kind").contains(kind),
      s"IndexStore: $path holds a '${m.getOrElse("kind", "?")}' index, " +
        s"expected '$kind'")
    m
  }

  /** Enforce the monotone-id append contract: every id in `incoming`
    * must sort strictly after every id in `existing` (both single-column
    * frames). Distributed and type-generic: two 1-row aggregates and a
    * cross of them — no driver-side comparison of unknown types. An
    * empty `existing` (first append into a fresh index) passes.
    */
  private def requireIdsAfter(
      existing: DataFrame, incoming: DataFrame, op: String): Unit = {
    val mx = existing.agg(max(col(existing.columns.head)).as("__mx"))
    val mn = incoming.agg(min(col(incoming.columns.head)).as("__mn"))
    val violated = mx.crossJoin(mn)
      .where(col("__mn") <= col("__mx")).limit(1).count() > 0
    require(!violated,
      s"IndexStore.$op: appended ids must sort strictly after every id " +
        "already in the index (monotone-ingest contract — it is what " +
        "keeps duplicate-group representatives stable so append equals " +
        "rebuild); re-id the batch or rebuild the index")
  }

  /** Restrict screen matches to PRE-BATCH corpus ids. Under the
    * monotone-id contract every legitimately indexed id sorts strictly
    * below the batch's minimum id, so a match at-or-above it can only be
    * the batch seeing its OWN admissions through a replayed round (the
    * streaming ingest loops are at-least-once: a crash between the
    * index append and the verdict write re-runs the round against an
    * index that already contains the batch). Filtering those out makes
    * the screen REPLAY-INVARIANT — the re-run reproduces the original
    * verdicts instead of recording formerly-admitted assets as
    * duplicates of themselves — and is a no-op on a first run, by the
    * same contract. One broadcast 1-row aggregate, no extra shuffle.
    */
  private[graft] def preBatchMatches(
      matches: DataFrame, batch: DataFrame, idCol: String): DataFrame = {
    val mn = batch.agg(min(col(idCol)).as("__batch_min"))
    matches.crossJoin(broadcast(mn))
      .where(col("corpus_id") < col("__batch_min"))
      .drop("__batch_min")
  }

  /** Run `append` for an ingest round's admissions unless the round is
    * a REPLAY whose append already happened. Three dispositions from
    * one distributed aggregate over (admitted min/max, index max) —
    * never a driver-side comparison of unknown id types:
    *  - FRESH (every admitted id above the index max, or empty index):
    *    append; the append's own monotone guard re-verifies.
    *  - REPLAY (every admitted id at-or-below the index max): under the
    *    monotone contract this can only be a re-run of a round whose
    *    append landed before the crash — verify membership (anti-join,
    *    only in this rare branch) and skip the append instead of
    *    tripping the monotone guard. A replay whose original append
    *    pushed an LSH bucket past the load-time cap can legitimately
    *    re-screen a borderline duplicate as admitted (the grown bucket
    *    is dropped wholesale at load): such flipped ids are NOT members
    *    and are NOT appended (their ids sort below the index max — the
    *    monotone contract forbids it), and the skip tolerates them
    *    rather than wedging the at-least-once loop with a raise; the
    *    leakage is bounded to the replayed batch (later copies carry
    *    fresh ids, screen on the fresh path, and index normally). Only
    *    a replay-shaped batch with NO admitted id present raises — that
    *    is not a replay but a reused id range.
    *  - STRADDLING ids: a genuine contract violation — raise.
    * An all-duplicate round (nothing admitted) appends nothing and
    * writes no files.
    */
  private def appendAdmittedIdempotent(
      admitted: DataFrame,
      idCol: String,
      existingIds: DataFrame,
      op: String)(append: => Unit): Unit = {
    val adm = admitted.agg(count(lit(1)).as("__n"),
      min(col(idCol)).as("__amn"), max(col(idCol)).as("__amx"))
    val emx = existingIds
      .agg(max(col(existingIds.columns.head)).as("__emx"))
    val r = adm.crossJoin(broadcast(emx)).select(col("__n"),
      (col("__emx").isNull || col("__amn") > col("__emx")).as("__fresh"),
      (col("__emx").isNotNull && col("__amx") <= col("__emx")).as("__replay"))
      .head()
    val n = r.getLong(0)
    if (n == 0L) ()
    else if (r.getBoolean(1)) append
    else if (r.getBoolean(2)) {
      val missing = admitted.select(col(idCol).as("__aid"))
        .join(existingIds.toDF("__aid"), Seq("__aid"), "left_anti")
        .count()
      require(missing < n,
        s"IndexStore.$op: every admitted id sorts at-or-below the " +
          "index's max id but NONE is a member — this is not a replay, " +
          "it is a reused id range (monotone-ingest contract " +
          "violation); re-id the batch or rebuild the index")
      // verified replay: admissions already indexed. missing > 0 is the
      // documented cap-flip tolerance (see scaladoc), not corruption.
    } else throw new IllegalArgumentException(
      s"IndexStore.$op: admitted ids straddle the index's max id — the " +
        "monotone-ingest contract is violated (a replayed round would " +
        "sit entirely at-or-below it, a fresh one entirely above); " +
        "re-id the batch or rebuild the index")
  }

  /** Raise if member rows reference group ids with no group-key row —
    * the UNHEALABLE torn-append shape for the corpus/vector indexes: a
    * crash between the members append and the sets/reps append loses
    * the group's text/vector, so the orphans can never be probed and
    * never healed from members alone (unlike the media index, whose
    * member rows carry the signature itself — see
    * [[appendMediaIndex]]'s lazy heal). Detection at load keeps every
    * screen built on a consistent index; recovery is a rebuild over the
    * full corpus or pruning the orphaned id range from members/.
    */
  private def requireMemberCoverage(
      members: DataFrame, groups: DataFrame, keyCol: String,
      groupTable: String, path: String): Unit = {
    // fast path: one action over two partial aggregates. Group-key rows
    // are unique per group and always written AFTER their member rows
    // (members-first crash posture), so the group-table row count
    // equals the members' distinct group count IFF no member group is
    // orphaned — the anti-join runs only on the failure path, to count
    // the orphans for the message.
    val chk = members.agg(count_distinct(col(keyCol)).as("__mg"))
      .crossJoin(broadcast(groups.agg(count(lit(1)).as("__gs"))))
      .head()
    if (chk.getLong(0) != chk.getLong(1)) {
      val orphans = members.select(col(keyCol)).distinct()
        .join(groups.select(col(keyCol)), Seq(keyCol), "left_anti")
        .count()
      throw new IllegalArgumentException(
        s"IndexStore: index at $path is torn — $orphans member group " +
          s"id(s) have no $groupTable row (${chk.getLong(0)} member " +
          s"groups vs ${chk.getLong(1)} $groupTable rows; a crash " +
          s"between the members append and the $groupTable append lost " +
          "the group key, so these members are permanently unreachable " +
          "and unhealable); rebuild the index over the full corpus or " +
          "prune the orphaned id range from members/")
    }
  }

  // ---------------------------------------------------------------
  // MinHash-LSH corpus index (Dedup.CorpusIndex)
  // ---------------------------------------------------------------

  /** Build and persist the corpus index raw tables under `path`
    * (`meta/`, `bands/`, `sets/`, `members/`). Overwrites.
    */
  def saveCorpusIndex(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      numBands: Int = 16): Unit = {
    val spark = corpus.sparkSession
    writeMeta(spark, path, Seq(
      "kind" -> "corpus", "shingle_size" -> shingleSize.toString,
      "num_hashes" -> numHashes.toString, "num_bands" -> numBands.toString))
    val gc = Dedup.textGroups(corpus, idCol, textCol)
    val (bands, sets, members) =
      Dedup.corpusTablesFromGroups(gc, shingleSize, numHashes, numBands)
    bands.repartition(col("band_hash"))
      .write.mode("overwrite").parquet(s"$path/bands")
    sets.repartition(col("corpus_id"))
      .write.mode("overwrite").parquet(s"$path/sets")
    members.repartition(col("corpus_id"))
      .write.mode("overwrite").parquet(s"$path/members")
  }

  /** Load a persisted corpus index, applying the bucket cap over the
    * CURRENT (post-append) band table — see the class doc for why the
    * cap lives here and not in the files. With `check` on (the
    * default), raises on the unhealable torn-append shape (member rows
    * whose group has no sets row — the group text is lost, see
    * [[requireMemberCoverage]]); the one-aggregate cost is narrow-column
    * work, disable only on a hot probe path over an index some other
    * loader already validated. The OTHER torn shape (sets row without
    * band rows) is deliberately not raised: it is merely under-probed,
    * and the next [[appendCorpusIndex]] heals it from the stored text.
    */
  def loadCorpusIndex(
      spark: SparkSession,
      path: String,
      maxBucketSize: Int = 1000,
      check: Boolean = true): Dedup.CorpusIndex = {
    metaOf(spark, path, "corpus")
    val sets = spark.read.parquet(s"$path/sets")
    val members = spark.read.parquet(s"$path/members")
    if (check) requireMemberCoverage(members, sets, "corpus_id", "sets", path)
    Dedup.capCorpusTables(
      spark.read.parquet(s"$path/bands"), sets, members, maxBucketSize)
  }

  /** Append a batch of new documents to a persisted corpus index (pure
    * parquet appends — nothing existing is rewritten). New docs whose
    * text equals an existing representative's merge into that group
    * (member rows only); novel texts form new groups with their own
    * band/set/member rows. Build parameters come from the index's meta.
    * After this, `loadCorpusIndex` ≡ `saveCorpusIndex` over the full
    * corpus (IndexStoreSpec proves it on a fixture).
    *
    * Crash posture: each table append is one atomic Spark write job,
    * but the SEQUENCE of three is not a transaction. The members table
    * is written FIRST — it is what the monotone-id guard reads, so a
    * re-run after any mid-sequence failure RAISES on the
    * already-appended ids instead of silently duplicating set/band rows
    * (duplicated sets would multiply probe output rows). The two torn
    * shapes divide by healability: members-without-sets loses the group
    * text — unhealable, detected and raised by [[loadCorpusIndex]];
    * sets-without-bands keeps it — every append lazily recomputes band
    * rows for ANY sets row missing band coverage (the batch's novel
    * groups plus crash orphans), the same self-heal
    * [[appendMediaIndex]] runs, restoring append ≡ rebuild with no
    * manual repair.
    */
  def appendCorpusIndex(
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      path: String): Unit = {
    val spark = newDocs.sparkSession
    val m = metaOf(spark, path, "corpus")
    val (shingleSize, numHashes, numBands) =
      (m("shingle_size").toInt, m("num_hashes").toInt, m("num_bands").toInt)
    val oldSets = spark.read.parquet(s"$path/sets")
    val oldMembers = spark.read.parquet(s"$path/members")
    val gn = Dedup.textGroups(newDocs, idCol, textCol)
    requireIdsAfter(oldMembers.select(col("member_id")),
      gn.select(explode(col("members")).as("member_id")), "appendCorpusIndex")
    // exact-text merge: members of matched groups file under the
    // EXISTING rep (no new band/set rows — identical text means the
    // stored ones already cover it)
    val matched = gn
      .join(oldSets.select(col("text").as("__text"), col("corpus_id")),
        Seq("__text"))
      .select(col("corpus_id"), explode(col("members")).as("member_id"))
    val novel = gn
      .join(oldSets.select(col("text").as("__text")), Seq("__text"), "left_anti")
      // consumed by all three table derivations below — materialize the
      // anti-join once
      .localCheckpoint(true)
    // torn-append heal: stored sets with no band rows (a crash between
    // a prior sets append and its bands append) are invisible to every
    // probe but carry their text — recompute their bands with the
    // builder's own derivation. Fast path first: every group with ≥1
    // shingle has exactly numBands band rows, so
    // count(bands) == numBands × count(sets) proves full coverage with
    // two shuffle-free counts and the heal anti-join is skipped
    // entirely (filter-false prunes it to an empty relation — the
    // stored files are never even listed, so there is no re-list race
    // with the writes below). Zero-shingle docs legitimately break the
    // count identity; such corpora fall back to the anti-join, which
    // is then materialized BEFORE the directory-mutating writes (same
    // race rationale as `novel`).
    val oldBands = spark.read.parquet(s"$path/bands")
    val covered = oldBands.agg(count(lit(1)).as("__b"))
      .crossJoin(broadcast(oldSets.agg(count(lit(1)).as("__s"))))
      .head()
    val orphanedSets0 = oldSets
      .select(col("corpus_id").as("id"), col("text").as("__text"))
      .join(oldBands.select(col("corpus_id").as("id")).distinct(),
        Seq("id"), "left_anti")
    val orphanedSets =
      if (covered.getLong(0) == numBands.toLong * covered.getLong(1))
        orphanedSets0.where(lit(false))
      else orphanedSets0.localCheckpoint(true)
    val (bands, sets, members) =
      Dedup.corpusTablesFromGroups(novel, shingleSize, numHashes, numBands)
    // members FIRST — see crash posture in the scaladoc
    members.unionByName(matched).repartition(col("corpus_id"))
      .write.mode("append").parquet(s"$path/members")
    sets.repartition(col("corpus_id"))
      .write.mode("append").parquet(s"$path/sets")
    bands
      .unionByName(
        Dedup.corpusBandRows(orphanedSets, shingleSize, numHashes, numBands))
      .repartition(col("band_hash"))
      .write.mode("append").parquet(s"$path/bands")
  }

  /** One INGEST ROUND against the persisted corpus (MinHash-LSH) index
    * — the lexical member of the ingest-round family ([[ingestMedia]]
    * perceptual, [[ingestVector]] semantic), same contract: screen the
    * batch ([[Dedup.minhashLSHJoinIndexed]], shingle/band parameters
    * from the index meta), reject every doc with jaccard ≥ `threshold`
    * against an indexed doc, append the admissions
    * ([[appendCorpusIndex]] — exact-text copies merge under their
    * existing representative), and return one verdict row per batch
    * doc: (doc_id, status admitted|duplicate, n_matches,
    * best_corpus_id, best_jaccard) with best = highest jaccard, ties
    * to the smallest corpus_id. Dedup is against the index only;
    * recall is the LSH band recall at `threshold`. The batch text is
    * tokenized twice (screen signatures + append tables) — batch-
    * sized work, the corpus is never re-tokenized.
    *
    * The round is IDEMPOTENT under at-least-once replay (the streaming
    * ingest loops' retry contract): matches are restricted to pre-batch
    * corpus ids ([[preBatchMatches]] — a replayed batch would otherwise
    * screen against its own prior admissions and record them as
    * duplicates of themselves) and a verified replay skips the append
    * instead of tripping the monotone-id guard
    * ([[appendAdmittedIdempotent]]). Re-running a completed round
    * therefore reproduces its verdicts exactly and leaves the index
    * untouched.
    */
  def ingestCorpus(
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      threshold: Double = 0.7,
      maxBucketSize: Int = 1000): DataFrame = {
    val spark = newDocs.sparkSession
    val m = metaOf(spark, path, "corpus")
    val batch = newDocs
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .localCheckpoint(true)
    // loaded once: the screen probes it, and the replay disposition
    // reuses its members relation instead of re-listing the table
    val idx = loadCorpusIndex(spark, path, maxBucketSize)
    val matches = preBatchMatches(Dedup.minhashLSHJoinIndexed(batch,
      idx, "doc_id", "text",
      m("shingle_size").toInt, m("num_hashes").toInt,
      m("num_bands").toInt, threshold, maxBucketSize), batch, "doc_id")
    val agg = matches.groupBy(col("new_id").as("doc_id"))
      .agg(count(lit(1)).as("__n"),
        min(struct((-col("jaccard")).as("negj"), col("corpus_id"))).as("__best"))
    // materialized BEFORE the append mutates the index directories
    val verdict = batch.join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("__n").isNull, lit("admitted"))
          .otherwise(lit("duplicate")).as("status"),
        coalesce(col("__n"), lit(0L)).as("n_matches"),
        col("__best.corpus_id").as("best_corpus_id"),
        (-col("__best.negj")).as("best_jaccard"))
      .localCheckpoint(true)
    val admitted = batch.join(
      verdict.where(col("status") === "admitted").select(col("doc_id")),
      Seq("doc_id"))
    appendAdmittedIdempotent(admitted, "doc_id",
      idx.members.select(col("member_id")), "ingestCorpus") {
      appendCorpusIndex(admitted, "doc_id", "text", path)
    }
    verdict
  }

  // ---------------------------------------------------------------
  // Perceptual-hash media index (Dedup.MediaIndex)
  // ---------------------------------------------------------------

  /** Build and persist the perceptual-hash media index under `path`
    * (`meta/`, `bands/`, `members/`). Input is (id, 64-bit signature)
    * — the hash is computed UPSTREAM (e.g. [[Multimodal.dhash64]] in a
    * decode pass) so the index is hash-agnostic: dHash, SimHash, or
    * any 64-bit fingerprint persists identically. Band rows exist once
    * per DISTINCT signature ([[Dedup.hashBandRows]]); members carry
    * every asset. Overwrites.
    */
  def saveMediaIndex(
      hashes: DataFrame,
      idCol: String,
      hashCol: String,
      path: String): Unit = {
    val spark = hashes.sparkSession
    writeMeta(spark, path, Seq("kind" -> "media"))
    // materialized ONCE: the projection feeds BOTH writes below, and
    // lazy it would re-run the upstream plan (typically a per-asset
    // perceptual decode — the expensive part) for the bands write too,
    // violating the decode-once contract the q245 lifecycle documents
    val members = hashes
      .select(col(hashCol).cast("long").as("dh"),
        col(idCol).as("member_id"))
      .where(col("dh").isNotNull)
      .localCheckpoint(true)
    members.repartition(col("dh"))
      .write.mode("overwrite").parquet(s"$path/members")
    Dedup.hashBandRows(members, "dh").repartition(col("band_hash"))
      .write.mode("overwrite").parquet(s"$path/bands")
  }

  /** Load a persisted media index, applying the bucket cap over the
    * CURRENT (post-append) band table — same placement rationale as
    * [[loadCorpusIndex]]: a cap baked into the files would go stale as
    * appends grow buckets; capping at load sees the live distribution.
    */
  def loadMediaIndex(
      spark: SparkSession,
      path: String,
      maxBucketSize: Int = 1000): Dedup.MediaIndex = {
    metaOf(spark, path, "media")
    Dedup.MediaIndex(
      Dedup.capBands(spark.read.parquet(s"$path/bands"), maxBucketSize),
      spark.read.parquet(s"$path/members"))
  }

  /** Append a batch of newly hashed assets (pure parquet appends).
    * Signatures whose band rows are already in place contribute member
    * rows only (the exact-collapse invariant); signatures missing from
    * the band table — the batch's novel ones PLUS any orphans a crash
    * between a prior members append and its bands append left behind —
    * get band rows here, so every append lazily repairs a torn
    * predecessor. Monotone-id contract as everywhere: members is
    * written FIRST so the crash-torn state is member-rows-without-bands
    * (healed by the next append as above, and merely under-probed
    * meanwhile) rather than bands-without-members (which would emit
    * phantom corpus_ids with no member row — silently wrong matches).
    * A duplicated band row, were one ever written, would only inflate
    * load-time bucket counts: [[Dedup.hammingJoinIndexed]] dedups
    * candidate (sig, sig) pairs with `.distinct()` before re-expansion.
    * After this, `loadMediaIndex` ≡ `saveMediaIndex` over the full
    * corpus (IndexStoreSpec proves it, torn-append case included).
    */
  def appendMediaIndex(
      newHashes: DataFrame,
      idCol: String,
      hashCol: String,
      path: String): Unit = {
    val spark = newHashes.sparkSession
    metaOf(spark, path, "media")
    val incoming = newHashes
      .select(col(hashCol).cast("long").as("dh"),
        col(idCol).as("member_id"))
      .where(col("dh").isNotNull)
      .localCheckpoint(true)
    val oldMembers = spark.read.parquet(s"$path/members")
    requireIdsAfter(oldMembers.select(col("member_id")),
      incoming.select(col("member_id")), "appendMediaIndex")
    // anti-join against BANDS (not members): a signature with member
    // rows but no band rows — the torn-append orphan — is invisible to
    // hammingJoinIndexed, so band-presence is the correctness-bearing
    // predicate; membership alone is not. Materialized BEFORE the
    // members append below: novel reads the pre-append listings, and
    // leaving it lazy would race the directory mutation (append ≠
    // rebuild if re-listed files double the anti-join inputs).
    val novel = incoming.select(col("dh"))
      .unionByName(oldMembers.select(col("dh")))
      .distinct()
      .join(spark.read.parquet(s"$path/bands").select(col("dh")).distinct(),
        Seq("dh"), "left_anti")
      .localCheckpoint(true)
    incoming.repartition(col("dh"))
      .write.mode("append").parquet(s"$path/members")
    Dedup.hashBandRows(novel, "dh").repartition(col("band_hash"))
      .write.mode("append").parquet(s"$path/bands")
  }

  /** One INGEST ROUND against the persisted media index — the
    * production shape a deduplicating 100 TB pipeline runs per batch:
    * screen the freshly hashed assets against the loaded index
    * ([[Dedup.hammingJoinIndexed]]), reject everything within
    * `maxDist` of an indexed signature, append the ADMITTED assets
    * ([[appendMediaIndex]] — novel signatures grow the band table), and
    * return one verdict row per batch asset:
    * (asset_id, status admitted|duplicate, n_matches,
    * best_corpus_id, best_hamming) with best = (hamming, corpus_id)
    * lexicographic min, nulls for admitted. Because admitted assets
    * enter the index, a later ingest's duplicates include THIS batch's
    * admissions — cross-batch dedup through the growing index, with no
    * corpus rescan ever. Contract notes: dedup is against the INDEX
    * only — two mutually-near novel assets in the same batch are both
    * admitted (collapse a batch first with [[Dedup.hammingPairs]] if
    * intra-batch dedup is wanted — q251 registers exactly that
    * composition); the monotone-id append contract applies to the
    * admitted ids. Idempotent under at-least-once replay: matches are
    * restricted to pre-batch corpus ids and a verified replay skips
    * the append (see [[ingestCorpus]] — same mechanics).
    */
  def ingestMedia(
      newHashes: DataFrame,
      idCol: String,
      hashCol: String,
      path: String,
      maxDist: Int = 3,
      maxBucketSize: Int = 1000): DataFrame = {
    val spark = newHashes.sparkSession
    metaOf(spark, path, "media")
    // hash once (the batch is typically decode-backed): the projection
    // feeds the screen, the verdict join, and the admitted append
    val batch = newHashes
      .select(col(idCol).as("asset_id"), col(hashCol).cast("long").as("dh"))
      .where(col("dh").isNotNull)
      .localCheckpoint(true)
    val idx = loadMediaIndex(spark, path, maxBucketSize)
    val matches = preBatchMatches(Dedup.hammingJoinIndexed(batch,
      idx, "asset_id", "dh", maxDist), batch, "asset_id")
    val agg = matches.groupBy(col("new_id").as("asset_id"))
      .agg(count(lit(1)).as("__n"),
        min(struct(col("hamming"), col("corpus_id"))).as("__best"))
    // materialized BEFORE the append below mutates the index
    // directories — a lazy verdict would re-list post-append files and
    // re-screen against an index containing the batch itself
    val verdict = batch.join(agg, Seq("asset_id"), "left")
      .select(col("asset_id"),
        when(col("__n").isNull, lit("admitted"))
          .otherwise(lit("duplicate")).as("status"),
        coalesce(col("__n"), lit(0L)).as("n_matches"),
        col("__best.corpus_id").as("best_corpus_id"),
        col("__best.hamming").as("best_hamming"))
      .localCheckpoint(true)
    val admitted = batch.join(
      verdict.where(col("status") === "admitted").select(col("asset_id")),
      Seq("asset_id"))
    appendAdmittedIdempotent(admitted, "asset_id",
      idx.members.select(col("member_id")), "ingestMedia") {
      appendMediaIndex(admitted, "asset_id", "dh", path)
    }
    verdict
  }

  // ---------------------------------------------------------------
  // Sign-pattern LSH vector index (Similarity.VectorIndex)
  // ---------------------------------------------------------------

  /** Build and persist the vector index raw tables under `path`
    * (`meta/`, `blocks/`, `reps/`, `members/`). Overwrites.
    */
  def saveVectorIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      dim: Int,
      numBlocks: Int = 8,
      planesPerBlock: Int = 8,
      seed: Long = 42L): Unit = {
    val spark = corpus.sparkSession
    writeMeta(spark, path, Seq(
      "kind" -> "vector", "dim" -> dim.toString,
      "num_blocks" -> numBlocks.toString,
      "planes_per_block" -> planesPerBlock.toString, "seed" -> seed.toString))
    val groups = vecGroups(corpus, idCol, vecCol)
    val (blocks, reps, members) = Similarity.vectorTablesFromGroups(
      groups, dim, numBlocks, planesPerBlock, seed)
    blocks.repartition(col("band_hash"))
      .write.mode("overwrite").parquet(s"$path/blocks")
    reps.repartition(col("rep_id"))
      .write.mode("overwrite").parquet(s"$path/reps")
    members.repartition(col("rep_id"))
      .write.mode("overwrite").parquet(s"$path/members")
  }

  /** Load a persisted vector index (cap-at-load, like
    * [[loadCorpusIndex]]). With `check` on (the default), raises on the
    * unhealable torn-append shape — member rows whose rep has no reps
    * row, i.e. the group VECTOR was lost in a crash between the members
    * and reps appends (see [[requireMemberCoverage]]). The healable
    * shape (reps row without block rows) is not raised: it is merely
    * under-probed until the next [[appendVectorIndex]] recomputes the
    * missing blocks from the stored vector.
    */
  def loadVectorIndex(
      spark: SparkSession,
      path: String,
      maxBucketSize: Int = 10000,
      check: Boolean = true): Similarity.VectorIndex = {
    metaOf(spark, path, "vector")
    val reps = spark.read.parquet(s"$path/reps")
    val members = spark.read.parquet(s"$path/members")
    if (check) requireMemberCoverage(members, reps, "rep_id", "reps", path)
    Similarity.capVectorTables(
      spark.read.parquet(s"$path/blocks"), reps, members, maxBucketSize)
  }

  /** Append new vectors to a persisted vector index; exact-duplicate
    * vectors merge into their existing rep group (equi-join on the
    * vector value — the same key [[Dedup.textGroups]] collapsed on).
    * Hyperplane geometry comes from the index's meta, so the appended
    * block keys are derived from the SAME planes as the stored ones.
    * Crash posture mirrors [[appendCorpusIndex]]: members first (a
    * retry raises on the monotone guard), members-without-reps is
    * unhealable and raised by [[loadVectorIndex]], and reps-without-
    * blocks is lazily HEALED here — every append recomputes block rows
    * for any stored rep missing block coverage, with the same planes.
    */
  def appendVectorIndex(
      newVecs: DataFrame,
      idCol: String,
      vecCol: String,
      path: String): Unit = {
    val spark = newVecs.sparkSession
    val m = metaOf(spark, path, "vector")
    val oldReps = spark.read.parquet(s"$path/reps")
    val oldMembers = spark.read.parquet(s"$path/members")
    val gn = vecGroups(newVecs, idCol, vecCol)
    requireIdsAfter(oldMembers.select(col("member_id")),
      gn.select(explode(col("members")).as("member_id")), "appendVectorIndex")
    val matched = gn.join(oldReps.withColumnRenamed("rep_id", "__rep"), Seq("v"))
      .select(col("__rep").as("rep_id"), explode(col("members")).as("member_id"))
    val novel = gn.join(oldReps.select(col("v")), Seq("v"), "left_anti")
      .localCheckpoint(true)
    // torn-append heal: stored reps with no block rows get them
    // recomputed from their stored vector. Same fast path as
    // [[appendCorpusIndex]] — every rep has exactly numBlocks block
    // rows, so the count identity proves coverage without the
    // anti-join shuffle; on mismatch the anti-join is materialized
    // BEFORE the directory-mutating writes below.
    val oldBlocks = spark.read.parquet(s"$path/blocks")
    val covered = oldBlocks.agg(count(lit(1)).as("__b"))
      .crossJoin(broadcast(oldReps.agg(count(lit(1)).as("__r"))))
      .head()
    val orphanedReps0 = oldReps.select(col("rep_id").as("id"), col("v"))
      .join(oldBlocks.select(col("rep_id").as("id")).distinct(),
        Seq("id"), "left_anti")
    val orphanedReps =
      if (covered.getLong(0) == m("num_blocks").toLong * covered.getLong(1))
        orphanedReps0.where(lit(false))
      else orphanedReps0.localCheckpoint(true)
    val (blocks, reps, members) = Similarity.vectorTablesFromGroups(
      novel, m("dim").toInt, m("num_blocks").toInt,
      m("planes_per_block").toInt, m("seed").toLong)
    // members FIRST — same crash posture as [[appendCorpusIndex]]
    members.unionByName(matched).repartition(col("rep_id"))
      .write.mode("append").parquet(s"$path/members")
    reps.repartition(col("rep_id"))
      .write.mode("append").parquet(s"$path/reps")
    blocks
      .unionByName(Similarity.vectorBlockRows(orphanedReps, m("dim").toInt,
        m("num_blocks").toInt, m("planes_per_block").toInt, m("seed").toLong))
      .repartition(col("band_hash"))
      .write.mode("append").parquet(s"$path/blocks")
  }

  /** One INGEST ROUND against the persisted vector index — the
    * semantic twin of [[ingestMedia]], same contract shape: screen the
    * batch ([[Similarity.cosineJoinIndexed]], hyperplane geometry from
    * the index meta so screen and store cannot disagree), reject
    * everything with cos ≥ `threshold` against an indexed vector,
    * append the admissions ([[appendVectorIndex]]), and return one
    * verdict row per batch vector: (vec_id, status admitted|duplicate,
    * n_matches, best_corpus_id, best_cos) with best = highest cos,
    * ties to the smallest corpus_id; nulls for admitted. Dedup is
    * against the index only (intra-batch near-dups co-admit — run
    * [[Similarity.cosineNearDupPairs]] on the batch first if wanted);
    * recall is the index's sign-block recall, the documented
    * approximation. Monotone-id append contract on the admitted ids.
    * Null or wrong-dimension embeddings are dropped up front (no
    * verdict row — the [[ingestMedia]] null-hash posture): they yield
    * no block keys, so left in they would be silently "admitted" and
    * appended as permanently dead index members. Idempotent under
    * at-least-once replay, like [[ingestMedia]].
    */
  def ingestVector(
      newVecs: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      threshold: Double,
      maxBucketSize: Int = 10000): DataFrame = {
    val spark = newVecs.sparkSession
    val m = metaOf(spark, path, "vector")
    val batch = newVecs
      .select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("v"))
      .where(col("v").isNotNull && size(col("v")) === m("dim").toInt)
      .localCheckpoint(true)
    val idx = loadVectorIndex(spark, path, maxBucketSize)
    val matches = preBatchMatches(Similarity.cosineJoinIndexed(
      idx, batch, "vec_id", "v",
      m("dim").toInt, threshold, m("num_blocks").toInt,
      m("planes_per_block").toInt, m("seed").toLong), batch, "vec_id")
    val agg = matches.groupBy(col("new_id").as("vec_id"))
      .agg(count(lit(1)).as("__n"),
        // lexicographic min over (-cos, corpus_id) = best match by
        // highest (rounded, as emitted) cos, smallest id on ties
        min(struct((-col("cos")).as("negcos"), col("corpus_id"))).as("__best"))
    // materialized BEFORE the append mutates the index directories —
    // same race rationale as [[ingestMedia]]
    val verdict = batch.join(agg, Seq("vec_id"), "left")
      .select(col("vec_id"),
        when(col("__n").isNull, lit("admitted"))
          .otherwise(lit("duplicate")).as("status"),
        coalesce(col("__n"), lit(0L)).as("n_matches"),
        col("__best.corpus_id").as("best_corpus_id"),
        (-col("__best.negcos")).as("best_cos"))
      .localCheckpoint(true)
    val admitted = batch.join(
      verdict.where(col("status") === "admitted").select(col("vec_id")),
      Seq("vec_id"))
    appendAdmittedIdempotent(admitted, "vec_id",
      idx.members.select(col("member_id")), "ingestVector") {
      appendVectorIndex(admitted, "vec_id", "v", path)
    }
    verdict
  }

  /** Collapsed (id, v, members) vector groups — the vector twin of
    * [[Dedup.textGroups]] (shared with [[Similarity.vectorIndex]]).
    */
  private def vecGroups(
      df: DataFrame, idCol: String, vecCol: String): DataFrame =
    Dedup.textGroups(
      df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v")),
      "id", "v")
      .select(col("id"), col("__text").cast("array<double>").as("v"),
        col("members"))

  // ---------------------------------------------------------------
  // IVF model (IvfIndex.Model)
  // ---------------------------------------------------------------

  /** Persist an IVF model: the centroid matrix (`centroids/`, nLists
    * rows) and the inverted-list assignment (`assign/`, repartitioned by
    * list_id — the probe join key). Overwrites.
    */
  def saveIvf(model: IvfIndex.Model, path: String): Unit = {
    val spark = model.assignments.sparkSession
    import spark.implicits._
    writeMeta(spark, path, Seq(
      "kind" -> "ivf", "n_lists" -> model.centroids.length.toString))
    model.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("list_id", "centroid").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
    model.assignments.repartition(col("list_id"))
      .write.mode("overwrite").parquet(s"$path/assign")
  }

  /** Load a persisted IVF model. The centroid collect is O(nLists) —
    * the model-sized driver collect this library allows everywhere.
    */
  def loadIvf(spark: SparkSession, path: String): IvfIndex.Model = {
    metaOf(spark, path, "ivf")
    val centroids = spark.read.parquet(s"$path/centroids")
      .orderBy("list_id").collect()
      .map(_.getAs[Seq[Double]]("centroid").toArray)
    IvfIndex.Model(centroids, spark.read.parquet(s"$path/assign"))
  }

  /** Append new vectors to a persisted IVF model: assign them to the
    * EXISTING centroids (no retrain — see class doc) and append to the
    * inverted lists. Raises if any new id already exists in the index
    * (a duplicate id would double-count its vector in every probe).
    *
    * Crash posture (audited round 10): this append touches exactly ONE
    * table — the assign/ inverted lists — so there is no multi-table
    * torn window like the corpus/vector/media appends have; the single
    * Spark write job is atomic at job commit (files surface only when
    * the committer publishes them), and a retry after a committed
    * write raises on the id-overlap guard instead of double-counting.
    * The centroids/ table is written only by [[saveIvf]], never here.
    */
  def appendIvf(
      newVecs: DataFrame,
      idCol: String,
      vecCol: String,
      path: String): Unit = {
    val spark = newVecs.sparkSession
    val model = loadIvf(spark, path)
    val assign = IvfIndex.assign(newVecs, idCol, vecCol, model.centroids)
    require(assign.join(model.assignments.select(col("id")), Seq("id"),
        "left_semi").limit(1).count() == 0,
      "IndexStore.appendIvf: a new id already exists in the index; " +
        "appending it would double-count its vector in every probe")
    assign.repartition(col("list_id"))
      .write.mode("append").parquet(s"$path/assign")
  }

  // ---------------------------------------------------------------
  // Lexical inverted index (TextAnalysis.TextIndex)
  // ---------------------------------------------------------------

  /** Build and persist the BM25 inverted index under `path` (`meta/`,
    * `postings/`, `doclen/`). Postings are repartitioned by `term` —
    * the probe join key, so a query-term probe prunes to its term's
    * row groups; doclen by `doc_id` (the per-candidate hydration key).
    * Corpus stats (N, Σdl) are NOT stored — they derive lazily from
    * doclen at probe time, which is what makes append a pure table
    * union (see [[graft.operators.TextAnalysis.TextIndex]]).
    * Overwrites.
    */
  def saveTextIndex(
      docs: DataFrame, idCol: String, textCol: String, path: String): Unit = {
    val spark = docs.sparkSession
    writeMeta(spark, path, Seq("kind" -> "text"))
    val idx = TextAnalysis.textIndex(docs, idCol, textCol)
    idx.postings.repartition(col("term"))
      .write.mode("overwrite").parquet(s"$path/postings")
    idx.doclen.repartition(col("doc_id"))
      .write.mode("overwrite").parquet(s"$path/doclen")
  }

  /** Load a persisted text index. With `check` on (the default),
    * raises on the text kind's one torn-append shape: doclen rows
    * whose postings append was lost in a crash (doclen is written
    * first — see [[appendTextIndex]]). Such docs can never match a
    * query (no postings) but silently inflate N and Σdl, shifting
    * EVERY document's idf and length normalization — corpus-wide skew
    * rather than unreachable rows, so it is detected, not tolerated.
    * The check is one action over two shuffle-free sums: dl is BY
    * CONSTRUCTION the per-doc sum of tf ([[TextAnalysis.textIndex]]),
    * so Σdl == Σtf iff no doclen row lost its postings; the
    * orphan-counting anti-join runs only on the failure path. The doc
    * text is not stored, so the shape is unhealable — recovery is a
    * rebuild or pruning the orphaned id range, as with the
    * corpus/vector member orphans.
    */
  def loadTextIndex(
      spark: SparkSession, path: String,
      check: Boolean = true): TextAnalysis.TextIndex = {
    metaOf(spark, path, "text")
    val postings = spark.read.parquet(s"$path/postings")
    val doclen = spark.read.parquet(s"$path/doclen")
    if (check) {
      val sums = doclen.agg(sum(col("dl")).as("__dl"))
        .crossJoin(broadcast(postings.agg(sum(col("tf")).as("__tf"))))
        .head()
      if (sums.isNullAt(0) != sums.isNullAt(1) ||
          (!sums.isNullAt(0) && sums.getLong(0) != sums.getLong(1))) {
        val orphans = doclen.select(col("doc_id")).distinct()
          .join(postings.select(col("doc_id")).distinct(),
            Seq("doc_id"), "left_anti")
          .count()
        throw new IllegalArgumentException(
          s"IndexStore: text index at $path is torn — $orphans doc(s) " +
            s"have doclen rows but no postings (Σdl=${sums.get(0)} vs " +
            s"Σtf=${sums.get(1)}; a crash between the doclen append and " +
            "the postings append lost the terms, and the stranded " +
            "doclen rows skew every score's idf/avgdl); rebuild the " +
            "index or prune the orphaned id range from doclen/")
      }
    }
    TextAnalysis.TextIndex(postings, doclen)
  }

  // ---------------------------------------------------------------
  // Maintenance: file compaction
  // ---------------------------------------------------------------

  /** Per-table result of [[compactIndex]]: how many data files the
    * rewrite collapsed, and the bytes it moved.
    */
  case class CompactStat(
      table: String, filesBefore: Long, filesAfter: Long, bytes: Long)

  /** The raw tables of each index kind with their probe join key —
    * the key each table is clustered by on write, preserved by
    * [[compactIndex]]'s rewrite.
    */
  private val tablesByKind: Map[String, Seq[(String, String)]] = Map(
    "corpus" -> Seq("bands" -> "band_hash", "sets" -> "corpus_id",
      "members" -> "corpus_id"),
    "media" -> Seq("bands" -> "band_hash", "members" -> "dh"),
    "vector" -> Seq("blocks" -> "band_hash", "reps" -> "rep_id",
      "members" -> "rep_id"),
    "ivf" -> Seq("assign" -> "list_id", "centroids" -> "list_id"),
    "text" -> Seq("postings" -> "term", "doclen" -> "doc_id"))

  /** Compact a persisted index of ANY kind in place: rewrite each raw
    * table — same rows, same clustering key — into
    * ceil(bytes / targetBytesPerFile) files. The long-running-index
    * maintenance op: every ingest round and every streaming
    * foreachBatch trigger appends a handful of small parquet files, so
    * after thousands of triggers a table is thousands of files and
    * every load/gate construction pays the full listing plus
    * per-file-footer overhead; compaction restores scan-sized files
    * without touching semantics (compact ≡ append-chain, proved in
    * IndexStoreSpec). The id-monotone append contract is untouched —
    * rows are moved, never rewritten.
    *
    * Each table swaps via write-aside-then-rename (write `t__compacting`,
    * rename `t` → `t__old`, rename `t__compacting` → `t`, drop
    * `t__old`), so a crash leaves either the original or the compacted
    * table plus recoverable debris; the one window where the table dir
    * is absent (between the two renames) is self-healed at the next
    * compact, which restores `t__old` before starting. Run OFFLINE
    * with exclusive access: concurrent readers hold a file listing
    * pinned at THEIR load (see the gate scaladocs) and would chase
    * deleted files mid-read, and a concurrent append's files would be
    * dropped by the swap. Gates restart after compaction — the same
    * restart they already need to see appends.
    *
    * Cost is O(table) per call — the safe primitive over plain parquet
    * directories, where the atomic unit is the directory swap. A
    * PARTIAL compaction (rewrite only the small files) cannot be made
    * crash-safe here: merging N small files and deleting them is two
    * non-atomic steps whose crash window either duplicates or loses
    * rows, and fixing that requires a manifest-bearing table format
    * (Iceberg/Delta-style) rather than path-listing parquet. At 100 TB
    * run this per table on the maintenance cadence (the rewrite is a
    * scan → hash-repartition → write with no joins — cheaper than one
    * ingest round at the same scale, per SCALING.md round-10).
    */
  def compactIndex(
      spark: SparkSession,
      path: String,
      targetBytesPerFile: Long = 128L << 20): Seq[CompactStat] = {
    import org.apache.hadoop.fs.Path
    val kind = readMeta(spark, path).getOrElse("kind",
      throw new IllegalArgumentException(
        s"IndexStore.compactIndex: $path/meta carries no index kind"))
    val tables = tablesByKind.getOrElse(kind,
      throw new IllegalArgumentException(
        s"IndexStore.compactIndex: unknown index kind '$kind'"))
    val conf = spark.sparkContext.hadoopConfiguration
    def dataFiles(fs: org.apache.hadoop.fs.FileSystem, dir: Path) =
      fs.listStatus(dir).filter(s => s.isFile && {
        val n = s.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      })
    tables.map { case (t, key) =>
      val dir = new Path(s"$path/$t")
      val fs = dir.getFileSystem(conf)
      val aside = new Path(s"$path/${t}__old")
      // recover a prior compact that crashed between its two renames
      if (!fs.exists(dir) && fs.exists(aside)) {
        require(fs.rename(aside, dir),
          s"IndexStore.compactIndex: could not restore $aside to $dir")
      }
      val before = dataFiles(fs, dir)
      val bytes = before.map(_.getLen).sum
      val nParts =
        math.max(1L, (bytes + targetBytesPerFile - 1) / targetBytesPerFile)
          .min(1 << 20).toInt
      val tmp = new Path(s"$path/${t}__compacting")
      spark.read.parquet(dir.toString)
        .repartition(nParts, col(key))
        .write.mode("overwrite").parquet(tmp.toString)
      if (fs.exists(aside)) fs.delete(aside, true): Unit
      require(fs.rename(dir, aside),
        s"IndexStore.compactIndex: rename $dir aside failed")
      require(fs.rename(tmp, dir),
        s"IndexStore.compactIndex: rename $tmp into place failed")
      fs.delete(aside, true): Unit
      CompactStat(t, before.length.toLong,
        dataFiles(fs, dir).length.toLong, bytes)
    }
  }

  /** Append new documents' postings to a persisted text index
    * (monotone-id contract, like every append here: BM25's df/N/avgdl
    * shift with every append by design — that's the index staying
    * CORRECT, not drifting — but a duplicated doc_id would silently
    * double its term frequencies, so the overlap raises loudly). The
    * id check runs against the UNION of both stored tables' ids, so a
    * retry after a crash between the two writes below still raises
    * instead of half-duplicating the batch.
    */
  def appendTextIndex(
      newDocs: DataFrame, idCol: String, textCol: String, path: String): Unit = {
    val spark = newDocs.sparkSession
    metaOf(spark, path, "text")
    val existingIds = spark.read.parquet(s"$path/doclen").select(col("doc_id"))
      .unionByName(spark.read.parquet(s"$path/postings").select(col("doc_id")))
    val idx = TextAnalysis.textIndex(newDocs, idCol, textCol)
    requireIdsAfter(existingIds, idx.doclen.select(col("doc_id")),
      "appendTextIndex")
    // doclen FIRST: a crash after it leaves ids visible to the retry
    // guard via the union above; a half-appended postings table alone
    // would under-score the batch silently
    idx.doclen.repartition(col("doc_id"))
      .write.mode("append").parquet(s"$path/doclen")
    idx.postings.repartition(col("term"))
      .write.mode("append").parquet(s"$path/postings")
  }
}
