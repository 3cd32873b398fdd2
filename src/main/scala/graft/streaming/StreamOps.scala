package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value). The reference is
  * batch-only (SURVEY §3.2: no streaming anywhere in the repo), so this
  * module is part of the north-star pipeline surface: the same
  * aggregations a training-data ingest pipeline runs continuously.
  *
  * Design: everything is a `readStream`-composable transform — input is
  * any streaming (or batch — the transforms are mode-agnostic)
  * DataFrame/Dataset with this schema. Watermarks bound state; windowed
  * aggregations use event time; custom state goes through
  * `flatMapGroupsWithState` with event-time timeouts (state is evicted
  * by watermark, never unbounded).
  */
object StreamOps {

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Int, sum_value: Double)

  /** Internal per-user session accumulator (public: the state encoder's
    * generated code must reach the accessors from another package).
    */
  final case class SessionState(
      startMs: Long, endMs: Long, n: Int, total: Double)

  /** Tumbling event-time window counts per event type. Late data beyond
    * the watermark is dropped; state per (window, type) is evicted once
    * the watermark passes window end.
    */
  def windowedCounts(
      events: DataFrame,
      watermarkDelay: String = "10 minutes",
      windowDuration: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDuration), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** In-stream exact dedup by event_id: duplicates arriving within the
    * watermark horizon are dropped; state for an id is released once the
    * watermark passes it (bounded state — the batch analogue is
    * [[graft.operators.Dedup.exact]]).
    */
  def dedupEvents(
      events: DataFrame,
      watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each click pairs with the same user's
    * views in the half-open window `(click_ts - windowSeconds, click_ts]`
    * — open at the lower bound, closed at the click itself, matching
    * [[graft.operators.RangeJoin]]'s convention. Both sides
    * carry watermarks, and the join condition bounds event-time range on
    * both sides, so state for either stream is evicted once the
    * watermark passes its possible match window — bounded state, the
    * streaming analogue of [[graft.operators.RangeJoin]] (whose batch
    * query q37 is the oracle-checked twin of this shape).
    */
  def clickViewJoin(
      clicks: DataFrame,
      views: DataFrame,
      windowSeconds: Long,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermarkDelay)
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      .alias("c")
    val v = views.withWatermark("ts", watermarkDelay)
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("view_ts"))
      .alias("v")
    c.join(v, expr(
      s"""c.user_id = v.user_id AND
         |view_ts > click_ts - interval $windowSeconds seconds AND
         |view_ts <= click_ts""".stripMargin))
      .select(col("click_id"), col("c.user_id").as("user_id"),
        col("view_id"), col("click_ts"), col("view_ts"))
  }

  /** LEFT-OUTER stream-stream join — [[clickViewJoin]] with the
    * unmatched clicks KEPT: the attribution-completeness view ("every
    * click, with its view if one preceded it in-window"). Outer rows
    * (null view columns) are emitted only once the watermark proves no
    * matching view can still arrive — the join-state eviction point —
    * so the output is append-correct, never retracted. Both sides need
    * watermarks AND the time-interval condition; without them Spark
    * (correctly) refuses, because outer state would be unbounded.
    */
  def clickViewJoinOuter(
      clicks: DataFrame,
      views: DataFrame,
      windowSeconds: Long,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermarkDelay)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .alias("c")
    val v = views.withWatermark("ts", watermarkDelay)
      .select(col("event_id").as("view_id"),
        col("user_id").as("v_user_id"), col("ts").as("view_ts"))
      .alias("v")
    c.join(v, expr(
      s"""c.user_id = v_user_id AND
         |view_ts > click_ts - interval $windowSeconds seconds AND
         |view_ts <= click_ts""".stripMargin), "left_outer")
      .select(col("click_id"), col("c.user_id").as("user_id"),
        col("view_id"), col("click_ts"), col("view_ts"))
  }

  /** FULL-OUTER stream-stream join — completes the matrix
    * ([[clickViewJoin]] inner, [[clickViewJoinOuter]] left): BOTH
    * orphan kinds survive — clicks with no in-window view (null view
    * columns: lost attribution) AND views that converted to no click
    * (null click columns: abandonment). Each side's orphans flush when
    * the WATERMARK proves its match window can no longer fill: a click
    * at t waits until the watermark passes t (a matching view may have
    * ts ≤ t), a view at t waits until the watermark passes
    * t + windowSeconds (a matching click may come that much later) —
    * Spark derives both eviction points from the same two-sided
    * time-interval condition that bounds the inner join's state, so the
    * output stays append-only (no retraction of an orphan that later
    * "matches": by flush time the match is provably impossible).
    * user_id is taken from whichever side is present (coalesce) — the
    * only column both sides share.
    */
  def clickViewJoinFullOuter(
      clicks: DataFrame,
      views: DataFrame,
      windowSeconds: Long,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermarkDelay)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .alias("c")
    val v = views.withWatermark("ts", watermarkDelay)
      .select(col("event_id").as("view_id"),
        col("user_id").as("v_user_id"), col("ts").as("view_ts"))
      .alias("v")
    c.join(v, expr(
      s"""c.user_id = v_user_id AND
         |view_ts > click_ts - interval $windowSeconds seconds AND
         |view_ts <= click_ts""".stripMargin), "full_outer")
      .select(col("click_id"),
        coalesce(col("c.user_id"), col("v_user_id")).as("user_id"),
        col("view_id"), col("click_ts"), col("view_ts"))
  }

  /** Document record for the streaming admission gate. */
  final case class Doc(doc_id: Long, text: String, ts: Timestamp)

  /** Hashed-asset record for the streaming media admission gate
    * ([[mediaGateIndexed]]): the 64-bit perceptual signature is
    * computed by the upstream decode stage.
    */
  final case class Asset(asset_id: Long, dh: Long, ts: Timestamp)

  /** Embedded-row record for the streaming semantic admission gate
    * ([[vectorGateIndexed]]): the embedding comes from the upstream
    * encoder stage.
    */
  final case class Vec(vec_id: Long, embedding: Array[Double], ts: Timestamp)

  /** STREAMING near-dup admission gate — the continuous form of
    * [[graft.operators.Dedup.minhashLSHJoin]] (its batch twin and
    * parity oracle): a stream of incoming documents is checked against
    * a STATIC corpus LSH index via a stream-static equi-join on band
    * keys. Per arriving doc everything is stateless (the MinHash
    * signature is computed by [[graft.operators.Dedup.rowSignature]]
    * inside one projection — no streaming aggregation), except one
    * bounded dedup of multi-band repeats of the same (new, corpus)
    * pair, evicted by the watermark. Emits (new_id, corpus_id, jaccard)
    * for every match ≥ threshold — a doc with no row is novel.
    *
    * Parity contract vs the batch twin: identical output WHEN the batch
    * new-side bucket cap does not bind. The batch form can cap a skewed
    * NEW batch (template spam fanning out |new bucket| × cap pairs)
    * because it sees the whole batch at once; a stream row is judged
    * independently, so only the corpus-side cap (`maxBucketSize`)
    * applies here — bound the blast radius of a spammy stream upstream
    * (rate limits / micro-batch sizing), not in the gate.
    *
    * At scale: the corpus index is computed here per micro-batch; a
    * production deployment persists [[graft.operators.IndexStore]]'s
    * parquet index, loads it once, and runs [[dedupGateIndexed]] — the
    * "admission gate over a living corpus" capstone. The stream-static
    * join re-reads the static side's DATA per micro-batch, but its
    * FILE LISTING is pinned when the index is loaded, so appended
    * delta files surface on gate restart with a fresh load (the
    * checkpointed restart StreamOpsSpec pins) — or live, by setting
    * `spark.sql.metadataCacheTTLSeconds` so the listing itself expires.
    */
  def dedupGate(
      newDocs: DataFrame,
      corpus: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleSize: Int = 3,
      numHashes: Int = 64,
      numBands: Int = 16,
      threshold: Double = 0.7,
      watermarkDelay: String = "10 minutes",
      maxBucketSize: Int = 1000): DataFrame =
    dedupGateIndexed(newDocs,
      graft.operators.Dedup.corpusIndex(corpus, idCol, textCol,
        shingleSize, numHashes, numBands, maxBucketSize),
      idCol, textCol, shingleSize, numHashes, numBands, threshold,
      watermarkDelay)

  /** [[mediaGateIndexed]] with the corpus index built inline from a
    * (id, signature) frame — the perceptual twin of [[dedupGate]]'s
    * convenience form, for gates whose corpus is small or already
    * resident. The index is computed per micro-batch; a production
    * deployment persists it ([[graft.operators.IndexStore
    * .saveMediaIndex]]) and runs [[mediaGateIndexed]] over the load.
    */
  def mediaGate(
      newAssets: DataFrame,
      corpusHashes: DataFrame,
      idCol: String = "asset_id",
      hashCol: String = "dh",
      maxDist: Int = 3,
      watermarkDelay: String = "10 minutes",
      maxBucketSize: Int = 1000): DataFrame =
    mediaGateIndexed(newAssets,
      graft.operators.Dedup.mediaIndex(corpusHashes, idCol, hashCol,
        maxBucketSize),
      idCol, hashCol, maxDist, watermarkDelay)

  /** [[dedupGate]] against a PREBUILT (typically
    * [[graft.operators.IndexStore.loadCorpusIndex loaded-from-parquet]])
    * corpus index. Signature parameters must match the index's build
    * parameters (persisted indexes carry them in meta).
    */
  def dedupGateIndexed(
      newDocs: DataFrame,
      idx: graft.operators.Dedup.CorpusIndex,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleSize: Int = 3,
      numHashes: Int = 64,
      numBands: Int = 16,
      threshold: Double = 0.7,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    import graft.operators.Dedup
    val rowsPerBand = numHashes / numBands
    val sig = Dedup.rowSignature(col(textCol), shingleSize, numHashes)
    val n = newDocs.withWatermark("ts", watermarkDelay)
      .select(col(idCol).as("new_id"), col("ts"),
        Dedup.sortedShingles(col(textCol), shingleSize).as("sh_n"),
        // null signature (shingle-less doc) → no band rows, matching
        // the aggregated corpus side, which emits no row for such docs
        posexplode(when(sig.isNotNull,
          Dedup.bandKeys(sig, numBands, rowsPerBand)))
          .as(Seq("band_idx", "band_hash")))
    val c = graft.functions.SetExpressions
      .sortedIntersectCount(col("sh_n"), col("sh_c"))
    n.join(idx.bands, Seq("band_idx", "band_hash")) // stream-static, stateless
      .join(idx.sets, Seq("corpus_id"))
      .select(col("new_id"), col("corpus_id"), col("ts"),
        round(c.cast("double") /
          (size(col("sh_n")) + size(col("sh_c")) - c), 4).as("jaccard"))
      .where(col("jaccard") >= threshold)
      // the same pair surfaces once per colliding band — bounded state
      .dropDuplicatesWithinWatermark("new_id", "corpus_id")
      .join(idx.members, Seq("corpus_id")) // expand collapsed corpus dups
      .select(col("new_id"), col("member_id").as("corpus_id"), col("jaccard"))
  }

  /** STREAMING perceptual-media admission gate — the continuous form of
    * [[graft.operators.Dedup.hammingJoinIndexed]] (its batch twin and
    * parity oracle), and the perceptual sibling of [[dedupGateIndexed]]:
    * a stream of freshly hashed assets (id, 64-bit signature, ts) is
    * screened against a persisted media index
    * ([[graft.operators.IndexStore.loadMediaIndex]]) via a
    * stream-static equi-join on the 4×16-bit pigeonhole band keys. The
    * signature is computed UPSTREAM (a decode stage feeding the
    * stream), so per arriving asset everything here is stateless —
    * band explode (×4), static band join, one `bit_count` verify —
    * except one bounded dedup of multi-band repeats of the same
    * (new, corpus-signature) pair, evicted by the watermark. Emits
    * (new_id, corpus_id, hamming ≤ maxDist); an asset with no row is
    * perceptually novel. Band keys come from the batch operator's own
    * derivation ([[graft.operators.Dedup.pigeonholeBands]], shared not
    * copied), so stream and batch verdicts cannot drift; recall is
    * lossless for maxDist ≤ 3 up to the loader's bucket cap, exactly
    * the batch contract.
    *
    * At scale: the stream-static join re-reads the loaded band/member
    * DATA per micro-batch, but the parquet file listing is pinned at
    * [[graft.operators.IndexStore.loadMediaIndex]] time, so daily
    * [[graft.operators.IndexStore.appendMediaIndex]] deltas surface on
    * gate restart with a fresh load (StreamOpsSpec pins the pickup) —
    * or live, via `spark.sql.metadataCacheTTLSeconds` expiring the
    * listing in a long-running query.
    */
  def mediaGateIndexed(
      newAssets: DataFrame,
      idx: graft.operators.Dedup.MediaIndex,
      idCol: String = "asset_id",
      hashCol: String = "dh",
      maxDist: Int = 3,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    require(maxDist <= 3,
      "4-block pigeonhole guarantees recall only for maxDist <= 3")
    import graft.operators.Dedup
    val n = newAssets.withWatermark("ts", watermarkDelay)
      .select(col(idCol).as("new_id"), col("ts"),
        col(hashCol).cast("long").as("__ph"))
      .where(col("__ph").isNotNull)
      .select(col("new_id"), col("ts"), col("__ph"),
        posexplode(Dedup.pigeonholeBands(col("__ph")))
          .as(Seq("band_idx", "band_hash")))
    n.join(idx.bands, Seq("band_idx", "band_hash")) // stream-static, stateless
      .withColumn("hamming",
        bit_count(col("__ph").bitwiseXOR(col("dh"))).cast("int"))
      .where(col("hamming") <= maxDist)
      // the same (asset, corpus-signature) pair surfaces once per
      // colliding band (≤ 4) — bounded state, watermark-evicted; dedup
      // BEFORE member expansion so state is per distinct signature,
      // not per corpus copy
      .dropDuplicatesWithinWatermark("new_id", "dh")
      .join(idx.members, Seq("dh")) // expand signature-identical corpus copies
      .select(col("new_id"), col("member_id").as("corpus_id"),
        col("hamming"))
  }

  /** STREAMING semantic admission gate — the embedding member of the
    * gate family ([[dedupGateIndexed]] MinHash text,
    * [[mediaGateIndexed]] perceptual hash, this one cosine): a stream
    * of (id, embedding, ts) rows is screened against a persisted
    * sign-pattern LSH vector index
    * ([[graft.operators.IndexStore.loadVectorIndex]]) via a
    * stream-static equi-join on block keys, then ONE cosine per
    * candidate representative. Batch twin and parity oracle:
    * [[graft.operators.Similarity.cosineJoinIndexed]] — block keys and
    * the cosine kernel are the batch operator's own (shared, not
    * copied). Emits (new_id, corpus_id, cos ≥ threshold); a vector
    * with no row is semantically novel up to the index's block recall
    * (a pair agreeing on no sign block is missed — the documented
    * [[graft.operators.Similarity.cosineNearDupPairs]] approximation).
    * Stateless per arriving row except the bounded per-(new,rep)
    * multi-block dedup, watermark-evicted; dedup BEFORE member
    * expansion so state is per distinct corpus vector, not per copy.
    * Parameters must match the index build (persisted indexes carry
    * them in meta).
    */
  def vectorGateIndexed(
      newVecs: DataFrame,
      idx: graft.operators.Similarity.VectorIndex,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double,
      numBlocks: Int = 8,
      planesPerBlock: Int = 8,
      seed: Long = 42L,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    import graft.operators.Similarity
    val qn = newVecs.withWatermark("ts", watermarkDelay)
      .select(col(idCol).as("new_id"), col("ts"),
        col(vecCol).cast("array<double>").as("qvec"))
    qn.select(col("new_id"), col("ts"), col("qvec"),
        posexplode(Similarity.blockKeys(col("qvec"), dim, numBlocks,
          planesPerBlock, seed)).as(Seq("band_idx", "band_hash")))
      .join(idx.blocks, Seq("band_idx", "band_hash")) // stream-static
      .join(idx.reps.select(col("rep_id"), col("v").as("cvec")),
        Seq("rep_id"))
      .select(col("new_id"), col("rep_id"), col("ts"),
        Similarity.cosine(col("qvec"), col("cvec")).as("cos"))
      .where(col("cos") >= threshold)
      // the same (new, rep) pair surfaces once per agreeing block —
      // bounded state, watermark-evicted
      .dropDuplicatesWithinWatermark("new_id", "rep_id")
      .join(idx.members.select(col("rep_id"),
        col("member_id").as("corpus_id")), Seq("rep_id"))
      .select(col("new_id"), col("corpus_id"),
        round(col("cos"), 6).as("cos"))
  }

  /** STREAMING lexical search/decontamination gate — the text-index
    * member of the gate family ([[dedupGateIndexed]] MinHash,
    * [[mediaGateIndexed]] perceptual, [[vectorGateIndexed]] semantic):
    * a stream of (query_id, text, ts) prompts is scored against a
    * persisted inverted index
    * ([[graft.operators.IndexStore.loadTextIndex]]) and every corpus
    * doc with BM25 score_e6 ≥ `minScoreE6` is emitted — the live
    * eval-prompt decontamination shape ("which training docs are
    * lexically close to what we are about to evaluate on?"). Unlike
    * the other gates this one is NOT per-row stateless: per-term
    * contributions of one prompt fan out across postings rows and must
    * re-aggregate, so scores ride ONE windowed streaming aggregation
    * (tumbling `windowDuration` on event time) and emit when the
    * watermark closes the window — the gate's only state, bounded by
    * (open windows × matched docs). Tokenization replays the batch
    * form's query split (lower/whitespace/distinct) as column
    * expressions, and the per-term score expression IS the batch
    * operator's ([[graft.operators.TextAnalysis.bm25TermE6]], shared
    * not copied); parity vs
    * [[graft.operators.TextAnalysis.bm25ScreenIndexed]] is pinned by
    * StreamOpsSpec. Corpus stats and per-term df are aggregated ONCE
    * at gate construction: a stream-static join re-executes its static
    * PLAN every trigger, which would re-run the full postings
    * aggregation per micro-batch — and since the static side's file
    * listing is pinned at load anyway (appends need a gate restart;
    * see [[mediaGateIndexed]]), the frozen aggregates give up nothing
    * a lazy re-derive would see. Freezing has two modes: pass
    * `statsPath` to WRITE the aggregates to reliable storage at gate
    * construction and read them back — the long-running-production
    * choice (localCheckpoint blocks die with an executor, killing the
    * query) — or omit it for localCheckpoint pinning in short-lived /
    * test gates. Either way the per-term df table joins WITHOUT a
    * broadcast: it spans the index's entire vocabulary, and a
    * corpus-scale vocabulary must not be collected to the driver (the
    * one-row corpus stats remain the only broadcast).
    */
  def searchGate(
      queries: DataFrame,
      idx: graft.operators.TextAnalysis.TextIndex,
      minScoreE6: Long,
      windowDuration: String = "1 minute",
      watermarkDelay: String = "10 minutes",
      k1: Double = 1.2,
      b: Double = 0.75,
      statsPath: Option[String] = None,
      maxDfPpm: Option[Long] = None): DataFrame = {
    import graft.operators.TextAnalysis
    val toks = array_distinct(filter(
      split(lower(trim(col("text"))), "\\s+"), t => length(t) > 0))
    val qt = queries.withWatermark("ts", watermarkDelay)
      .select(col("query_id"), col("ts"), explode(toks).as("term"),
        lit(1).as("__k"))
    val tf = idx.postings
    val dl = idx.doclen
    val statsLazy = dl.agg(count(lit(1)).as("__n"), sum(col("dl")).as("__sumdl"))
      .withColumn("__k", lit(1))
    val dfLazy = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val (stats, dfAll) = statsPath match {
      case Some(p) =>
        val spark = queries.sparkSession
        statsLazy.write.mode("overwrite").parquet(s"$p/stats")
        dfLazy.repartition(col("term"))
          .write.mode("overwrite").parquet(s"$p/df")
        (spark.read.parquet(s"$p/stats"), spark.read.parquet(s"$p/df"))
      case None =>
        (statsLazy.localCheckpoint(true), dfLazy.localCheckpoint(true))
    }
    // `maxDfPpm` (off by default — classic scores otherwise): the
    // batch family's high-df term prune, ported to the gate where it
    // matters MOST — a stopword-class term multiplies its ENTIRE
    // postings list into the windowed aggregation's STATE per prompt.
    // Same integer rule (df·1e6 > ppm·N dropped), applied to the
    // FROZEN df relation at plan time; the lossless MaxScore candidate
    // prune deliberately has no streaming form — its essential-prefix
    // analysis is a per-query-batch window function, unsupported
    // before a streaming aggregation (and the thresholds would need
    // the very scores the stream has not aggregated yet).
    val dfKept = maxDfPpm.fold(dfAll) { ppm =>
      dfAll.crossJoin(broadcast(stats.select(col("__n"))))
        .where(col("df") * lit(1000000L) <= lit(ppm) * col("__n"))
        .drop("__n")
    }
    // df join FIRST: a pruned term's stream rows drop BEFORE the
    // postings fan-out multiplies them (inner joins on term — the
    // reorder cannot change results)
    qt.join(dfKept, Seq("term")) // vocabulary-sized: never broadcast
      .join(tf, Seq("term")) // stream-static, the postings fan-out
      .join(dl, Seq("doc_id"))
      // literal-key equi-join: a true cross join is unsupported
      // stream-static, and the stats side is one broadcast row
      .join(broadcast(stats), Seq("__k"))
      .select(col("query_id"), col("ts"), col("doc_id"),
        TextAnalysis.bm25TermE6(k1, b).as("e6"))
      .groupBy(window(col("ts"), windowDuration), col("query_id"),
        col("doc_id"))
      .agg(sum(col("e6")).as("score_e6"))
      .where(col("score_e6") >= minScoreE6)
      .select(col("query_id"), col("doc_id"), col("score_e6"))
  }

  /** STREAMING media ingest loop — the living-index closure of the
    * gate family: where [[mediaGateIndexed]] only SCREENS against a
    * fixed load, this `foreachBatch` body runs one full
    * [[graft.operators.IndexStore.ingestMedia]] round per micro-batch
    * (screen → reject duplicates → append admissions) and appends the
    * verdicts to `verdictPath`, so assets admitted in micro-batch N
    * gate their copies in micro-batch N+1 — the index grows WITH the
    * stream. Usage:
    * {{{
    * hashedAssets.writeStream
    *   .foreachBatch(StreamOps.mediaIngestBatch(indexPath, verdictPath))
    *   .option("checkpointLocation", ckpt).start()
    * }}}
    *
    * Exactly-once posture: foreachBatch is at-least-once; every crash
    * window is covered by [[ingestBatchBody]]'s three pieces — the
    * ingest round itself is replay-idempotent (a re-run after a crash
    * between the index append and the verdict write reproduces the
    * original verdicts instead of marking admissions as duplicates of
    * themselves), the batch_id-partitioned verdict write is a dynamic
    * partition OVERWRITE (a re-run after a crash between the verdict
    * write and the marker write replaces, never duplicates), and the
    * O(1) high-water-mark marker skips batches proven fully done.
    *
    * Maintenance: every trigger appends a handful of small files to
    * the index; pass `compactEvery = Some(n)` to run
    * [[graft.operators.IndexStore.compactIndex]] on the index every n
    * ingested batches, INSIDE the loop between rounds — the loop is
    * the sole appender, so compaction's exclusivity-vs-appends
    * contract holds by construction. Concurrent gate READERS on other
    * sessions survive the swap via the generation manifest for
    * exactly `retainGenerations` subsequent compactions (default 1):
    * a gate that restarts at least once per `compactEvery` interval is
    * safe at the default; a longer-lived gate needs `retainGenerations`
    * sized to how many compaction intervals it may stay pinned, at a
    * disk cost of (retainGenerations + 1)× the table between swaps.
    * The VERDICT table is different: it grows one `batch_id=N` partition
    * per trigger — an append-only LOG, deliberately outside
    * compactIndex's scope (coalescing partitions would break the
    * per-batch overwrite idempotence for any batch that could still
    * replay). Its cadence is `archiveEvery = Some(n)` + `archivePath`:
    * every n ingested batches the loop runs [[archiveVerdicts]] at
    * `hwm − archiveKeepBatches`, moving every closed partition below
    * that into the archive and bounding the live table at
    * ~archiveKeepBatches partitions regardless of stream age
    * (sole-writer by construction, like compactEvery — the loop is
    * between triggers). Read the full history with [[readAllVerdicts]]
    * (live ∪ archive, exactly-once across the archive crash window);
    * consumers of either table alone should use [[readVerdicts]],
    * which pins the batch_id partition column to a stable LongType.
    */
  def mediaIngestBatch(
      indexPath: String,
      verdictPath: String,
      idCol: String = "asset_id",
      hashCol: String = "dh",
      maxDist: Int = 3,
      maxBucketSize: Int = 1000,
      compactEvery: Option[Int] = None,
      retainGenerations: Int = 1,
      archiveEvery: Option[Int] = None,
      archivePath: Option[String] = None,
      archiveKeepBatches: Int = 8): (DataFrame, Long) => Unit =
    ingestBatchBody(verdictPath, indexPath, compactEvery,
      retainGenerations, archiveEvery, archivePath,
      archiveKeepBatches)(b =>
      graft.operators.IndexStore.ingestMedia(b, idCol, hashCol,
        indexPath, maxDist, maxBucketSize))

  /** The shared exactly-once wrapper of the streaming ingest sinks: run
    * `round` (one index ingest returning verdicts) per micro-batch and
    * land its verdicts idempotently. foreachBatch is at-least-once;
    * exactly-once comes from three reinforcing pieces, one per crash
    * window:
    *  - the ROUND is idempotent (IndexStore ingest rounds restrict
    *    matches to pre-batch ids and skip a verified replay's append),
    *    so a crash between the index append and the verdict write
    *    re-runs to the ORIGINAL verdicts — admissions are not recorded
    *    as duplicates of themselves;
    *  - the verdict table is PARTITIONED by batch_id and written with
    *    dynamic partition overwrite, so a crash between the verdict
    *    write and the marker write replays into the same partition
    *    instead of appending duplicate rows;
    *  - a high-water-mark MARKER file (`_graft_hwm` inside the verdict
    *    path — the underscore keeps it invisible to parquet readers),
    *    written after the verdicts, makes the already-done check O(1)
    *    per trigger instead of a scan of the ever-growing verdict
    *    table (that scan was quadratic over the stream's lifetime; it
    *    remains only as the one-time fallback for a missing/corrupt
    *    marker, e.g. a pre-upgrade table).
    */
  private def ingestBatchBody(
      verdictPath: String,
      indexPath: String,
      compactEvery: Option[Int] = None,
      retainGenerations: Int = 1,
      archiveEvery: Option[Int] = None,
      archivePath: Option[String] = None,
      archiveKeepBatches: Int = 8)(round: DataFrame => DataFrame)
      : (DataFrame, Long) => Unit = {
    require(archiveEvery.isEmpty || archivePath.nonEmpty,
      "StreamOps ingest sink: archiveEvery needs an archivePath — the " +
        "cadence has nowhere to move closed verdict batches otherwise")
    require(archiveKeepBatches >= 1,
      "StreamOps ingest sink: archiveKeepBatches must be >= 1 — the " +
        "marker batch is the one a checkpoint replay can still rewrite, " +
        "so it can never be archived")
    (batch, batchId) => {
      val spark = batch.sparkSession
      val hwm = readHwm(spark, verdictPath).getOrElse {
        // fallback: legacy table without a marker (or torn marker
        // write) — one full scan, after which the next marker write
        // restores O(1) triggers
        try {
          val r = spark.read.parquet(verdictPath)
            .agg(max(col("batch_id").cast("long"))).head()
          if (r.isNullAt(0)) -1L else r.getLong(0)
        } catch {
          // first batch: no verdict table yet
          case _: org.apache.spark.sql.AnalysisException => -1L
        }
      }
      if (hwm < batchId && !batch.isEmpty) {
        requireNotLegacyLayout(spark, verdictPath)
        round(batch).withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(verdictPath)
        writeHwm(spark, verdictPath, batchId)
        // maintenance cadence: compact the INDEX every `n` ingested
        // batches. Safe by construction: the loop is the index's sole
        // appender and sits between rounds right here, so compactIndex's
        // exclusivity-vs-appends contract holds; concurrent READERS
        // (gates on other sessions) survive via the generation manifest
        // for retainGenerations swaps — size it to the longest-lived
        // gate (see the mediaIngestBatch scaladoc; the default 1 covers
        // gates that restart within one compaction interval).
        // Best-effort on replay: a crash between the marker write and
        // the compact skips this cadence hit (the replayed batch is
        // proven done and the whole body is skipped) — the next
        // multiple compacts instead, which only defers file-count
        // maintenance, never correctness.
        compactEvery.foreach { n =>
          if (n > 0 && (batchId + 1) % n == 0)
            graft.operators.IndexStore.compactIndex(spark, indexPath,
              retainGenerations = retainGenerations): Unit
        }
        // the VERDICT table's maintenance cadence — the compactEvery
        // twin for the other thing the loop grows forever (one
        // batch_id=N partition per trigger): every `n` ingested
        // batches, ETL every closed partition at or below
        // hwm − archiveKeepBatches into the archive and delete it
        // from the live table, keeping the live table bounded at
        // ~archiveKeepBatches partitions regardless of stream age.
        // Sole-writer by construction (the loop runs it between
        // triggers — the compactEvery argument); always strictly
        // below the just-written marker because archiveKeepBatches
        // >= 1. Same replay posture as compactEvery: a crash between
        // the marker write and this cadence only defers the archive
        // to the next multiple, and archiveVerdicts is itself
        // idempotent across ITS crash window (re-overwrite + complete
        // the delete; readAllVerdicts reads the overlap exactly once).
        archiveEvery.foreach { n =>
          if (n > 0 && (batchId + 1) % n == 0 &&
              batchId - archiveKeepBatches >= 0)
            archiveVerdicts(spark, verdictPath, archivePath.get,
              batchId - archiveKeepBatches): Unit
        }
      }
      ()
    }
  }

  /** Read an ingest loop's verdict table with a STABLE schema. Since
    * round 10 the table is PARTITIONED by batch_id, and Spark types an
    * inferred partition column by its values — IntegerType for small
    * batch ids — where the pre-round-10 layout carried batch_id as a
    * LongType DATA column. Consumers reading the path directly would
    * see a schema that varies with table age (and would flip to
    * LongType the day a deployment passes 2³¹ batches); this reader
    * pins batch_id to LongType over either layout. Migration note for
    * direct readers of post-round-10 tables: cast batch_id yourself or
    * read through this helper.
    */
  def readVerdicts(
      spark: org.apache.spark.sql.SparkSession,
      verdictPath: String): DataFrame =
    spark.read.parquet(verdictPath)
      .withColumn("batch_id", col("batch_id").cast("long"))

  /** Storage report for an ingest loop's VERDICT table — the
    * [[graft.operators.IndexStore.describeIndex]] twin for the other
    * thing the loops grow forever: one `batch_id=N` partition directory
    * lands per trigger, and nothing compacts them (coalescing would
    * break the per-batch overwrite idempotence for replayable batches
    * — see [[mediaIngestBatch]]), so the numbers an operator must
    * watch are the partition count and total file count; when closed
    * batches are ETL'd into downstream archives, this report is the
    * "how overdue is that" signal.
    */
  final case class VerdictStat(
      partitions: Long, files: Long, bytes: Long,
      hwmBatchId: Option[Long], legacyRootFiles: Long)

  /** ETL CLOSED verdict batches into a long-term archive — the
    * maintenance op the verdict table's append-only-log design defers
    * to (the live table deliberately never compacts: coalescing
    * partitions would break per-batch overwrite idempotence for a
    * batch that could still replay). Every `batch_id ≤ upToBatch`
    * partition is rewritten into `archivePath` (same batch_id
    * partitioning, dynamic partition OVERWRITE — so the op is itself
    * idempotent) and then deleted from the live table; returns the
    * number of batches moved.
    *
    * Safety: `upToBatch` must be strictly below the high-water marker
    * (raises otherwise, or when the marker is absent) — Structured
    * Streaming's checkpoint only ever re-delivers the LATEST
    * uncommitted batch id, so batches below the marker are closed and
    * can never be rewritten by the sink; archiving at-or-above it
    * could race an in-flight replay's partition overwrite. The marker
    * itself is untouched, so the sink's O(1) already-done check keeps
    * working over the truncated live table. (Corner stated honestly:
    * a live table whose every partition has been archived is
    * marker-only; if the marker is ALSO lost there, the sink's
    * fallback scan finds no table and restarts the check at −1 —
    * harmless, because the only batch a checkpoint re-delivers is the
    * latest one and its partition overwrite is idempotent, but direct
    * `readVerdicts(live)` on such a table fails schema inference; use
    * [[readAllVerdicts]].)
    *
    * EXCLUSIVITY vs READERS: the live-partition delete is in place —
    * run this on the maintenance cadence, not under concurrent
    * readers of the LIVE table (the compactIndex posture, minus the
    * generation machinery: verdict partitions are immutable once
    * closed, so the archive copy is complete BEFORE any delete and no
    * data is ever lost — a racing reader fails loudly mid-scan on the
    * deleted files rather than silently missing rows, which
    * [[readAllVerdicts]] guarantees by pinning its live read to the
    * partition listing it filtered the archive with). Crash posture:
    * archive-write then live-delete are two steps — a crash between
    * them leaves a batch in BOTH tables with IDENTICAL rows;
    * re-running the op re-overwrites the archive partition and
    * completes the delete, and [[readAllVerdicts]] reads such overlap
    * exactly once (live wins by partition listing). At 100 TB this is
    * the op a daily cadence runs with `upToBatch = hwm - K`, keeping
    * the live table at K partitions regardless of stream age.
    */
  def archiveVerdicts(
      spark: org.apache.spark.sql.SparkSession,
      verdictPath: String,
      archivePath: String,
      upToBatch: Long): Long = {
    val hwm = readHwm(spark, verdictPath).getOrElse(
      throw new IllegalStateException(
        s"StreamOps.archiveVerdicts: $verdictPath has no readable " +
          "high-water marker — archiving without it cannot prove a " +
          "batch is closed; let the sink write one trigger first"))
    require(upToBatch < hwm,
      s"StreamOps.archiveVerdicts: upToBatch=$upToBatch must be " +
        s"strictly below the high-water marker ($hwm) — the marker " +
        "batch is the one a checkpoint replay can still rewrite")
    val p = new org.apache.hadoop.fs.Path(verdictPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val closed = fs.listStatus(p)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      .map(s => (s.getPath, s.getPath.getName.stripPrefix("batch_id=").toLong))
      .filter(_._2 <= upToBatch)
      .sortBy(_._2)
    if (closed.nonEmpty) {
      // one read of exactly the closed partitions (basePath keeps the
      // batch_id partition column); the rewrite keeps batch_id
      // partitioning so the archive reads like the live table
      spark.read.option("basePath", verdictPath)
        .parquet(closed.map(_._1.toString): _*)
        .withColumn("batch_id", col("batch_id").cast("long"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(archivePath)
      closed.foreach { case (dir, _) => fs.delete(dir, true): Unit }
    }
    closed.length.toLong
  }

  /** Read the live verdict table UNION its archive with exactly-once
    * semantics across the [[archiveVerdicts]] crash window (a batch
    * present in both — archive written, live delete lost — is read
    * from the LIVE side only: archive partitions are filtered by the
    * live table's partition listing before the union, and the live
    * READ is pinned to that same listing snapshot, so a concurrent
    * archive run deleting a listed partition fails this query loudly
    * on the missing files — never a silently absent batch). Schema
    * matches [[readVerdicts]] (batch_id pinned to LongType). Either
    * side may be absent or empty.
    */
  def readAllVerdicts(
      spark: org.apache.spark.sql.SparkSession,
      verdictPath: String,
      archivePath: String): DataFrame = {
    // None = path absent; Some(empty) = exists but no batch partitions
    // (e.g. a marker-only fully-archived live table, or a pre-created
    // archive dir) — both read-skipped, never schema-inferred against
    def partIds(path: String): Option[Set[Long]] = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) None
      else Some(fs.listStatus(p)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
        .map(_.getPath.getName.stripPrefix("batch_id=").toLong).toSet)
    }
    // live read pinned to the SAME listing the archive filter uses
    def readParts(path: String, ids: Set[Long]): DataFrame =
      spark.read.option("basePath", path)
        .parquet(ids.toSeq.sorted.map(b => s"$path/batch_id=$b"): _*)
        .withColumn("batch_id", col("batch_id").cast("long"))
    val liveOpt = partIds(verdictPath)
    val archOpt = partIds(archivePath)
    if (liveOpt.isEmpty && archOpt.isEmpty)
      throw new IllegalArgumentException(
        s"StreamOps.readAllVerdicts: neither $verdictPath nor " +
          s"$archivePath exists")
    val live = liveOpt.getOrElse(Set.empty[Long])
    val arch = archOpt.getOrElse(Set.empty[Long])
    val archOnly = arch -- live
    (live.nonEmpty, archOnly.nonEmpty) match {
      case (true, true) =>
        readParts(verdictPath, live)
          .unionByName(readParts(archivePath, archOnly))
      case (true, false) => readParts(verdictPath, live)
      case (false, true) => readParts(archivePath, archOnly)
      case (false, false) => throw new IllegalArgumentException(
        s"StreamOps.readAllVerdicts: no batch partitions under either " +
          s"$verdictPath or $archivePath (nothing ingested yet, or " +
          "everything still mid-archive)")
    }
  }

  /** Pure filesystem listings (no Spark jobs, no row scans — safe on
    * any cadence): partition-directory count, data-file count and
    * bytes across them, the high-water marker's last fully-ingested
    * batch id (None = marker absent/corrupt: the next trigger pays the
    * one-time fallback scan), and any ROOT-level data files (the
    * pre-round-10 unpartitioned legacy layout — nonzero means the
    * sink will refuse to write until the table is migrated).
    */
  def describeVerdicts(
      spark: org.apache.spark.sql.SparkSession,
      verdictPath: String): VerdictStat = {
    val p = new org.apache.hadoop.fs.Path(verdictPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return VerdictStat(0L, 0L, 0L, None, 0L)
    def isData(s: org.apache.hadoop.fs.FileStatus) = s.isFile && {
      val n = s.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    val root = fs.listStatus(p)
    val parts = root.filter(s =>
      s.isDirectory && s.getPath.getName.startsWith("batch_id="))
    val data = parts.flatMap(d => fs.listStatus(d.getPath).filter(isData))
    VerdictStat(parts.length.toLong, data.length.toLong,
      data.map(_.getLen).sum, readHwm(spark, verdictPath),
      root.count(isData).toLong)
  }

  /** Refuse to write `batch_id=` partition directories into a verdict
    * table that holds ROOT-LEVEL data files (the pre-round-10
    * unpartitioned layout, where batch_id rode as a data column): the
    * mixed result is a directory structure Spark cannot read at all
    * ("conflicting directory structures"), which would break every
    * downstream consumer AND this sink's own fallback scan. Legacy
    * tables stay readable (the fallback scan handles them) right up
    * until a write would corrupt them — the raise carries the
    * migration recipe instead. One root listing per trigger.
    */
  private def requireNotLegacyLayout(
      spark: org.apache.spark.sql.SparkSession, verdictPath: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(verdictPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val legacy = fs.listStatus(p).exists(s => s.isFile && {
        val n = s.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      })
      require(!legacy,
        s"StreamOps ingest sink: verdict table at $verdictPath has " +
          "root-level data files (the unpartitioned legacy layout); " +
          "writing batch_id= partitions alongside them would produce a " +
          "mixed directory structure Spark cannot read. Migrate once — " +
          "read the table and rewrite it partitioned by batch_id — or " +
          "point the sink at a fresh verdict path")
    }
  }

  private def hwmPath(verdictPath: String) =
    new org.apache.hadoop.fs.Path(verdictPath, "_graft_hwm")

  /** The last fully-ingested batch id, from the marker file; None if
    * the marker is absent or unparseable (fall back to the table scan).
    */
  private def readHwm(
      spark: org.apache.spark.sql.SparkSession,
      verdictPath: String): Option[Long] =
    try {
      val p = hwmPath(verdictPath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        Some(s.trim.toLong)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  private def writeHwm(
      spark: org.apache.spark.sql.SparkSession,
      verdictPath: String, batchId: Long): Unit = {
    val p = hwmPath(verdictPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"$batchId\n".getBytes("UTF-8")) finally out.close()
  }

  /** [[mediaIngestBatch]]'s SEMANTIC sibling: one
    * [[graft.operators.IndexStore.ingestVector]] round per micro-batch
    * — embeddings admitted in batch N gate their copies in batch N+1.
    * Same idempotence and crash posture.
    */
  def vectorIngestBatch(
      indexPath: String,
      verdictPath: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      threshold: Double = 0.9,
      maxBucketSize: Int = 10000,
      compactEvery: Option[Int] = None,
      retainGenerations: Int = 1,
      archiveEvery: Option[Int] = None,
      archivePath: Option[String] = None,
      archiveKeepBatches: Int = 8): (DataFrame, Long) => Unit =
    ingestBatchBody(verdictPath, indexPath, compactEvery,
      retainGenerations, archiveEvery, archivePath,
      archiveKeepBatches)(b =>
      graft.operators.IndexStore.ingestVector(b, idCol, vecCol,
        indexPath, threshold, maxBucketSize))

  /** [[mediaIngestBatch]]'s LEXICAL sibling: one
    * [[graft.operators.IndexStore.ingestCorpus]] round per micro-batch
    * — documents admitted in batch N gate their near-dups in batch
    * N+1. Same idempotence and crash posture.
    */
  def corpusIngestBatch(
      indexPath: String,
      verdictPath: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.7,
      maxBucketSize: Int = 1000,
      compactEvery: Option[Int] = None,
      retainGenerations: Int = 1,
      archiveEvery: Option[Int] = None,
      archivePath: Option[String] = None,
      archiveKeepBatches: Int = 8): (DataFrame, Long) => Unit =
    ingestBatchBody(verdictPath, indexPath, compactEvery,
      retainGenerations, archiveEvery, archivePath,
      archiveKeepBatches)(b =>
      graft.operators.IndexStore.ingestCorpus(b, idCol, textCol,
        indexPath, threshold, maxBucketSize))

  /** [[mediaIngestBatch]]'s TEXT-INDEX sibling — the loop that closes
    * four-for-four kind parity: one
    * [[graft.operators.IndexStore.ingestText]] round per micro-batch,
    * so documents admitted (BM25-screened) in batch N lexically gate
    * their close copies in batch N+1. Same idempotence and crash
    * posture; note [[graft.operators.IndexStore.ingestText]]'s
    * relation-level replay restriction (BM25 scores are
    * corpus-stat-dependent) and its torn-append recovery contract — a
    * crash between the two table appends fails the NEXT round's load
    * loudly until [[graft.operators.IndexStore.repairTextIndex]] runs.
    */
  def textIngestBatch(
      indexPath: String,
      verdictPath: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      minScoreE6: Long = 1000000L,
      k1: Double = 1.2,
      b: Double = 0.75,
      compactEvery: Option[Int] = None,
      retainGenerations: Int = 1,
      archiveEvery: Option[Int] = None,
      archivePath: Option[String] = None,
      archiveKeepBatches: Int = 8,
      // the ingestText guardrail knobs MUST be reachable from the sink:
      // a dup-dense micro-batch over the budget raises INSIDE
      // foreachBatch, and a checkpoint restart re-delivers the same
      // batch — without these the loop would wedge deterministically
      // with the raise's own recovery advice unreachable. collapseFirst
      // defaults ON here (unlike the batch op): a streaming ingest loop
      // wants one admission per intra-batch near-dup family anyway, and
      // it is the documented mitigation for exactly that wedge.
      maxScreenPairs: Long = 1000000000L,
      collapseFirst: Boolean = true,
      maxDfPpm: Option[Long] = None,
      maxScorePrune: Boolean = false): (DataFrame, Long) => Unit =
    ingestBatchBody(verdictPath, indexPath, compactEvery,
      retainGenerations, archiveEvery, archivePath,
      archiveKeepBatches)(batch =>
      graft.operators.IndexStore.ingestText(batch, idCol, textCol,
        indexPath, minScoreE6, k1, b, maxScreenPairs, collapseFirst,
        maxDfPpm, maxScorePrune))

  /** Streaming z-score OUTLIER gate: flag live rows whose value sits
    * more than k·σ from their group's mean, where mean/σ come from a
    * PRECOMPUTED batch moment table ([[graft.operators.Stats.moments]]
    * — yesterday's corpus, refreshed on whatever cadence the caller
    * owns). Stream-static join + narrow filter: stateless, no
    * watermark, no shuffle of the stream. The flag expression is the
    * BATCH operator's own ([[graft.operators.Stats]] flag stage shared,
    * not copied), so stream and batch verdicts cannot drift — the same
    * contract as [[dedupGate]].
    */
  /** Streaming QUANTILE gate: flag live rows whose value exceeds their
    * group's precomputed q-th value — the tail-latency/price-spike
    * monitor, with thresholds from the mergeable quantile sketch
    * ([[graft.operators.Sketches.quantQuantiles]] filtered to ONE
    * `q_ppm`) so the reference corpus is summarized once (and kept
    * fresh by cheap state MERGES on whatever cadence the caller owns —
    * never a rescan). Stream-static broadcast join + narrow filter:
    * stateless, no watermark, no shuffle of the stream; groups absent
    * from the threshold table pass nothing (inner join), the same
    * unknown-group posture as [[outlierGate]].
    */
  def quantileGate(
      stream: DataFrame,
      quantiles: DataFrame,
      groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val thr = quantiles
      .select((groupCols.map(col) :+ col("value").as("__thr")): _*)
    stream.join(broadcast(thr), groupCols)
      .where(col(valueCol).cast("long") > col("__thr"))
      .drop("__thr")
  }

  def outlierGate(
      stream: DataFrame,
      moments: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Double = 3.0): DataFrame =
    graft.operators.Stats.flagAgainstMoments(
      stream, moments, groupCols, valueCol, k)

  /** Continuous data-quality monitoring: the ROW-LOCAL subset of
    * [[graft.operators.Quality]] checks evaluated per tumbling
    * event-time window — one report row per (window, check) with the
    * batch report's exact columns (`violations`, `total`, integer
    * floor-ppm, cross-multiplied `passed`). The per-row violation
    * expressions are the batch operator's own
    * (`Quality.rowViolation` — shared, not copied), so a window's
    * verdict equals [[graft.operators.Quality.run]] over that window's
    * batch slice by construction.
    *
    * All checks fold into the ONE windowed aggregation (state = one
    * counter row per open window, evicted by the watermark); the
    * explode to report rows happens on the finalized aggregate, so the
    * query stays append-mode.
    */
  def qualityWindows(
      events: DataFrame,
      checks: Seq[graft.operators.Quality.Check],
      watermarkDelay: String = "10 minutes",
      windowDuration: String = "5 minutes"): DataFrame = {
    import graft.operators.Quality
    require(checks.nonEmpty, "need at least one check")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      sum(Quality.rowViolation(c)).as(s"__v$i")
    }
    val packed = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check_name"), col(s"__v$i").as("violations"),
        lit(c.maxPpm).as("max_ppm"))
    }
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDuration))
      .agg(count(lit(1)).as("__total"), aggs: _*)
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("__total"),
        explode(array(packed: _*)).as("c"))
      .select(col("window_start"), col("window_end"),
        col("c.check_name"), col("c.violations"),
        col("__total").as("total"),
        expr("(c.violations * 1000000) div __total").as("viol_ppm"),
        (col("c.violations") * 1000000L <= col("c.max_ppm") * col("__total"))
          .as("passed"))
  }

  /** Per-(key, window) admitted-count state for [[quotaGate]] (public
    * for the state encoder, like [[SessionState]]).
    */
  final case class QuotaState(counts: Map[Long, Long])

  /** STREAMING per-key quota admission — the live twin of
    * [[graft.operators.Behavior.quotaAdmit]]: each user admits at most
    * `quota` events per `windowMs` event-time window; the admitted
    * count lives in keyed state (`flatMapGroupsWithState`), so the cap
    * holds ACROSS micro-batches — the property a stateless per-batch
    * window cannot give you. Only admitted events are emitted (the
    * gate shape of [[dedupGate]]/[[outlierGate]]).
    *
    * Ordering contract (the [[graft.operators.ChangeCapture.applyCdc]]
    * stance): within one micro-batch events are processed in
    * (ts, event_id) order, so an in-order stream admits EXACTLY the
    * batch operator's rows (StreamOpsSpec pins the parity, including a
    * same-window quota spanning two batches); cross-batch stragglers
    * consume quota in arrival order — an at-most-N guarantee, not a
    * which-N one, which is what a live rate limiter means anyway.
    * State is evicted by event-time timeout once the watermark passes
    * the window's horizon; stale windows prune as newer ones appear.
    */
  def quotaGate(
      events: Dataset[Event],
      windowMs: Long,
      quota: Int,
      watermarkDelay: String = "10 minutes"): Dataset[Event] = {
    require(windowMs > 0 && quota >= 1)
    implicit val stateEnc = Encoders.product[QuotaState]
    implicit val outEnc = Encoders.product[Event]
    implicit val longEnc = Encoders.scalaLong
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (_: Long, it: Iterator[Event], state: GroupState[QuotaState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var counts = state.getOption.map(_.counts).getOrElse(Map.empty[Long, Long])
            val out = Seq.newBuilder[Event]
            var maxMs = Long.MinValue
            sorted.foreach { e =>
              val w = e.ts.getTime / windowMs
              maxMs = math.max(maxMs, e.ts.getTime)
              val admitted = counts.getOrElse(w, 0L)
              if (admitted < quota) {
                out += e
                counts = counts.updated(w, admitted + 1)
              }
            }
            // prune windows two behind the newest seen — stragglers that
            // old are beyond the watermark anyway
            val newest = counts.keys.max
            state.update(QuotaState(counts.filter(_._1 >= newest - 2)))
            if (maxMs != Long.MinValue)
              state.setTimeoutTimestamp(maxMs + 3 * windowMs)
            out.result().iterator
          }
        })
  }

  /** Keyed state for [[quantileState]]: the content-addressed sketch's
    * kept items (v, h, lmax — each ≤ cap of them), current level, and
    * exact count. Public for the state encoder.
    */
  final case class QuantKeptState(
      level: Int, n: Long, kept: Seq[(Long, Long, Int)])

  /** STREAMING incremental quantile sketch — the live twin of
    * [[graft.operators.Sketches.quantState]]: per group, keyed state
    * holds the content-addressed kept set and its level, each
    * micro-batch folds its rows in (hash → survivable level → keep if
    * ≥ current level → raise the level while > cap), and every trigger
    * emits the group's refreshed quantile readouts. Because sketch
    * membership is a pure function of the row, this fold is EXACTLY
    * [[graft.operators.Sketches.QuantState.merge]] with single-batch
    * parts — so after any prefix of batches the state equals the BATCH
    * build over that prefix (StreamOpsSpec pins it per batch), the
    * guarantee that lets a monitoring readout claim sketch semantics
    * rather than "some running approximation". State is ≤ cap items
    * per group by construction — bounded regardless of stream length.
    *
    * The per-row hash is the SAME portable recipe
    * ([[graft.functions.PortableHash]]: first 60 bits of
    * md5(salt ␁ key)) computed JVM-side, so the state interoperates
    * with batch-built states and their DuckDB replays. Keys must be
    * unique across the stream (the batch operator's contract; a replay
    * of the same key double-counts n).
    */
  def quantileState(
      rows: Dataset[(String, Long, String)], // (group, value, key)
      qPpms: Seq[Long],
      cap: Int = 256,
      salt: String = "quant"): DataFrame = {
    require(cap >= 16 && qPpms.nonEmpty)
    val spark = rows.sparkSession
    import spark.implicits._
    val qs = qPpms.sorted
    rows.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (g: String, it: Iterator[(String, Long, String)],
         state: GroupState[QuantKeptState]) => {
          val md = java.security.MessageDigest.getInstance("MD5")
          def hash60(key: String): Long = {
            md.reset()
            val d = md.digest((salt + "\u0001" + key).getBytes("UTF-8"))
            java.lang.Long.parseLong(
              d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
          }
          // engine lmax rule: 60 − bitlen, with bin(0) length 1
          def lmaxOf(h: Long): Int =
            60 - (if (h == 0L) 1 else 64 - java.lang.Long.numberOfLeadingZeros(h))
          val prev = state.getOption.getOrElse(QuantKeptState(0, 0L, Nil))
          var level = prev.level
          var kept = prev.kept.toVector
          var n = prev.n
          it.foreach { case (_, v, k) =>
            val h = hash60(k)
            val lm = lmaxOf(h)
            n += 1
            if (lm >= level) kept = kept :+ ((v, h, lm))
          }
          while (kept.size > cap) {
            level += 1
            kept = kept.filter(_._3 >= level)
          }
          state.update(QuantKeptState(level, n, kept))
          // readout: the batch argmin rule (v ASC, h ASC; ties → lower
          // estimated rank)
          val sorted = kept.sortBy(t => (t._1, t._2))
          val picks = qs.map { q =>
            var bestV = 0L; var bestCost = Long.MaxValue; var bestR = 0L
            var i = 0
            while (i < sorted.size) {
              val er = i.toLong << level
              val cost = math.abs(er * 1000000L - q * (n - 1))
              if (cost < bestCost) { bestCost = cost; bestV = sorted(i)._1; bestR = er }
              i += 1
            }
            (q, bestV, bestR)
          }
          (g, n, level, picks)
        })
      .flatMap { case (g, n, level, picks) =>
        picks.map(p => (g, p._1, n, level, p._2, p._3))
      }
      .toDF("g", "q_ppm", "n", "level", "value", "est_rank")
  }

  /** Gap-based sessionization per user via `flatMapGroupsWithState`
    * (SURVEY §3.2 "stateful" row): a session closes when no event
    * arrives within `gapMs` of its last event; closed sessions are
    * emitted either when a later event proves the gap or when the
    * event-time timeout fires (watermark passed last_end + gap).
    */
  def sessionize(
      events: Dataset[Event],
      gapMs: Long,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[Session]
    implicit val longEnc = Encoders.scalaLong

    def emit(uid: Long, s: SessionState): Session =
      Session(uid, new Timestamp(s.startMs), new Timestamp(s.endMs), s.n, s.total)

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val out = state.getOption.map(emit(uid, _)).iterator
            state.remove()
            out
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            // accumulator for in-watermark far-late events (more than gap
            // BEFORE the open session): they may merge with EACH OTHER,
            // and the final one may bridge to the open session once that
            // session has been extended backward — reconciled after the
            // loop, never emitted one-by-one
            var late: Option[SessionState] = None
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                // within [start - gap, end + gap]: extend in both
                // directions (lower bound covers out-of-order arrivals)
                case Some(s) if t >= s.startMs - gapMs && t - s.endMs <= gapMs =>
                  cur = Some(SessionState(math.min(s.startMs, t),
                    math.max(s.endMs, t), s.n + 1, s.total + e.value))
                case Some(s) if t > s.endMs + gapMs =>
                  // a new later session starts: everything left of it is
                  // final (late clusters cannot reach past the session
                  // that bounded them)
                  late.foreach(l => closed += emit(uid, l)); late = None
                  closed += emit(uid, s)
                  cur = Some(SessionState(t, t, 1, e.value))
                case Some(_) =>
                  late match {
                    case Some(l) if t - l.endMs <= gapMs =>
                      late = Some(SessionState(l.startMs, math.max(l.endMs, t),
                        l.n + 1, l.total + e.value))
                    case Some(l) =>
                      closed += emit(uid, l)
                      late = Some(SessionState(t, t, 1, e.value))
                    case None =>
                      late = Some(SessionState(t, t, 1, e.value))
                  }
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            // reconcile: the open session may have extended backward far
            // enough to touch the last late cluster
            (late, cur) match {
              case (Some(l), Some(s)) if s.startMs - l.endMs <= gapMs =>
                cur = Some(SessionState(math.min(l.startMs, s.startMs),
                  math.max(l.endMs, s.endMs), l.n + s.n, l.total + s.total))
              case (Some(l), _) =>
                closed += emit(uid, l)
              case _ =>
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endMs + gapMs)
            }
            closed.result().iterator
          }
        })
  }

  final case class TypeCount(event_type: String, running_count: Long)

  /** RUNNING per-key event counts across micro-batches — the ingest
    * heavy-hitter monitor: each batch emits every touched key's new
    * cumulative total (Update mode), so a dashboard or admission layer
    * always sees counts-so-far without rescanning history. State is one
    * long per key (key-vocabulary bounded — event types, sources,
    * tenants; for data-sized keys use [[graft.operators.Sketches]]'
    * count-min instead, which is what it exists for).
    *
    * Parity contract (spec-pinned): after any prefix of batches, the
    * latest emission per key equals the batch `groupBy(key).count()`
    * over the same rows — streaming is the incremental view of the
    * exact batch aggregate, the [[Sketches.hllState]] claim for plain
    * counts. NoTimeout: running totals are BY DESIGN never evicted
    * (eviction would silently reset a heavy hitter to zero).
    */
  def runningTypeCounts(events: Dataset[Event]): Dataset[TypeCount] = {
    implicit val outEnc = Encoders.product[TypeCount]
    implicit val stateEnc = Encoders.scalaLong
    events
      .groupByKey(_.event_type)(Encoders.STRING)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (k: String, it: Iterator[Event], state: GroupState[Long]) => {
          val c = state.getOption.getOrElse(0L) + it.size
          state.update(c)
          TypeCount(k, c)
        })
  }
}
