package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation — the composition a real LLM
  * data pipeline runs as ONE job (SURVEY §3.3 capstone shape, the text
  * twin of [[Dedup.deduplicate]]):
  *
  *   1. gate: drop null texts, docs under `minTokens`, below
  *      `minQuality`, or with no identifiable language — each signal is
  *      an existing single-scan kernel ([[TextFunctions]]), so the whole
  *      gate stays inside one narrow codegen'd projection;
  *   2. exact dedup: canonical survivor (lowest id) per content
  *      fingerprint — one shuffle ([[Dedup.exact]] on
  *      [[TextFunctions.fingerprint]]), which collapses the re-crawled
  *      byte-identical mass BEFORE any expensive near-dup pass;
  *   3. emit the surviving docs with their gating metadata
  *      (`n_tokens`, `quality`, `lang_guess`, `fp`) so downstream
  *      stages (near-dup LSH, token budgeting, per-language sampling)
  *      reuse the already-computed signals instead of re-scanning.
  *
  * 100 TB posture: one scan + one fingerprint-keyed shuffle, nothing
  * driver-sized; the gate prunes before the shuffle so the exchange
  * carries only admissible docs.
  */
object CorpusPrep {

  def clean(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minTokens: Long = 10L,
      minQuality: Double = 0.3): DataFrame = {
    val txt = col(textCol)
    val gated = df
      .where(txt.isNotNull)
      .withColumn("n_tokens", TextFunctions.tokenCount(txt))
      .withColumn("quality", TextFunctions.qualityScore(txt))
      .withColumn("lang_guess", TextFunctions.langId(txt))
      .where(col("n_tokens") >= minTokens &&
        col("quality") >= minQuality && col("lang_guess") =!= "und")
      .withColumn("fp", TextFunctions.fingerprint(txt))
    Dedup.exact(gated, Seq(col("fp")), col(idCol))
  }

  /** Token-budget packing — fill a per-stratum training mix: within each
    * stratum take documents in (priority DESC, id ASC) order while the
    * RUNNING token total stays ≤ `budget`. With `admitFirst` the
    * stratum's first doc is admitted even when it alone exceeds the
    * budget — otherwise a stratum whose best doc is oversized packs to
    * EMPTY (the strict reading, and the default). One window pass:
    * cumulative sum over the stratum ordering, filter on the inclusive
    * prefix total — no iteration, no driver state, deterministic for a
    * deterministic ordering.
    *
    * Boundedness contract (PlanSpec-asserted): the window is PARTITIONED
    * by the stratum key — never global — so the sort is per-stratum and
    * parallelism equals the stratum count. A single giant stratum is the
    * caller's dial: split it (e.g. lang × source shard) before packing,
    * exactly as one would for any per-group sort.
    */
  def packByBudget(
      df: DataFrame,
      strataCol: String,
      priorityCol: String,
      idCol: String,
      tokenCol: String,
      budget: Long,
      admitFirst: Boolean = false): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(col(priorityCol).desc, col(idCol).asc)
    val cum = sum(col(tokenCol)).over(w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
    val keep =
      if (admitFirst) cum <= budget || row_number().over(w) === 1
      else cum <= budget
    df.withColumn("__keep", keep)
      .where(col("__keep"))
      .drop("__keep")
  }

  /** Sliding-window document chunking — the pre-tokenization step that
    * turns long documents into training sequences: `chunkTokens`-token
    * windows starting every `chunkTokens - overlap` tokens, so adjacent
    * chunks share `overlap` tokens of context and the final (possibly
    * shorter) window always reaches the document's end. A document with
    * fewer than `chunkTokens` tokens yields exactly one chunk; empty
    * docs yield none.
    *
    * Output: (id, chunk_idx, chunk_len, chunk_fp) where chunk_fp =
    * md5 of the space-joined window — the payload a downstream stage
    * re-derives from (id, offsets), so this op never shuffles text.
    *
    * 100 TB posture: tokenize + per-row `sequence` explode — fully
    * narrow (fan-out ≈ n_tokens/step per doc, bounded by doc length);
    * chunk counts derive from arithmetic, not iteration. The integer
    * `div` keeps chunk counts exact and replayable by an external
    * engine.
    *
    * @param tokensOf  the tokenizer, as a column transform (default:
    *        whitespace words). Pass
    *        `graft.functions.Bpe.bpeTokens(bpe)` to chunk by trained
    *        SUBWORD tokens instead — windows then hold `chunkTokens`
    *        model tokens, the unit a training sequence is actually
    *        measured in. Everything downstream (window arithmetic,
    *        chunk_fp) is tokenizer-agnostic.
    */
  def chunk(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int = 50,
      overlap: Int = 10,
      carryCols: Seq[String] = Nil,
      tokensOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        TextFunctions.tokens(_)): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      "need 0 <= overlap < chunkTokens")
    val internal = Set("id", "toks", "n_tokens", "n_chunks", "chunk_idx",
      "chunk", "chunk_len", "chunk_fp")
    require(carryCols.forall(!internal.contains(_)),
      s"carryCols collide with chunk's internal columns: " +
        carryCols.filter(internal.contains).mkString(", "))
    val step = chunkTokens - overlap
    val carried = carryCols.map(col)
    df.where(col(textCol).isNotNull)
      .select(col(idCol).as("id") +: tokensOf(col(textCol)).as("toks") +:
        carried: _*)
      .withColumn("n_tokens", size(col("toks")))
      .where(col("n_tokens") > 0)
      // n_chunks = ceil(max(n - overlap, 1) / step), in exact integer math
      .withColumn("n_chunks",
        expr(s"(greatest(n_tokens - $overlap, 1) + ${step - 1}) div $step"))
      .select(col("id") +: col("toks") +: col("n_tokens") +:
        explode(expr("sequence(0, n_chunks - 1)")).as("chunk_idx") +: carried: _*)
      .withColumn("chunk", slice(col("toks"),
        (col("chunk_idx") * step + 1).cast("int"), lit(chunkTokens)))
      .select(col("id") +: col("chunk_idx") +:
        size(col("chunk")).as("chunk_len") +:
        md5(concat_ws(" ", col("chunk")).cast("binary")).as("chunk_fp") +: carried: _*)
  }

  /** BOILERPLATE LINE REMOVAL — the cross-document line-level dedup a
    * web-scale pipeline runs between raw extraction and document
    * dedup (the CCNet / RefinedWeb move): a LINE whose trimmed form
    * appears in at least `minDocs` DISTINCT documents is boilerplate
    * (navigation, cookie banners, copyright footers, "subscribe"
    * calls) and is removed from EVERY document; everything else keeps
    * its original bytes and original order. Document-level dedup
    * cannot see these — the surrounding prose differs — and n-gram
    * dedup pays quadratic candidates for what is an exact-match
    * problem at line grain.
    *
    * Rules (all deterministic, replayed by the q281 oracle):
    *  - lines = `split(text, "\n", -1)` — trailing empty lines are
    *    real lines (formatting survives);
    *  - the match key is `trim(line)`; keys that trim to "" are
    *    formatting, NEVER counted toward df and NEVER removed;
    *  - df counts DISTINCT documents (a line repeated inside one doc
    *    counts once);
    *  - removal: trimmed key non-empty AND df ≥ minDocs;
    *  - reassembly: surviving ORIGINAL (untrimmed) lines joined by
    *    "\n" in original position order; a fully-boilerplate document
    *    stays in the output with text "" (the caller decides whether
    *    an empty doc survives — dropping rows silently would break
    *    id-stable pipelines);
    *  - NULL texts are dropped up front (the corpus-op convention).
    *
    * Output: (id, text, n_kept, n_removed).
    *
    * 100 TB shape: one posexplode (line grain, bounded per doc), one
    * map-side-combinable two-level distinct count at line-vocab
    * grain, one equi-join of lines against the boilerplate key set —
    * NO broadcast hint (a web corpus's boilerplate vocabulary is
    * unbounded; AQE broadcasts it when it measures small and
    * shuffle-joins otherwise, with skew-join covering the mega-common
    * keys), and one per-document regroup whose frame is bounded by
    * the document's own line count (the same bound every per-doc text
    * op carries). Nothing quadratic, no collects.
    */
  def stripBoilerplateLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minDocs: Long): DataFrame = {
    require(minDocs >= 2,
      "stripBoilerplateLines: minDocs >= 2 (1 would remove every line)")
    val lines = df.where(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("pos", "line")))
      .withColumn("__k", trim(col("line")))
    val boiler = lines.where(col("__k") =!= "")
      .groupBy(col("__k"))
      .agg(countDistinct(col("id")).as("__df"))
      .where(col("__df") >= minDocs)
      .select(col("__k"), lit(1).as("__b"))
    lines.join(boiler, Seq("__k"), "left")
      .withColumn("__keep", col("__k") === "" || col("__b").isNull)
      .groupBy(col("id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(
              when(col("__keep"), struct(col("pos"), col("line"))))),
            x => x.getField("line")),
          "\n").as("text"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__keep"), 0L).otherwise(1L)).as("n_removed"))
  }

  /** WITHIN-document repeated-line removal — the intra-doc twin of
    * [[stripBoilerplateLines]] (scraped pages repeat their own nav
    * blocks, chat/forum dumps repeat quoted headers, degenerate
    * generations loop): a line whose trimmed form already appeared
    * EARLIER in the same document is removed; the FIRST occurrence
    * stays, in place. Same line rules as the cross-doc form (split on
    * \n keeping trailing empties; trim(line) is the match key; keys
    * that trim to "" are formatting and always survive; kept lines
    * keep their original bytes and order; NULL texts drop). Output:
    * (id, text, n_kept, n_removed).
    *
    * 100 TB shape: strictly narrower than the cross-doc form — the
    * occurrence rank is a (doc, key) window whose partitions are
    * bounded by one document's lines, so the whole operator is ONE
    * shuffle on the doc id (the regroup); no corpus-wide state at
    * all. Compose: run this FIRST (it shrinks within-doc weight),
    * then [[stripBoilerplateLines]] (whose distinct-doc df is
    * unaffected by within-doc repeats by construction).
    */
  def dedupLinesWithinDoc(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id"), col("__k"))
      .orderBy(col("pos").asc)
    df.where(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("pos", "line")))
      .withColumn("__k", trim(col("line")))
      .withColumn("__keep",
        col("__k") === "" || row_number().over(w) === 1)
      .groupBy(col("id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(
              when(col("__keep"), struct(col("pos"), col("line"))))),
            x => x.getField("line")),
          "\n").as("text"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__keep"), 0L).otherwise(1L)).as("n_removed"))
  }

  /** SEQUENCE PACKING — the concat-and-cut step that turns a document
    * stream into fixed-length training examples: per stratum, documents
    * are laid end-to-end in `orderCol` order and the token stream is
    * cut every `ctxLen` tokens; a document crossing a cut belongs to
    * both examples (that is what "packed pretraining" means — no
    * padding, documents split at context boundaries). Returns the
    * per-example accounting: how many documents each example touches,
    * its token count (ctxLen everywhere but the stratum's last
    * example), and its first/last document — the manifest a packed-run
    * dataloader is built from.
    *
    * The layout is pure integer arithmetic over an exclusive prefix sum
    * (doc offset), so the whole packing is engine-replayable: a doc at
    * [start, end) spans examples `start div ctx` .. `(end-1) div ctx`.
    *
    * 100 TB posture: the window is a per-stratum running sum — ONE
    * shuffle by stratum, no global sort. Strata are packed
    * independently, so at real scale the stratum key should include a
    * shard bucket (pass a precomputed composite column): packing is
    * embarrassingly parallel across strata and cuts differ only at
    * shard seams. The example explode fans each doc out by
    * tokens/ctxLen + 1 — bounded by the doc's own length, never by the
    * corpus.
    */
  def packSequences(
      df: DataFrame,
      strataCol: String,
      orderCol: String,
      tokensCol: String,
      ctxLen: Long): DataFrame = {
    require(ctxLen > 0, "ctxLen must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col("__doc"))
      .rowsBetween(Long.MinValue, -1)
    val spans = df
      .where(col(tokensCol) > 0) // empty docs occupy no stream space
      .select(col(strataCol), col(orderCol).as("__doc"),
        col(tokensCol).cast("long").as("__n"))
      .withColumn("__start", coalesce(sum(col("__n")).over(w), lit(0L)))
      .withColumn("__end", col("__start") + col("__n"))
      .withColumn("example_id",
        explode(expr(s"sequence(__start div ${ctxLen}L, (__end - 1) div ${ctxLen}L)")))
    spans.groupBy(col(strataCol), col("example_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("__end"), (col("example_id") + 1L) * ctxLen) -
          greatest(col("__start"), col("example_id") * ctxLen)).as("n_tokens"),
        min(col("__doc")).as("first_doc"), max(col("__doc")).as("last_doc"))
  }
}
