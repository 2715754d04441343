package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** End-to-end training-corpus cleaning — the composition the individual
  * operators exist for (beyond-parity, SURVEY.md §7): quality + language
  * gate, exact dedup, then near-dup collapse via pair generation +
  * connected components, keeping each component's minimum-id doc.
  *
  * Every stage is a DataFrame transformation; the whole pipeline is one
  * lazy plan apart from [[Dedup.nearDupComponents]]' bounded label-
  * propagation loop. At 100 TB: text flows through exactly one narrow
  * scoring projection; dedup/component shuffles carry 64-bit ids only.
  */
object Pipeline {

  /** Clean a document corpus:
    *  1. score: language-id + composite quality per doc (single narrow pass);
    *  2. gate: keep docs with `quality >= minQuality` whose language was
    *     identified (`lang_pred != "und"`);
    *  3. exact dedup: keep the smallest id per identical text;
    *  4. near-dup collapse: candidate pairs from `pairFn` over the
    *     survivors, transitive closure via [[Dedup.nearDupComponents]],
    *     keep each component's minimum id.
    *
    * `pairFn` defaults to the exact inverted-index Jaccard (ground truth,
    * oracle-checkable); at scale pass
    * `Dedup.minhashLshPairs(_, _, _, threshold = t)` — same answer set with
    * P[miss] ~ 5e-9 at the default banding, linear shuffle.
    *
    * Returns (id, lang_pred, quality) for surviving docs.
    */
  def cleanCorpus(
      docs: DataFrame,
      id: Column,
      text: Column,
      minQuality: Double = 0.66,
      jaccardThreshold: Double = 0.8,
      pairFn: (DataFrame, Column, Column, Double) => DataFrame =
        (df, idc, txt, t) => Dedup.ngramJaccardPairs(df, idc, txt, threshold = t)
  ): DataFrame =
    cleanCorpusReleasable(docs, id, text, minQuality, jaccardThreshold, pairFn)._1

  /** As [[cleanCorpus]], additionally returning the persisted gated frame
    * for caller-controlled release (the
    * [[Dedup.minhashLshPairsReleasable]] contract). Persisted because the
    * scoring pass (language-id + quality over full text) feeds the
    * exact-dedup aggregate, the survivor join, the pair generation, and the
    * final anti join — without the cache it re-scores the corpus per
    * reference. (q51's sf0.1 runtime is dominated by the exact pair join,
    * so the bench delta there is noise; the rescoring cost is what scales
    * with corpus size.)
    */
  def cleanCorpusReleasable(
      docs: DataFrame,
      id: Column,
      text: Column,
      minQuality: Double = 0.66,
      jaccardThreshold: Double = 0.8,
      pairFn: (DataFrame, Column, Column, Double) => DataFrame =
        (df, idc, txt, t) => Dedup.ngramJaccardPairs(df, idc, txt, threshold = t)
  ): (DataFrame, DataFrame) = {
    // spread: language-id + quality scoring is fused into the scan —
    // single-split inputs would score the whole corpus on one core
    val scored = Relational.spread(docs).select(
      id.alias("id"),
      text.alias("text"),
      TextFns.langId(text).alias("lang_pred"),
      TextFns.qualityScore(text).alias("quality"))
    val gated = scored
      .filter(col("quality") >= minQuality && col("lang_pred") =!= "und")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // exact dedup: min id per identical text — partial-aggregated, the
    // shuffle carries (text-hash -> min id), not rows. Keyed on the raw
    // text here for oracle parity; key on xxhash64(text) at scale to keep
    // shuffle keys narrow (collision P ~ n^2/2^64).
    val exactSurvivors = gated
      .groupBy(col("text")).agg(min(col("id")).alias("id"))
      .select(col("id"))
    val deduped = gated.join(exactSurvivors, "id")
    val pairs = pairFn(deduped, col("id"), col("text"), jaccardThreshold)
    val comps = Dedup.nearDupComponents(pairs)
    // drop every doc that sits in a component whose representative (min id)
    // is not itself; docs in no pair are their own component implicitly
    val losers = comps.filter(col("id") =!= col("component_id")).select(col("id"))
    val out = deduped.join(losers, Seq("id"), "left_anti")
      .select(col("id"), col("lang_pred"), col("quality"))
    (out, gated)
  }

  /** Raw multi-line corpus -> packed training rows, end to end:
    *  1. boilerplate line removal ([[Corpus.stripBoilerplate]]);
    *  2. language-id + quality gate on the CLEANED text (boilerplate first:
    *     a nav-bar footer on every page otherwise drags every doc's
    *     quality the same direction);
    *  3. exact dedup — min id per identical clean text;
    *  4. token-budget truncation ([[Corpus.truncateTokens]]);
    *  5. sequence packing ([[Corpus.packSequences]]) over the kept counts.
    *
    * Near-dup collapse (pairs + components) slots between 3 and 4 via
    * [[cleanCorpus]]'s machinery when needed — kept separate here because
    * its iterative label propagation is the one non-single-plan stage.
    *
    * Returns (id, lang_pred, quality, n_raw_tokens, was_truncated,
    * n_tokens, seq_id, seq_offset) — one row per surviving doc, ready for
    * a shard writer.
    *
    * Scale shape: every stage is a partial-aggregating groupBy, broadcast
    * anti join, or narrow projection; the only full-text shuffles are the
    * line reassembly (stage 1) and the exact-dedup groupBy (key on
    * xxhash64(clean_text) at scale — raw text kept here for oracle parity).
    */
  def prepareTrainingData(docs: DataFrame, id: Column, text: Column,
      minDocsBoiler: Long = 10L, minQuality: Double = 0.66,
      maxTokens: Int = 512, ctxLen: Long = 2048,
      bucketSize: Long = 4096): DataFrame =
    prepareTrainingDataReleasable(docs, id, text, minDocsBoiler, minQuality,
      maxTokens, ctxLen, bucketSize)._1

  /** As [[prepareTrainingData]], additionally returning the persisted
    * narrow per-doc frame for caller-controlled release (same contract as
    * [[Dedup.minhashLshPairsReleasable]]). Persisted because the packing
    * stage references the post-dedup state three times (bucket partials,
    * the in-bucket window, the feature join) — without it the whole
    * full-text pipeline upstream re-executes per reference. The cached
    * frame is ~40 bytes/doc (text already dropped).
    */
  def prepareTrainingDataReleasable(docs: DataFrame, id: Column, text: Column,
      minDocsBoiler: Long = 10L, minQuality: Double = 0.66,
      maxTokens: Int = 512, ctxLen: Long = 2048,
      bucketSize: Long = 4096): (DataFrame, DataFrame) = {
    val cleaned = Corpus.stripBoilerplate(docs, id, text, minDocsBoiler)
      .select(col("id"), col("clean_text"))
    val gated = cleaned.select(col("id"), col("clean_text"),
        TextFns.langId(col("clean_text")).alias("lang_pred"),
        TextFns.qualityScore(col("clean_text")).alias("quality"))
      .filter(col("quality") >= minQuality && col("lang_pred") =!= "und")
    val survivors = gated
      .groupBy(col("clean_text")).agg(min(col("id")).alias("id"))
      .select(col("id"))
    val toks = TextFns.tokens(col("clean_text"))
    val narrow = gated.join(survivors, "id")
      .withColumn("n_raw_tokens",
        org.apache.spark.sql.functions.size(toks).cast("long"))
      .select(col("id"), col("lang_pred"), col("quality"), col("n_raw_tokens"),
        (col("n_raw_tokens") > maxTokens).alias("was_truncated"),
        least(col("n_raw_tokens"), lit(maxTokens.toLong)).alias("n_tokens"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val packed = Corpus.packSequences(narrow, col("id"), col("n_tokens"),
      ctxLen, bucketSize)
    val out = narrow
      .join(packed.select(col("id"), col("seq_id"), col("seq_offset")), "id")
    (out, narrow)
  }

  /** One-number quality gate — the ensemble every production pipeline
    * eventually converges on: structural health
    * ([[Corpus.gopherQualityFlags]], 250k micro-points per passing rule)
    * plus target-domain affinity ([[Corpus.dsirWeights]], the mean
    * likelihood ratio's distance from parity clamped to ±250k), with an
    * AUDITABLE reason bitmask (bit 0 wc / 1 mean-word-len / 2 stopwords /
    * 3 repetition) — when a doc is dropped, the mask says why, which is
    * what makes gate threshold changes reviewable instead of vibes.
    * All arithmetic integer-exact; `keep` = no structural failure AND
    * score at/above `keepThresholdMicros`.
    *
    * Scale shape: both components are linear corpus passes (the gopher
    * repetition rule's (doc, term) aggregate; DSIR's vocab-sized feature
    * join) glued by one equi-join on the doc id.
    */
  def qualityEnsembleGate(df: DataFrame, id: Column, terms: Column,
      isTarget: Column, keepThresholdMicros: Long = 1000000L): DataFrame = {
    val g = Corpus.gopherQualityFlags(df, id, terms)
    val d = Corpus.dsirWeights(df, id, terms, isTarget)
    g.join(d.select(col("id"), col("mean_ratio_micro")), Seq("id"))
      .withColumn("reason_mask",
        when(col("wc_ok"), 0L).otherwise(1L) +
        when(col("mwl_ok"), 0L).otherwise(2L) +
        when(col("stop_ok"), 0L).otherwise(4L) +
        when(col("rep_ok"), 0L).otherwise(8L))
      .withColumn("gate_score_micros",
        when(col("wc_ok"), 250000L).otherwise(0L) +
        when(col("mwl_ok"), 250000L).otherwise(0L) +
        when(col("stop_ok"), 250000L).otherwise(0L) +
        when(col("rep_ok"), 250000L).otherwise(0L) +
        greatest(least(col("mean_ratio_micro") - 1000000L, lit(250000L)),
          lit(-250000L)))
      .withColumn("keep",
        col("reason_mask") === 0L &&
          col("gate_score_micros") >= keepThresholdMicros)
      .select(col("id"), col("n_words"), col("reason_mask"),
        col("gate_score_micros"), col("mean_ratio_micro"), col("keep"))
  }
}
