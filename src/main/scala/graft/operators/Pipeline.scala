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
  ): DataFrame = {
    val scored = docs.select(
      id.alias("id"),
      text.alias("text"),
      TextFns.langId(text).alias("lang_pred"),
      TextFns.qualityScore(text).alias("quality"))
    val gated = scored
      .filter(col("quality") >= minQuality && col("lang_pred") =!= "und")
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
    deduped.join(losers, Seq("id"), "left_anti")
      .select(col("id"), col("lang_pred"), col("quality"))
  }
}
