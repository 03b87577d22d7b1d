package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.UnigramModelRef

/** CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet:
  * Extracting High Quality Monolingual Datasets from Web Crawl
  * Data", §4.3): score every document with a FROZEN language model
  * and split each language's distribution into head / middle / tail
  * at its perplexity terciles — the standard crawl-quality triage
  * (training pipelines keep head+middle, or sample by bucket).
  *
  * The deployment split mirrors [[DataMix.mixThresholds]]/`applyMix`
  * and [[LmScore.model]]/`scoreWithModel`:
  *
  *  - [[pplThresholds]] fits the tiny per-language tercile table ONCE
  *    on a reference snapshot (exact grouped quantiles — the
  *    few-huge-groups parallel-range-sort plan, one corpus pass);
  *  - [[bucket]] labels any corpus — or a structured STREAM — as a
  *    pure map under a broadcast of that table: the frozen unigram
  *    model rides the codegen'd scoring expression and the threshold
  *    join is stream-static broadcast, so no shuffle touches the
  *    corpus at labeling time. The 100 TB shape: fit on a sample,
  *    label everything.
  *
  * Both bits-per-token and the thresholds are rounded to 6 decimals
  * BEFORE comparison, so bucket boundaries live on the same 1e-6 grid
  * in the engine and the SQL oracle — an ulp of interpolation
  * difference can never flip a label. */
object CcNet {

  private val Ps = Seq(1.0 / 3, 2.0 / 3)
  private def lbl(p: Double): String = Stats.quantileLabel(p)

  /** Per-language tercile thresholds of frozen-model bits-per-token:
    * `(langCol, t_head, t_mid)` — one row per language. */
  def pplThresholds(
      ref: DataFrame,
      textCol: String,
      langCol: String,
      m: UnigramModelRef): DataFrame = {
    val scored = ref.select(col(langCol),
      LmScore.bitsPerToken(col(textCol), m).as("__bits"))
    Stats.groupedQuantilesSorted(scored, Seq(langCol), "__bits", Ps)
      .select(col(langCol),
        round(col(lbl(Ps.head)), 6).as("t_head"),
        round(col(lbl(Ps(1))), 6).as("t_mid"))
  }

  /** Label every document head / middle / tail against the frozen
    * thresholds: `(idCol, langCol, bits_per_token, bucket)`. Pure
    * map + stream-static broadcast join — runs unchanged on a
    * structured stream. Languages absent from the threshold table are
    * dropped (inner join): an unseen language has no calibrated
    * distribution to bucket against. */
  def bucket(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      m: UnigramModelRef,
      thresholds: DataFrame): DataFrame =
    docs
      .select(col(idCol), col(langCol),
        LmScore.bitsPerToken(col(textCol), m).as("bits_per_token"))
      .join(broadcast(thresholds), Seq(langCol))
      .select(col(idCol), col(langCol), col("bits_per_token"),
        when(col("bits_per_token") <= col("t_head"), "head")
          .when(col("bits_per_token") <= col("t_mid"), "middle")
          .otherwise("tail").as("bucket"))

  /** Convenience corpus-native form: thresholds fit on `docs` itself,
    * then every row labeled — the one-shot batch path. */
  def perplexityBuckets(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      m: UnigramModelRef): DataFrame =
    bucket(docs, idCol, textCol, langCol, m,
      pplThresholds(docs, textCol, langCol, m))
}
