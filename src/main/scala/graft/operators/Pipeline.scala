package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.UnigramModelRef

/** The end-to-end pretraining data pipeline — the composition every
  * LLM team actually ships, each stage individually proven elsewhere
  * in this repo: PII scrub ([[TextClean.redactPii]]) → benchmark
  * decontamination ([[Decontaminate.cleanWithSet]]) → exact dedup
  * ([[TextDedup.dedupExact]]) → Gopher quality gate
  * ([[QualityGate.filterKept]]) → temperature domain mixing
  * ([[DataMix.temperatureMix]]) → fixed-length sequence packing
  * ([[TextChunk.packSequences]]).
  *
  * Shape at 100 TB, stage by stage:
  *   - scrub, decontaminate (set form), and gate are PURE MAPS — they
  *     fuse with the scan into one codegen stage; the corpus text is
  *     read exactly ONCE for all four cleaning stages ([[cleaned]]'s
  *     plan pin). Dedup is the single data shuffle (hash-partitioned
  *     on text).
  *   - [[cleaned]]'s output — the clean corpus — is materialized once
  *     at the [[pretrain]] boundary (localCheckpoint here; a real
  *     cluster run writes it to parquet, it IS the deliverable). The
  *     mix stage's per-domain counts and the pack stage's three
  *     bounded passes all read the materialized corpus, never the raw
  *     crawl: without the boundary, Spark's lazy lineage would re-run
  *     the regex scrub + gate expressions once per downstream pass
  *     (the [[TextChunk.packSequences]] 2×-at-1M-docs lesson,
  *     BASELINE.md).
  *   - mixing is a broadcast-threshold filter (corpus never shuffled),
  *     packing a bucketed prefix sum (no single-partition exchange).
  *
  * The frozen gate model `m` is fit by the CALLER ([[LmScore.model]] —
  * on the scrubbed corpus for the self-scoring CCNet shape, or on a
  * reference corpus), so the same pipeline instance deploys against a
  * stream of new crawl batches without refitting.
  */
object Pipeline {

  /** Gate thresholds as one value object (defaults = Gopher §A1.1
    * shapes as in [[QualityGate.gate]]). */
  case class GateConfig(
      minTokens: Long = 50,
      maxTokens: Long = 100000,
      minDistinctRatio: Double = 0.45,
      minStopwords: Long = 1,
      stopwords: Seq[String] = QualityGate.GopherStopwords,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxTopBigramFrac: Double = 0.18,
      maxBitsPerToken: Double = 1e9)

  /** Stages 1–4 (scrub → decontaminate → dedup → gate) as ONE lazy
    * composition over `docs` — one text scan, one shuffle (the dedup
    * window), no joins. Output: the input columns with `textCol`
    * scrubbed. Exposed separately from [[pretrain]] so the plan shape
    * is pinnable (the checkpoint boundary in [[pretrain]] erases it).
    */
  def cleaned(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: Seq[String],
      shingleN: Int,
      minHits: Int,
      m: UnigramModelRef,
      gate: GateConfig = GateConfig()): DataFrame = {
    val scrubbed = TextClean.redactPii(docs, textCol)
      .drop("n_email", "n_phone", "n_id", "n_ip")
    val decontaminated =
      Decontaminate.cleanWithSet(scrubbed, textCol, benchmark, shingleN,
        minHits)
    val deduped = TextDedup.dedupExact(decontaminated, idCol, textCol)
    QualityGate.filterKept(deduped, textCol, m,
      gate.minTokens, gate.maxTokens, gate.minDistinctRatio,
      gate.minStopwords, gate.stopwords, gate.minMeanWordLen,
      gate.maxMeanWordLen, gate.maxTopBigramFrac, gate.maxBitsPerToken)
  }

  /** The WEB-FACING front half that precedes [[ingestGate]] — from
    * raw (url, html) crawl records to clean candidate text
    * (RefinedWeb §3.1's extraction + URL stages): HTML-to-text
    * ([[graft.functions.HtmlText]]) composed with Unicode
    * canonicalization ([[graft.functions.NormalizeText]] — so the
    * output is single-line NFC text ready for hashing/dedup), URL
    * canonicalization to the dedup key
    * ([[graft.functions.UrlNormalize]]), registered-domain extraction
    * ([[graft.functions.UrlDomain]]), rows with unparseable URLs
    * dropped, and the RefinedWeb per-domain document cap
    * (keep-first-`maxPerDomain` by id).
    *
    * Shape at 100 TB: extraction, normalization and both URL kernels
    * are per-row codegen'd expressions fused with the scan; the ONLY
    * shuffle is the per-domain window (hash on domain). For
    * pathological head domains, swap the window for the bounded
    * per-key top-K aggregate ([[graft.functions.TopKAggregate]]) —
    * same deterministic result, no per-domain sort. */
  def crawlExtract(
      docs: DataFrame,
      idCol: String,
      urlCol: String,
      htmlCol: String,
      maxPerDomain: Int): DataFrame = {
    import org.apache.spark.sql.graftshim.Shim
    val extracted = docs
      .withColumn("url", Shim.column(
        graft.functions.UrlNormalize(Shim.expression(col(urlCol)))))
      .withColumn("domain", Shim.column(
        graft.functions.UrlDomain(Shim.expression(col("url")))))
      .withColumn("txt", Shim.column(graft.functions.NormalizeText(
        graft.functions.HtmlText(Shim.expression(col(htmlCol))))))
      .filter(col("url").isNotNull && col("domain").isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("domain").orderBy(idCol)
    extracted
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= maxPerDomain)
      .drop("rn")
  }

  /** Stages every crawler runs AT INGEST — scrub → set-decontaminate
    * → frozen-model gate — with the corpus-wide stage (dedup) left
    * out: dedup needs cross-row state and lives in the batch
    * compaction pass ([[cleaned]]). Everything here is a per-row
    * map, so the three stages fuse with the scan into one codegen
    * stage and the same call filters a structured stream
    * row-for-row. */
  def ingestGate(
      docs: DataFrame,
      textCol: String,
      benchmark: Seq[String],
      shingleN: Int,
      minHits: Int,
      m: UnigramModelRef,
      gate: GateConfig = GateConfig()): DataFrame = {
    val scrubbed = TextClean.redactPii(docs, textCol)
      .drop("n_email", "n_phone", "n_id", "n_ip")
    val decontaminated =
      Decontaminate.cleanWithSet(scrubbed, textCol, benchmark, shingleN,
        minHits)
    QualityGate.filterKept(decontaminated, textCol, m,
      gate.minTokens, gate.maxTokens, gate.minDistinctRatio,
      gate.minStopwords, gate.stopwords, gate.minMeanWordLen,
      gate.maxMeanWordLen, gate.maxTopBigramFrac, gate.maxBitsPerToken)
  }

  /** The COMPLETE map-only ingest filter: [[ingestGate]] plus the
    * frozen-threshold domain mix ([[DataMix.applyMix]] under
    * `thresholds` fit ONCE on a reference snapshot via
    * [[DataMix.mixThresholds]]). Every stage is a per-row map or a
    * stream-static broadcast filter — no shuffle, no window, no
    * state — so the identical call filters a batch table and a
    * structured streaming ingest (spec-pinned streamed == batch).
    * This is the deployment split the frozen LM model uses: heavy
    * statistics are fit offline, the crawl is filtered as it
    * arrives.
    *
    * Operational note: BECAUSE nothing shuffles, parallelism equals
    * the source partitioning — there is no exchange to rebalance
    * behind. A crawl written as a handful of fat files serializes
    * the whole regex/gate chain into that many tasks (measured: the
    * same 1M-doc corpus runs ~100× slower from 1 input split than
    * from 64). Size `spark.sql.files.maxPartitionBytes` or
    * repartition the source once; at 100 TB the input is thousands
    * of splits and this is free. */
  def ingestFilter(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      benchmark: Seq[String],
      shingleN: Int,
      minHits: Int,
      m: UnigramModelRef,
      gate: GateConfig,
      thresholds: DataFrame): DataFrame =
    DataMix.applyMix(
      ingestGate(docs, textCol, benchmark, shingleN, minHits, m, gate),
      idCol, groupCol, thresholds)

  /** The full pipeline: [[cleaned]], materialized once, then mixed
    * ([[DataMix.temperatureMix]] over `domainCol`) and packed
    * ([[TextChunk.packSequences]] at `seqLen`). Output: one row per
    * (document, training sequence) overlap — (idCol, seq_id, tok_from,
    * n_toks). */
  def pretrain(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      domainCol: String,
      benchmark: Seq[String],
      shingleN: Int,
      minHits: Int,
      m: UnigramModelRef,
      gate: GateConfig,
      alpha: Double,
      totalOut: Long,
      seqLen: Int): DataFrame = {
    // the clean corpus, computed exactly once (see class doc); eagerly
    // materialized so neither the mix's count pass nor the pack's
    // three passes re-run the cleaning expressions
    val corpus = cleaned(docs, idCol, textCol, benchmark, shingleN,
      minHits, m, gate).localCheckpoint(true)
    val mixed = DataMix.temperatureMix(corpus, idCol, domainCol, alpha,
      totalOut)
    TextChunk.packSequences(mixed, idCol, textCol, seqLen)
  }
}
