package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temperature-scaled domain mixing — the data-mix step every public
  * LLM recipe runs before training (XLM-R's α-smoothed multinomial,
  * the Pile's per-subset weights, Llama's source mix): given a corpus
  * grouped by domain with counts n_g, sample group g toward the
  * α-temperature share q_g = n_g^α / Σ_h n_h^α. α = 1 preserves the
  * natural mix, α = 0 flattens to uniform, α ∈ (0,1) upsamples tail
  * domains relative to their natural share. This is the KEEP side
  * (targets are capped at n_g — no replication); an epochs-style
  * upsample is a `crossJoin(range(ceil))` the caller composes.
  *
  * Membership is content-addressed through [[Sampling.portableMix]]
  * (no RNG state): the same doc survives the mix on every run, every
  * partitioning, every engine — the DuckDB oracle re-derives the whole
  * assignment from scratch. Per-group targets use the repo's float
  * convention (`round(·, 6)` before the floor) so a last-ulp `pow`
  * difference between JVM and C math libraries cannot move an integer
  * boundary.
  *
  * Two shapes, one contract:
  *  - [[temperatureMixExact]]: rank-within-group cut — EXACTLY k_g
  *    rows per group, one window (a per-key sort through one shuffle).
  *    Right when groups are many or the run wants exact counts.
  *  - [[temperatureMix]]: threshold form — keep iff
  *    mix(id) < P·k_g/n_g, a map-only filter under a broadcast of the
  *    (group, threshold) table. ZERO shuffles of the corpus (no
  *    window, plan-pinned), so it is the 100 TB shape; group sizes
  *    land binomially around k_g instead of exactly.
  */
object DataMix {

  private val P = 1000000007L

  /** Per-group α-temperature targets: (groupCol, __n, __k) where
    * __k = min(n_g, ⌊round(totalOut·n_g^α / Σ_h n_h^α, 6)⌋). A tiny
    * aggregate (one row per domain) — both consumers broadcast it. */
  private def targets(
      docs: DataFrame,
      groupCol: String,
      alpha: Double,
      totalOut: Long): DataFrame = {
    val counts = docs.groupBy(groupCol).agg(count(lit(1)).as("__n"))
    val denom = counts.agg(sum(pow(col("__n"), alpha)).as("__denom"))
    counts.crossJoin(broadcast(denom))
      .select(col(groupCol), col("__n"),
        least(col("__n"),
          floor(round(lit(totalOut.toDouble) * pow(col("__n"), alpha) /
            col("__denom"), 6)).cast("long")).as("__k"))
  }

  /** Exact form: precisely k_g rows from each group — the k_g
    * lowest-mix docs, ties broken by id. One window over the corpus
    * (per-key sort through one shuffle) + a broadcast join against the
    * one-row-per-domain target table. */
  def temperatureMixExact(
      docs: DataFrame,
      idCol: String,
      groupCol: String,
      alpha: Double,
      totalOut: Long): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0,
      s"temperature alpha must be in [0, 1], got $alpha")
    require(totalOut > 0, s"totalOut must be positive, got $totalOut")
    val w = Window.partitionBy(groupCol)
      .orderBy(Sampling.portableMix(col(idCol)), col(idCol))
    docs.withColumn("__rn", row_number().over(w))
      .join(broadcast(targets(docs, groupCol, alpha, totalOut)), groupCol)
      .filter(col("__rn") <= col("__k"))
      .drop("__rn", "__n", "__k")
  }

  /** Per-domain token-distribution divergence from the corpus — the
    * diagnostic read alongside the mix decision (which domains are
    * linguistically far from the blend they're entering): for each
    * group g, KL(p_g ‖ q) in bits, p_g the group's unigram MLE and q
    * the corpus unigram MLE, summed over the group's own support (so
    * q > 0 always — no smoothing needed; both are maximum-likelihood,
    * re-derivable exactly by the oracle). Output: (groupCol, n_terms,
    * kl_bits), n_terms = the group's distinct-token support size.
    *
    * Shape at 100 TB: ONE token shuffle builds the (group, tok, c)
    * table — the only pass over the corpus — materialized once via an
    * eager localCheckpoint because three bounded aggregates plus the
    * final join read it (the same load-bearing boundary as
    * `packSequences`). localCheckpoint, not persist: a persist()
    * pins its plan in the driver's CacheManager until an unpersist()
    * that a lazy-returning function has no place to call (repeated
    * calls accumulated cache entries for the driver's lifetime —
    * round-7 finding); checkpoint blocks are instead released by the
    * ContextCleaner when the caller drops the result. The trade is
    * recompute-on-executor-loss: lineage is truncated, so losing a
    * block fails the query and it retries from source — acceptable
    * for a deterministic derived table, unlike an unbounded driver
    * leak. Everything downstream works on |V|·|G| rows, not corpus
    * rows: group totals and the grand total are one-row-per-group /
    * one-row broadcasts; the corpus-marginal join re-shuffles only
    * the bounded count table on `tok`. */
  def domainDivergence(
      docs: DataFrame,
      groupCol: String,
      textCol: String): DataFrame = {
    val lt = docs
      .select(col(groupCol), explode(split(col(textCol), " ")).as("tok"))
      .groupBy(groupCol, "tok").agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val lg = lt.groupBy(groupCol)
      .agg(sum("__c").cast("double").as("__ng"))
    val marginal = lt.groupBy("tok").agg(sum("__c").cast("double").as("__cg"))
    val total = lt.agg(sum("__c").cast("double").as("__n"))
    val p = col("__c").cast("double") / col("__ng")
    val q = col("__cg") / col("__n")
    lt.join(broadcast(lg), groupCol)
      .join(marginal, "tok")
      .crossJoin(broadcast(total))
      .groupBy(groupCol)
      .agg(count(lit(1)).cast("long").as("n_terms"),
        round(sum(p * log2(p / q)), 6).as("kl_bits"))
  }

  /** Threshold form: keep iff mix(id) < ⌊P · k_g/n_g⌋ — a pure
    * per-row predicate under a broadcast (group → threshold) map. The
    * corpus is never shuffled, windowed, or sorted: the plan is scan →
    * broadcast-hash-join → filter, which survives any corpus size.
    * Group sizes are binomial around k_g (the price of map-only).
    * P·(k/n) stays below 2^30 so the IEEE multiply+divide (exactly
    * rounded in both engines) makes the threshold bit-portable. */
  def temperatureMix(
      docs: DataFrame,
      idCol: String,
      groupCol: String,
      alpha: Double,
      totalOut: Long): DataFrame =
    applyMix(docs, idCol, groupCol,
      mixThresholds(docs, groupCol, alpha, totalOut))

  /** The frozen half of the threshold form: the tiny (group, __t)
    * table — one row per domain. Fit it once on a reference snapshot
    * and [[applyMix]] it anywhere, exactly like the frozen LM model
    * ([[LmScore.model]]): the CCNet deployment split, here for the
    * mix stage.
    *
    * MATERIALIZED eagerly (localCheckpoint): the fit is "once" in
    * fact, not just in intent — a lazy return would re-run the whole
    * upstream pipeline (possibly a scrub→gate chain over the full
    * corpus) inside every consumer's broadcast build. Measured at 1M
    * docs with the ingest-filter chain upstream: materializing cut
    * the filtering pass 3× (80 s lazy → 27 s). The table is one row
    * per domain, so the checkpoint itself is free; blocks are
    * released by the ContextCleaner when the caller drops the
    * result (the [[domainDivergence]] boundary pattern). */
  def mixThresholds(
      docs: DataFrame,
      groupCol: String,
      alpha: Double,
      totalOut: Long): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0,
      s"temperature alpha must be in [0, 1], got $alpha")
    require(totalOut > 0, s"totalOut must be positive, got $totalOut")
    targets(docs, groupCol, alpha, totalOut)
      .select(col(groupCol),
        floor(lit(P).cast("double") *
          (col("__k").cast("double") / col("__n").cast("double")))
          .cast("long").as("__t"))
      .localCheckpoint(true)
  }

  /** The map half: keep iff mix(id) < threshold, a pure per-row
    * predicate under a broadcast of the threshold table. Since the
    * corpus side is never shuffled, windowed, or sorted, the SAME
    * call mixes a structured stream (stream–static broadcast join +
    * filter — spec-pinned streamed == batch) as it mixes a batch
    * table. */
  def applyMix(
      docs: DataFrame,
      idCol: String,
      groupCol: String,
      thresholds: DataFrame): DataFrame =
    docs.join(broadcast(thresholds), groupCol)
      .filter(Sampling.portableMix(col(idCol)) < col("__t"))
      .drop("__t")
}
