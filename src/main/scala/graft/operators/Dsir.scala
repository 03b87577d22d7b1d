package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim

import graft.functions.{DsirLogWeight, DsirModelRef, HashedNgramBuckets}

/** Data Selection via Importance Resampling — DSIR (Xie et al. 2023,
  * NeurIPS; the published recipe behind domain-targeted pretraining
  * subsets): estimate two bag-of-hashed-n-gram distributions — the
  * TARGET (the domain you want more of) and the RAW corpus you are
  * selecting from — and keep examples by Gumbel-top-k over the
  * per-document log importance weight log p_target(d)/p_raw(d).
  * Features are unigrams + bigrams hashed into a fixed bucket count
  * (the paper's §3 feature map: the collision coarsening IS the
  * model); both distributions are add-k-smoothed bucket MLEs, so
  * every weight is a closed-form count ratio the DuckDB oracle
  * re-derives exactly — including the selection, whose Gumbel noise
  * is derandomized through the repo's portable id-mix
  * ([[Sampling.portableMix]]) instead of an RNG.
  *
  * Shape at 100 TB: fitting is ONE feature shuffle (explode the
  * codegen'd bucket array, word-count plan with map-side combiners;
  * the per-class split is a conditional sum inside the same
  * aggregate) into a table BOUNDED BY `buckets` rows — never
  * vocabulary-sized. Corpus-native scoring joins the exploded corpus
  * to that bounded table (explicitly broadcast — it cannot exceed
  * `buckets` rows). The frozen form ([[model]] / [[scoreWithModel]])
  * is the deployment shape AND is exact (the hashed feature space is
  * complete by construction, nothing is truncated): a λ-per-bucket
  * array rides as one codegen reference object and scoring is a pure
  * map — zero joins, zero shuffles, zero state — that runs unchanged
  * on a structured stream. Selection is a bounded TakeOrdered top-k.
  * Driver state is bounded by `buckets`.
  */
object Dsir {

  /** Per-document log2 importance weight, corpus-native: fit both
    * distributions ON `docs` (target = rows where `target`; raw = ALL
    * rows — the paper's setup selects from the raw pool that includes
    * target-like text) and score every row. Output (idCol, n_feats,
    * log_w), n_feats = 2·tokens − 1, log_w rounded to 6 decimals. */
  def logWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      target: Column,
      buckets: Int = 10000,
      k: Double = 0.5): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(k > 0, s"smoothing k must be positive, got $k")
    val feats = docs.select(col(idCol), target.cast("boolean").as("__tgt"),
      explode(Shim.column(HashedNgramBuckets(
        Shim.expression(col(textCol)), buckets))).as("__b"))
    val ct = feats.groupBy("__b").agg(
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("__cp"),
      count(lit(1)).as("__cr"))
    val tot = ct.agg(
      sum("__cp").cast("double").as("__np"),
      sum("__cr").cast("double").as("__nr"))
    feats
      .join(broadcast(ct), "__b")
      .crossJoin(broadcast(tot))
      .withColumn("__lw",
        log2((col("__cp") + lit(k)) / (col("__np") + lit(k * buckets))) -
          log2((col("__cr") + lit(k)) / (col("__nr") + lit(k * buckets))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_feats"),
        round(sum("__lw"), 6).as("log_w"))
  }

  /** Fit the FROZEN model: the complete per-bucket λ table (log2
    * target-ratio minus log2 raw-ratio, add-k smoothed over exactly
    * `buckets` slots — empty buckets carry the add-k floor). The
    * collect is bounded by `buckets`. */
  def model(
      docs: DataFrame,
      textCol: String,
      target: Column,
      buckets: Int = 10000,
      k: Double = 0.5): DsirModelRef = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(k > 0, s"smoothing k must be positive, got $k")
    val ct = docs
      .select(target.cast("boolean").as("__tgt"),
        explode(Shim.column(HashedNgramBuckets(
          Shim.expression(col(textCol)), buckets))).as("__b"))
      .groupBy("__b").agg(
        sum(when(col("__tgt"), 1L).otherwise(0L)).as("__cp"),
        count(lit(1)).as("__cr"))
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1), r.getLong(2)))
    val np = ct.map(_._2).sum.toDouble
    val nr = ct.map(_._3).sum.toDouble
    val dp = np + k * buckets
    val dr = nr + k * buckets
    val ln2 = math.log(2.0)
    // the add-k floor for buckets no feature hashed into
    val floor = math.log(k / dp) / ln2 - math.log(k / dr) / ln2
    val lam = Array.fill(buckets)(floor)
    ct.foreach { case (b, cp, cr) =>
      lam(b) = math.log((cp + k) / dp) / ln2 - math.log((cr + k) / dr) / ln2
    }
    DsirModelRef(lam)
  }

  /** [[logWeights]]'s output shape under the frozen model — a pure
    * map (no join, no shuffle, no state) that scores a structured
    * stream exactly as it scores a batch table, and agrees with the
    * corpus-native path on EVERY document (the hashed table is
    * complete; spec-pinned). */
  def scoreWithModel(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      m: DsirModelRef): DataFrame =
    // null-text documents are dropped, matching the corpus-native
    // [[logWeights]] path (which loses them in the feature explode)
    docs.filter(col(textCol).isNotNull).select(col(idCol),
      (size(split(col(textCol), " ")).cast("long") * 2 - 1).as("n_feats"),
      round(Shim.column(DsirLogWeight(Shim.expression(col(textCol)), m)), 6)
        .as("log_w"))

  /** Gumbel-top-k selection over frozen-model weights — the paper's
    * §2 resampling step, derandomized: the Gumbel perturbation
    * g = −ln(−ln u) draws its uniform from [[Sampling.portableMix]]
    * of the row id, so the selected set is a pure function of
    * (corpus, model, n) that the oracle re-derives. Keys are in nats
    * (log_w · ln 2 + g); output (idCol, log_w, key) is the selected
    * top `n` by key. A bounded TakeOrdered — no global sort
    * materialization. */
  def gumbelTopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      m: DsirModelRef,
      n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val p = 1000000007L
    val u = (Sampling.portableMix(col(idCol)) + lit(1L)).cast("double") /
      lit((p + 1).toDouble)
    val lw = Shim.column(DsirLogWeight(Shim.expression(col(textCol)), m))
    docs
      .withColumn("__key", lw * lit(math.log(2.0)) - log(-log(u)))
      .orderBy(desc("__key"), col(idCol))
      .limit(n)
      .select(col(idCol), round(lw, 6).as("log_w"),
        round(col("__key"), 6).as("key"))
  }
}
