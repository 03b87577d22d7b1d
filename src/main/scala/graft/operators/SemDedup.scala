package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Graft

/** SemDeDup — semantic deduplication in embedding space (Abbas et
  * al. 2023, "SemDeDup: Data-efficient learning at web-scale through
  * semantic deduplication"): cluster the corpus embeddings with
  * k-means, then inside each cluster drop all but one member of every
  * semantic-duplicate neighborhood, keeping the member with the
  * LOWEST similarity to the cluster centroid (the paper's
  * diversity-preserving direction — the kept example is the least
  * redundant one). Complements the exact/lexical dedup family
  * ([[TextDedup]], [[MinHashLsh]], [[SimHash]]) at the semantic
  * level: paraphrases and boilerplate variants that share no shingle
  * still land in the same cluster within τ.
  *
  * Determinized for the oracle: clustering is the repo's
  * deterministic k-means ([[Ivf.train]] — bounded sample, fixed
  * seeding); centroids for the verdict are the EXACT per-cluster
  * means of the full assignment (not the training sample's), so an
  * external engine re-derives them from the dumped assignment; and
  * the drop rule is a pure pairwise predicate — x is dropped iff
  * some other member y of its cluster has cos(x, y) ≥ τ and
  * (cos(y, c) < cos(x, c), ties broken by lower id) — no sequential
  * greedy state.
  *
  * Shape at 100 TB: the pair search is CLUSTER-BLOCKED (equi-join on
  * the cluster id — never a cartesian; k is chosen so clusters stay
  * bounded, the paper runs k ≈ N/1000 for exactly this reason), the
  * exact centroids come from ONE [[graft.functions.VectorAvg]]
  * partial aggregate (map-side dim-length buffers, no row×dim
  * explode), and the k-row centroid table is broadcast. The verdict
  * join is an anti-join of the assignment against the bounded drop
  * set. Cluster skew (one giant cluster) is the operator's real
  * scale risk: raise k, or use [[verdictsBounded]] — the second-level
  * residual-LSH split that keeps the pair count bounded under
  * pathological skew. */
object SemDedup {

  /** Per-item verdict: (idCol, cluster, cos_centroid, kept) for every
    * row, cos_centroid rounded to 6 decimals, kept = false iff a
    * τ-close, more-centroid-redundant neighbor exists in the same
    * cluster. `assigned` must carry (idCol, vecCol, `cluster`) — the
    * output of [[Ivf.assign]]. */
  def verdicts(
      assigned: DataFrame,
      idCol: String,
      vecCol: String,
      tau: Double): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0, 1], got $tau")
    val cents = assigned.groupBy("cluster")
      .agg(Graft.vectorAvg(col(vecCol)).as("__cent"))
    val scored = assigned
      .join(broadcast(cents), "cluster")
      .select(col("cluster"), col(idCol),
        col(vecCol).as("__v"),
        Graft.cosineSim(col(vecCol), col("__cent")).as("__ca"))
    val x = scored.select(col("cluster"), col(idCol).as("__ida"),
      col("__v").as("__va"), col("__ca").as("__caa"))
    val y = scored.select(col("cluster"), col(idCol).as("__idb"),
      col("__v").as("__vb"), col("__ca").as("__cab"))
    val drops = x.join(y, "cluster")
      .filter(col("__ida") =!= col("__idb"))
      .filter(Graft.cosineSim(col("__va"), col("__vb")) >= tau)
      .filter(col("__cab") < col("__caa") ||
        (col("__cab") === col("__caa") && col("__idb") < col("__ida")))
      .select(col("__ida").as(idCol)).distinct()
    scored
      .join(drops.withColumn("__drop", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("cluster"),
        round(col("__ca"), 6).as("cos_centroid"),
        not(coalesce(col("__drop"), lit(false))).as("kept"))
  }

  /** Skew-hardened [[verdicts]]: clusters larger than
    * `maxClusterSize` are sub-blocked by hyperplane LSH over the
    * RESIDUAL (member − cluster centroid) before the pair join, so
    * the Σ|c|² pair cost is bounded even when k-means hands back one
    * giant cluster (the documented scale risk of the plain form —
    * "raise k" stops being the only answer).
    *
    * Why the residual: a giant cluster is usually TIGHT — every
    * member shares the centroid direction, so raw-vector hyperplanes
    * would assign everyone the same signs and split nothing.
    * Subtracting the centroid removes the common component; what
    * remains is the member's private offset, which random hyperplanes
    * split near-50/50 per bit. Each oversized cluster uses
    * ceil(log2(n / maxClusterSize)) of the signature's low bits —
    * expected block size ≈ maxClusterSize regardless of n.
    *
    * Semantics: cos_centroid is still scored against the ORIGINAL
    * cluster centroid; only the pair BLOCKING key gains the sub-label.
    * Exact and near-exact duplicates have (near-)identical residuals
    * and land in the same block, so verdicts match the unsplit form
    * on tight neighborhoods (spec-pinned with a planted giant
    * cluster); a τ-pair with a large residual gap can straddle blocks
    * — the standard LSH recall trade, bought deliberately for the
    * bounded pair count. Normal-sized clusters take the exact path
    * bit-for-bit (sub-label −1). */
  def verdictsBounded(
      assigned: DataFrame,
      idCol: String,
      vecCol: String,
      tau: Double,
      maxClusterSize: Long,
      dim: Int,
      seed: Long = 42L): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0, 1], got $tau")
    require(maxClusterSize > 0 && dim > 0)
    val lsh = HyperplaneLsh(dim, nbits = 20, seed)
    val sizes = assigned.groupBy("cluster").agg(count(lit(1)).as("__n"))
    val cents = assigned.groupBy("cluster")
      .agg(Graft.vectorAvg(col(vecCol)).as("__cent"))
    val residual = zip_with(col(vecCol), col("__cent"),
      (a, b) => a.cast("double") - b)
    val bits = least(
      greatest(ceil(log2(col("__n").cast("double") /
        lit(maxClusterSize.toDouble))).cast("int"), lit(1)),
      lit(20))
    val scored = assigned
      .join(broadcast(cents), "cluster")
      .join(broadcast(sizes), "cluster")
      .select(col("cluster"), col(idCol),
        col(vecCol).as("__v"),
        Graft.cosineSim(col(vecCol), col("__cent")).as("__ca"),
        when(col("__n") <= maxClusterSize, lit(-1))
          .otherwise(lsh.bucket(residual)
            .bitwiseAND(pow(lit(2.0), bits.cast("double")).cast("int") -
              lit(1)))
          .as("__sub"))
    val x = scored.select(col("cluster"), col("__sub"),
      col(idCol).as("__ida"), col("__v").as("__va"), col("__ca").as("__caa"))
    val y = scored.select(col("cluster"), col("__sub"),
      col(idCol).as("__idb"), col("__v").as("__vb"), col("__ca").as("__cab"))
    val drops = x.join(y, Seq("cluster", "__sub"))
      .filter(col("__ida") =!= col("__idb"))
      .filter(Graft.cosineSim(col("__va"), col("__vb")) >= tau)
      .filter(col("__cab") < col("__caa") ||
        (col("__cab") === col("__caa") && col("__idb") < col("__ida")))
      .select(col("__ida").as(idCol)).distinct()
    scored
      .join(drops.withColumn("__drop", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("cluster"),
        round(col("__ca"), 6).as("cos_centroid"),
        not(coalesce(col("__drop"), lit(false))).as("kept"))
  }

  /** The pruned corpus: `verdicts` filtered to kept rows, joined back
    * to the input columns (the composition callers chain into an
    * index build or a training export). */
  def prune(
      assigned: DataFrame,
      idCol: String,
      vecCol: String,
      tau: Double): DataFrame =
    assigned.join(
      verdicts(assigned, idCol, vecCol, tau)
        .filter(col("kept")).select(idCol),
      Seq(idCol), "left_semi")
}
