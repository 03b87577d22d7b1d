package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over a host-level link graph — the crawl-prioritization
  * signal behind every production frontier (the original Page/Brin
  * 1998 formulation; CommonCrawl publishes exactly this as its
  * host-level "harmonic centrality / pagerank" ranking and crawl
  * schedulers seed from it). Composes with the crawl-governance ops
  * already shipped: [[graft.functions.HtmlText]]-extracted links →
  * host edges ([[graft.functions.UrlDomain]]) → rank → frontier
  * priority, with [[Robots]] gating what may be fetched at all.
  *
  * Power iteration with damping d and full dangling-mass handling:
  *   r'(v) = (1−d)/N + d·( Σ_{u→v} r(u)/outdeg(u) + dangling/N ),
  * dangling = Σ over nodes with no out-edges of r(u). Mass is
  * conserved (Σr = 1 every iteration — spec-pinned), so ranks are
  * comparable across graphs and iterations.
  *
  * Shape at 100 TB: each iteration is ONE shuffle — the contribution
  * aggregate on `dst` with map-side partial sums (in-link skew, the
  * web's power law, is absorbed by the combiner); the rank⋈edge join
  * is plain hash equi-join on `src` (AQE picks broadcast when the
  * host table is small, sort-merge when it is not — never a
  * cartesian); the dangling mass is a ONE-ROW broadcast from an
  * anti-join, never a driver collect of ranks. The edge list is
  * cached once and reused every iteration (the GraphX/Pregel
  * discipline), and the rank table is localCheckpoint'ed per round —
  * iterative lineage would otherwise grow a plan per round and
  * re-execute history at every action ([[Components]]' lesson).
  * Driver state: N (one long) — rank vectors never leave the
  * cluster. */
object PageRank {

  /** Rank every node of the (src, dst) edge list. Output (host,
    * rank), rank rounded to 6 decimals, one row per distinct node
    * on either side of an edge. Callers dedup/self-loop-filter their
    * edge list first (rank is defined on a simple directed graph). */
  def hostRank(
      edges0: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 10,
      damping: Double = 0.85,
      checkpointEvery: Int = 1): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1,
      s"damping must be in (0, 1), got $damping")
    require(checkpointEvery >= 1,
      s"checkpointEvery must be >= 1, got $checkpointEvery")
    val e = edges0.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .cache() // reused below to derive the static per-iteration tables
    val nodes = e.select(col("src").as("h"))
      .union(e.select(col("dst").as("h")))
      .distinct()
      .cache() // reused every iteration (left side of the re-expand)
    val n = nodes.count().toDouble // bounded: one long on the driver
    val outdeg = e.groupBy("src").agg(count(lit(1)).cast("double").as("deg"))
    // r17 optimization round: the loop used to join edges⋈ranks⋈outdeg
    // EVERY iteration — but edges⋈outdeg is iteration-invariant, so it
    // is paid once here and cached (guide §2.4: two operations keyed
    // the same way share one exchange; an invariant join inside a loop
    // shares it across ALL rounds). Same terms, same r/deg arithmetic.
    val eDeg = e.join(outdeg, "src")
      .select(col("src"), col("dst"), col("deg"))
      .cache() // reused every iteration
    // the DANGLING-NODE SET is static too (nodes with no out-edges):
    // the per-round ranks⋈outdeg LEFT ANTI join becomes a semi-join
    // against this small cached set — same row set, one fewer
    // corpus-churning anti-join per round
    val dangNodes = nodes
      .join(outdeg.select(col("src").as("h")), Seq("h"), "left_anti")
      .cache() // reused every iteration
    var ranks = nodes.select(col("h"), lit(1.0 / n).as("r"))
      .localCheckpoint()
    var it = 0
    while (it < iterations) {
      // mass parked on dangling nodes (no out-edges), as ONE row
      val dang = ranks
        .join(dangNodes, Seq("h"), "left_semi")
        .agg(coalesce(sum("r"), lit(0.0)).as("__dm"))
      val contribs = eDeg
        .join(ranks.withColumnRenamed("h", "src"), "src")
        .groupBy(col("dst").as("h"))
        .agg(sum(col("r") / col("deg")).as("__c"))
      val next = nodes
        .join(contribs, Seq("h"), "left")
        .crossJoin(broadcast(dang))
        .select(col("h"),
          (lit((1 - damping) / n) + lit(damping) *
            (coalesce(col("__c"), lit(0.0)) + col("__dm") / lit(n)))
            .as("r"))
      it += 1
      // checkpoint cadence, measured both ways and kept at 1: each
      // round references `ranks` THREE times (contribution join,
      // dangling anti-join, node re-expand), so uncheckpointed
      // lineage grows ~3^cadence — cadence 3 measured 37.7 s vs
      // 22.8 s at 4.8M edges, and cadence 5 blew a 21-node toy graph
      // from 3.9 s to 13 s. Per-round materialization is the
      // scale-correct default; the knob exists for single-reference
      // variants, not for skipping rounds here
      ranks =
        if (it % checkpointEvery == 0 || it == iterations)
          next.localCheckpoint()
        else next
    }
    e.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    eDeg.unpersist(blocking = false)
    dangNodes.unpersist(blocking = false)
    ranks.select(col("h").as("host"), round(col("r"), 6).as("rank"))
  }
}
