package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the step that
  * turns pairwise near-dup output ([[TextDedup.ngramJaccardPairs]],
  * [[MinHashLsh.nearDupPairs]], [[SimHash.nearDupPairs]]) into
  * duplicate CLUSTERS, so a pipeline can keep one representative per
  * group rather than reasoning about pairs (the canonical web-dedup
  * shape: near-dup graph → components → keep min-id per component).
  *
  * Algorithm: min-label propagation ("hash-min") with POINTER JUMPING —
  * every round each node takes the minimum label among itself and its
  * neighbors (one hash join + partial-aggregated groupBy on the small
  * pair list, never touching the corpus), then labels jump through
  * labels (component(id) := component(component(id)), a self-join of
  * the label table), which squares the propagation distance per round:
  * O(log diameter) rounds even on chain graphs, the same complexity
  * class as large-star/small-star (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC 2014) with a simpler
  * round primitive. Each round localCheckpoints the label table:
  * iterative DataFrame lineage would otherwise grow a plan per round
  * and re-execute the whole history at every action.
  *
  * The per-round convergence check is one count on the label table
  * (#nodes rows — bounded by 2x the pair count, not the corpus). */
object Components {

  /** Component label (= min reachable id) for every node appearing in
    * `pairs`. Output: (id, component), one row per distinct node. */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 50): DataFrame = {
    val edges = pairs.select(col(aCol).cast("long").as("src"),
        col(bCol).cast("long").as("dst"))
      .union(pairs.select(col(bCol).cast("long").as("src"),
        col(aCol).cast("long").as("dst")))
      .distinct()
      .cache() // reused every round; small (2x pair count)
    // seed with min(self, direct neighbors) — one aggregation, no join:
    // round 0 then only has to DETECT stability on cliquish graphs
    // (every member already saw the clique min) instead of propagating
    var labels = edges.groupBy("src")
      .agg(min("dst").as("__mn"))
      .select(col("src").as("id"),
        least(col("src"), col("__mn")).as("component"))
      .localCheckpoint()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"),
          col("component").as("nbr_comp")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("nbr_comp").as("nbr_min"))
      val prop = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("component").as("old"),
          least(col("component"),
            coalesce(col("nbr_min"), col("component"))).as("component"))
      // pointer jump: component(id) := component(component(id)) — the
      // label table joined with the PREVIOUS round's (materialized)
      // labels compounds propagation distance per round: O(log
      // diameter) rounds on chains instead of O(diameter). Joining
      // prop with itself would square the distance but recompute the
      // neighbor-min join twice per round (prop is lazy); the stale
      // jump keeps one computation per round and still compounds.
      // Skipped in round 0: cliquish dup graphs (the common case)
      // converge in one neighbor-min round.
      val jumped =
        if (it == 0) prop
        else prop
          .join(labels.select(col("id").as("component"),
            col("component").as("__jump")), Seq("component"), "left")
          .select(col("id"), col("old"),
            least(col("component"),
              coalesce(col("__jump"), col("component"))).as("component"))
      // carry old + new through ONE checkpoint so the convergence count
      // is a cheap scan of materialized rows, not a second join pass
      val step = jumped.localCheckpoint()
      changed = step.filter(col("component") =!= col("old")).count()
      labels = step.drop("old")
      it += 1
    }
    edges.unpersist()
    labels
  }

  /** Keep-one-per-cluster over a full corpus: every document keeps its
    * component label (singletons label themselves), and `keep` marks
    * the component representative (min id). One left join against the
    * corpus; the label table is pair-bounded — usually tiny next to
    * the documents, so AQE broadcasts it, but it is NOT force-broadcast:
    * a web-scale dup graph can have billions of pair nodes, and a
    * forced broadcast there would OOM the driver where a shuffled join
    * simply runs. */
  def labelCorpus(
      docs: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String,
      bCol: String): DataFrame = {
    val comp = connectedComponents(pairs, aCol, bCol)
      .select(col("id").as(idCol), col("component"))
    docs.join(comp, Seq(idCol), "left")
      .withColumn("component",
        coalesce(col("component"), col(idCol).cast("long")))
      .withColumn("keep", col(idCol).cast("long") === col("component"))
  }
}
