package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join — `left.value BETWEEN right.lo AND right.hi` — without
  * the nested-loop plan Spark produces for non-equi predicates (a
  * BroadcastNestedLoopJoin compares every pair: |L|·|R| work even when
  * almost nothing matches).
  *
  * Binning turns it into an equi-join: each right interval is exploded
  * to the fixed-width bins it covers, the left value maps to exactly
  * ONE bin, and the bin equi-join + residual BETWEEN filter yields each
  * matching pair exactly once (no dedup pass — a pair can only meet in
  * the left value's single bin). Work becomes |L| + Σ_r spans(r) join
  * rows through a hash join — proportional to data + match density,
  * not |L|·|R|. `binWidth` trades right-side replication (wide
  * intervals / narrow bins) against join selectivity (narrow intervals
  * / wide bins); set it near the typical interval width. */
object RangeJoin {

  /** Inner range join: every (left, right) pair with
    * lo <= value <= hi. Long-typed value/lo/hi columns. */
  def binned(
      left: DataFrame,
      valueCol: String,
      right: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val l = left.withColumn("__bin",
      floor(col(valueCol).cast("long") / binWidth))
    val r = right
      .withColumn("__bin", explode(sequence(
        floor(col(loCol).cast("long") / binWidth),
        floor(col(hiCol).cast("long") / binWidth))))
    l.join(r, Seq("__bin"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("__bin")
  }
}
