package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * When one join key carries a disproportionate share of the left
  * (fact) side, the hash-partitioned join sends that key's entire
  * volume to one reducer. Salting splits each left row into one of
  * `salt` sub-keys deterministically, and replicates each right row
  * across ALL `salt` sub-keys, so the hot key's work spreads over
  * `salt` reducers. Result is identical to the plain equi-join.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default) solves the same problem adaptively for sort-merge
  * joins; explicit salting remains the tool when AQE can't see the
  * skew (e.g. aggregation keys, or joins below AQE's size thresholds)
  * or when the salt must be deterministic for reproducibility.
  *
  * The left salt comes from a hash of the whole row (xxhash64 over the
  * join key + a disambiguating column) rather than `rand()` — same
  * output every run.
  */
object SkewJoin {

  /** Equi-join `left ⋈ right ON key`, salted `salt` ways.
    * `leftSaltBy` should be a column (or expression) that varies within
    * a key group — e.g. the fact table's primary key. */
  def salted(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftSaltBy: Column,
      salt: Int): DataFrame = {
    require(salt >= 1)
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(leftSaltBy), lit(salt.toLong)))
    val saltedRight = right.crossJoin(
        right.sparkSession.range(salt).select(col("id").as("__salt")))
    saltedLeft
      .join(saltedRight, Seq(key, "__salt"))
      .drop("__salt")
  }
}
