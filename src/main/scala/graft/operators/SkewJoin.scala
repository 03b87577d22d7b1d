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
  * The left salt is `xxhash64(leftSaltBy) mod salt` rather than
  * `rand()` — deterministic, same output every run. `leftSaltBy` MUST
  * vary within a key group (e.g. the fact table's primary key); a
  * per-key-constant column would put every hot-key row on one salt
  * value and spread nothing.
  */
object SkewJoin {

  private val SaltCol = "__graft_salt"

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
    require(!left.columns.contains(SaltCol) && !right.columns.contains(SaltCol),
      s"inputs must not already contain a '$SaltCol' column")
    val saltedLeft = left.withColumn(SaltCol,
      pmod(xxhash64(leftSaltBy), lit(salt.toLong)))
    val saltedRight = right.crossJoin(
        right.sparkSession.range(salt).select(col("id").as(SaltCol)))
    saltedLeft
      .join(saltedRight, Seq(key, SaltCol))
      .drop(SaltCol)
  }
}
