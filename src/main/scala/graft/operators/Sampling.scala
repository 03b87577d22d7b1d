package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus splitting and sampling — the train/validation/
  * test carve-up every training-data pipeline ends with. Membership is
  * a pure function of the row id (content-addressed, no RNG state): the
  * split is stable across runs, executors, partitionings, and engines,
  * so downstream stages can recompute membership instead of joining
  * against a materialized assignment — at 100 TB that deletes a join.
  *
  * The mix is built from codegen'd builtins only (pmod / xor / shifts —
  * no UDF, no custom expression) and every intermediate stays below
  * 2^62, so overflow-checked engines (DuckDB BIGINT) reproduce it
  * bit-for-bit: the oracle re-derives the split from scratch, same
  * portability contract as [[graft.functions.HashMix.portableHash61]].
  * A raw `id % 100` would stripe correlated ids into the same split;
  * two multiply-xorshift rounds decorrelate bucket from id locality. */
object Sampling {

  private val P = 1000000007L

  /** Portable integer mix -> [0, P): two xorshift-multiply rounds over
    * the id, all intermediates < 2^62. */
  def portableMix(id: Column): Column = {
    val h0 = pmod(id.cast("long"), lit(P)) * lit(2654435761L) % lit(P)
    val h1 = (h0.bitwiseXOR(shiftright(h0, 16)) * lit(73244475L)) % lit(P)
    (h1.bitwiseXOR(shiftright(h1, 16)) * lit(73244475L)) % lit(P)
  }

  /** Split bucket in [0, 100). */
  def bucket(id: Column): Column = pmod(portableMix(id), lit(100L))

  /** Add a `split` column: `splits` are (name, percent) pairs summing
    * to <= 100 (rows past the sum get the last split). Order matters
    * and is part of the contract: ("train",80),("valid",10),("test",10)
    * assigns buckets [0,80) / [80,90) / [90,100). */
  def withSplit(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum <= 100,
      "splits must be (name, percent) with percents summing to <= 100")
    val b = bucket(col(idCol))
    val bounds = splits.scanLeft(0)(_ + _._2).tail
    val expr = splits.zip(bounds).init.foldRight(
        lit(splits.last._1): Column) { case (((name, _), hi), rest) =>
      when(b < hi, name).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** Deterministic p-percent sample (the same rows every run). */
  def deterministicSample(df: DataFrame, idCol: String, percent: Int): DataFrame = {
    require(percent >= 0 && percent <= 100)
    df.filter(bucket(col(idCol)) < percent)
  }

  /** STRATIFIED split: exact per-stratum proportions (a plain id-hash
    * split only converges to the requested mix for large strata — a
    * 20-document language would drift badly). Rows are ranked within
    * each stratum by the portable mix (deterministic, content-
    * addressed — no RNG state) and the rank quantile picks the split,
    * so every stratum independently lands `percent`-exact (±1 row).
    * One window per stratum — a per-key sort through one shuffle, the
    * same bound as any grouped sort. */
  def stratifiedSplit(
      df: DataFrame,
      idCol: String,
      strataCols: Seq[String],
      splits: Seq[(String, Int)]): DataFrame = {
    require(strataCols.nonEmpty &&
      splits.nonEmpty && splits.map(_._2).sum <= 100,
      "splits must be (name, percent) with percents summing to <= 100")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(portableMix(col(idCol)), col(idCol))
    val wAll = Window.partitionBy(strataCols.map(col): _*)
    val pct = (row_number().over(w).cast("double") - 1) /
      greatest(count(lit(1)).over(wAll) - 1, lit(1)).cast("double") * 100
    val bounds = splits.scanLeft(0)(_ + _._2).tail
    val expr = splits.zip(bounds).init.foldRight(
        lit(splits.last._1): Column) { case (((name, _), hi), rest) =>
      when(pct < hi, name).otherwise(rest)
    }
    df.withColumn("split", expr)
  }
}
