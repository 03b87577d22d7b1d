package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff between two corpus versions — the lake-maintenance
  * primitive behind incremental re-training decisions ("what changed
  * since the last export?"): added / removed / changed per document
  * id, with unchanged rows dropped.
  *
  * 100 TB design: content is reduced MAP-SIDE to a 64-bit content
  * hash before the join, so the one id-keyed shuffle carries
  * (id, hash) pairs — never document payloads. Comparing hashes
  * instead of text is the standard production trade (a 64-bit
  * collision masquerading as "unchanged" is ~2^-64 per pair); the
  * oracle compares full text and the fixture verdicts agree exactly.
  * Null text hashes to the xxhash64 seed on both sides, so
  * null==null reads as unchanged — same as SQL IS NOT DISTINCT FROM.
  *
  * Reference capability: version-aware re-index (the reference
  * re-posts every object on update, weaviate.py:129; a diff is what
  * makes that incremental at scale). */
object CorpusDiff {

  /** Rows of (id, status) for status in added | removed | changed. */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).cast("long").as("id"),
      xxhash64(col(textCol)).as("old_hash"))
    val n = newDf.select(col(idCol).cast("long").as("id"),
      xxhash64(col(textCol)).as("new_hash"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .when(col("old_hash") =!= col("new_hash"), lit("changed"))
          .otherwise(lit("same")).as("status"))
      .filter(col("status") =!= "same")
  }
}
