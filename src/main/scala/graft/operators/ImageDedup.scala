package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual image near-duplicate search: dHash fingerprints
  * ([[graft.functions.ImageDhash]] — decode → 9x8 box-average grid →
  * 64 gradient-sign bits) + the SAME Manku pigeonhole Hamming search
  * [[SimHash]] uses for text. The web-dedup reality this serves:
  * re-encoded / lightly-edited copies of an image hash within a few
  * bits of each other while byte- and pixel-exact dedup both miss
  * them.
  *
  * The 64 bits travel as two 32-bit words (hi, lo), so the four
  * 16-bit pigeonhole blocks never cross a word boundary and the SQL
  * oracle assembles every value without signed-overflow hazards. With
  * 4 blocks the pigeonhole guarantee covers maxHamming <= 3 (any pair
  * within distance 3 agrees on a full block); candidates come from
  * equi-joins on (block index, block value) and are verified with
  * bit_count(xor) — never an all-pairs scan, the shape that survives
  * a 100 TB image corpus. */
object ImageDedup {

  /** (id, hi, lo) per decodable image — one codegen'd map over the
    * scan; rows whose media cannot hash (dirty, too small) drop. */
  def dhashes(df: DataFrame, bytesCol: String, idCol: String)
      : DataFrame =
    df.select(col(idCol).as("id"),
      org.apache.spark.sql.graftshim.Shim.column(
        graft.functions.ImageDhash(
          org.apache.spark.sql.graftshim.Shim.expression(col(bytesCol))))
        .as("__dh"))
      .filter(col("__dh").isNotNull)
      .select(col("id"), col("__dh.hi").as("hi"), col("__dh.lo").as("lo"))

  /** Near-dup pairs with Hamming(dhash_a, dhash_b) <= maxHamming
    * (<= 3: four 16-bit blocks keep the pigeonhole lossless). */
  def nearDupPairs(
      df: DataFrame,
      bytesCol: String,
      idCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming must be in [0, 3] (4 pigeonhole blocks), got $maxHamming")
    val fp = dhashes(df, bytesCol, idCol)
    val blocked = fp.select(col("id"), col("hi"), col("lo"),
      posexplode(expr(
        "array(lo & 65535L, shiftright(lo, 16) & 65535L, " +
          "hi & 65535L, shiftright(hi, 16) & 65535L)")))
      .withColumnRenamed("pos", "block")
      .withColumnRenamed("col", "block_val")
    val a = blocked.select(col("block"), col("block_val"),
      col("id").as("id_a"), col("hi").as("hi_a"), col("lo").as("lo_a"))
    val b = blocked.select(col("block"), col("block_val"),
      col("id").as("id_b"), col("hi").as("hi_b"), col("lo").as("lo_b"))
    a.join(b, Seq("block", "block_val"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "hi_a", "lo_a", "hi_b", "lo_b")
      .distinct()
      .withColumn("hamming",
        bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
          bit_count(col("lo_a").bitwiseXOR(col("lo_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"),
        col("hamming").cast("long").as("hamming"))
  }
}
