package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim

/** Edit-distance near-duplicate pairs — the typo tier of the dedup
  * family (exact < edit-distance < n-gram Jaccard < MinHash <
  * SimHash < embedding): titles, URLs and short fields that differ
  * by a character or two are the duplicates none of the set-based
  * tiers see.
  *
  * Candidate generation is PassJoin-style segment blocking (Li,
  * Deng, Feng 2011), never all-pairs: split every string into k+1
  * contiguous segments — k edits can destroy at most k of them, so
  * for any pair within distance k at least one segment of the
  * shorter string survives VERBATIM in the other, shifted by at most
  * k. One side emits its k+1 segments keyed (length, segment-index,
  * text); the other emits every substring that could match a
  * segment of a string whose length lies within ±k of its own —
  * a bounded (2k+1)·(k+1)·(2k+1) keys per row, constant in corpus
  * size. An equi-join on the key meets every candidate pair at least
  * once; exact `levenshtein` verifies, so blocking can only cost
  * recall it provably doesn't lose — the spec pins equivalence with
  * brute force.
  *
  * At 100 TB: the shuffle carries short segment keys (not pairs),
  * candidates ∝ true matches + collisions, and the verify is a
  * per-row codegen'd builtin. */
object EditDedup {

  /** The k+1 segment layout for a string of length n: the first
    * `(k+1) - n%(k+1)` segments take n/(k+1) chars, the rest one
    * more — fixed and shared by both join sides. */
  def layout(n: Int, k: Int): Array[(Int, Int)] = {
    val parts = k + 1
    val base = n / parts
    val rem = n % parts
    val out = new Array[(Int, Int)](parts)
    var pos = 0
    var i = 0
    while (i < parts) {
      val len = if (i < parts - rem) base else base + 1
      out(i) = (pos, len)
      pos += len
      i += 1
    }
    out
  }

  /** Segment keys of `s`: (n, i, segment). */
  def segments(s: String, k: Int): Seq[(Int, Int, String)] = {
    val n = s.length
    if (n < k + 1) return Seq.empty // too short to partition
    layout(n, k).zipWithIndex.collect {
      case ((pos, len), i) if len > 0 => (n, i, s.substring(pos, pos + len))
    }
  }

  /** Probe keys of `s`: for every candidate source length la within
    * ±k, every substring that could be segment i of an la-length
    * string (start within ±k of the segment's home position). */
  def probes(s: String, k: Int): Seq[(Int, Int, String)] = {
    val nb = s.length
    val out = Seq.newBuilder[(Int, Int, String)]
    var la = math.max(k + 1, nb - k)
    while (la <= nb + k) {
      val lay = layout(la, k)
      var i = 0
      while (i < lay.length) {
        val (pos, len) = lay(i)
        if (len > 0) {
          var start = math.max(0, pos - k)
          val hi = math.min(nb - len, pos + k)
          while (start <= hi) {
            out += ((la, i, s.substring(start, start + len)))
            start += 1
          }
        }
        i += 1
      }
      la += 1
    }
    out.result().distinct
  }

  /** All unordered pairs (idA < idB) with levenshtein ≤ `maxDist`,
    * plus the verified distance. */
  def nearPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 4, s"maxDist $maxDist out of [1,4]")
    val spark = df.sparkSession
    import spark.implicits._
    val k = maxDist
    val base = df.select(col(idCol).cast("long").as("id"),
      col(textCol).cast("string").as("txt"))
    // the emitters are codegen'd expressions (no UDF): bounded key
    // arrays once per row before the join; the hot per-candidate work
    // (the verify) is the codegen'd levenshtein builtin
    val segKeys = Shim.column(
      graft.functions.EditSegments(Shim.expression($"txt"), k))
    val probeKeys = Shim.column(
      graft.functions.EditProbes(Shim.expression($"txt"), k))
    val segs = base.select($"id".as("id_s"), $"txt".as("txt_s"),
      explode(segKeys).as("key"))
    val prbs = base.select($"id".as("id_p"), $"txt".as("txt_p"),
      explode(probeKeys).as("key"))
    segs.join(prbs, segs("key") === prbs("key"))
      .filter($"id_s" =!= $"id_p")
      .select(
        least($"id_s", $"id_p").as("id_a"),
        greatest($"id_s", $"id_p").as("id_b"),
        when($"id_s" < $"id_p", $"txt_s").otherwise($"txt_p").as("txt_a"),
        when($"id_s" < $"id_p", $"txt_p").otherwise($"txt_s").as("txt_b"))
      .distinct()
      .withColumn("dist", levenshtein($"txt_a", $"txt_b"))
      .filter($"dist" <= k)
      .select($"id_a", $"id_b", $"dist".cast("long").as("dist"))
  }
}
