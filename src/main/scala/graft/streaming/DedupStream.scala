package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.SimHash

/** Streaming near-duplicate detection: the SimHash pigeonhole block
  * join ([[graft.operators.SimHash.nearDupPairs]]) re-expressed as
  * block-keyed STATE, so a document stream is checked against
  * everything already seen the moment it arrives — the continuous twin
  * of the batch web-dedup construction (Manku/Jain/Sarma, WWW'07).
  *
  * Per (block index, block value) group the state holds the (id,
  * simhash) fingerprints seen so far; a new arrival compares against
  * exactly the fingerprints agreeing on that block — the same
  * candidate set the batch equi-join produces, so streamed results
  * equal the batch pairs (spec-enforced). A pair agreeing on several
  * blocks is emitted ONCE, by the lowest agreeing block (both
  * fingerprints are in hand, so the owning block is computable
  * locally — no downstream distinct needed).
  *
  * State is the corpus' fingerprints, 16 bytes per doc per block —
  * bounded by data volume, not time; a production deployment over an
  * unbounded stream pairs this with a state TTL
  * (`GroupStateTimeout.ProcessingTimeTimeout`) and accepts missed
  * pairs across evictions, or compacts state into the batch index
  * periodically. Works identically over a batch DataFrame (Spark runs
  * flatMapGroupsWithState in batch mode with empty initial state). */
object DedupStream {

  case class BlockedFp(block: Int, block_val: Long, id: Long, simhash: Long)
  case class DupPair(id_a: Long, id_b: Long, hamming: Int)

  /** Near-dup pairs (Hamming <= maxHamming) between every document and
    * every EARLIER document (stream order: earlier micro-batch, or
    * smaller id within one batch). Input may be streaming or batch. */
  def nearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): Dataset[DupPair] = {
    require(maxHamming >= 0 && maxHamming <= 63,
      s"maxHamming must be in [0, 63], got $maxHamming")
    val spark = docs.sparkSession
    import spark.implicits._
    val blocks = maxHamming + 1
    val width = 64 / blocks
    val mask = if (width == 64) -1L else (1L << width) - 1

    def blockVal(sim: Long, b: Int): Long = (sim >>> (b * width)) & mask
    // the one block allowed to emit a pair: lowest index where the
    // fingerprints agree (exists for every pair within maxHamming)
    def owningBlock(a: Long, b: Long): Int =
      (0 until blocks).find(j => blockVal(a, j) == blockVal(b, j)).getOrElse(-1)

    val fp = SimHash.fingerprints(docs, idCol, textCol)
    val blocked = fp.select(
        col("id"), col("simhash"),
        posexplode(expr(
          s"transform(sequence(0, ${blocks - 1}), b -> " +
            s"shiftright(simhash, b * $width) & ${mask}L)")))
      .select(col("pos").cast("int").as("block"),
        col("col").as("block_val"), col("id"), col("simhash"))
      .as[BlockedFp]

    blocked
      .groupByKey(r => (r.block, r.block_val))
      .flatMapGroupsWithState[List[(Long, Long)], DupPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((block, _), it, state: GroupState[List[(Long, Long)]]) =>
          val seen = state.getOption.getOrElse(Nil)
          // deterministic intra-batch order: smaller ids are "earlier"
          val arrivals = it.toSeq.sortBy(_.id)
          val out = scala.collection.mutable.ListBuffer[DupPair]()
          // first-wins per id: a replayed or duplicate arrival must not
          // re-enter state (it would double every future pair) nor
          // re-emit its pairs
          val ids = scala.collection.mutable.Set(seen.map(_._1): _*)
          var acc = seen
          arrivals.foreach { d =>
            if (!ids.contains(d.id)) {
              acc.foreach { case (oid, osim) =>
                val ham = java.lang.Long.bitCount(osim ^ d.simhash)
                if (ham <= maxHamming && owningBlock(osim, d.simhash) == block)
                  out += DupPair(math.min(oid, d.id), math.max(oid, d.id), ham)
              }
              acc = (d.id, d.simhash) :: acc
              ids += d.id
            }
          }
          state.update(acc)
          out.iterator
      }
  }
}
