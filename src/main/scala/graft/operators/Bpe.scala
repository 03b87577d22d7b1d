package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer (Sennrich, Haddow & Birch 2016 — the
  * subword vocabulary construction every modern LM pipeline runs),
  * trained and applied Spark-first:
  *
  *  - [[train]] follows the repo's codebook pattern (IVF centroids,
  *    LmScore vocabularies): ONE distributed pass builds the word-
  *    frequency table, a deterministic top-`maxWords` boundary
  *    (count desc, word asc) bounds it, and the merge loop runs
  *    driver-side over that bounded table — the learned model is a
  *    few KB of ordered merges, not data-scale state.
  *  - [[encode]] is the FROZEN deployment form: a pure map with the
  *    merge list riding the codegen'd [[graft.functions.BpeEncode]]
  *    expression — no join, no shuffle, no state — so the same call
  *    tokenizes a structured stream (streamed == batch spec).
  *
  * Merge application is CANONICAL single-pass left-to-right (symbols
  * i, i+1 merge and the scan resumes at i+2 — so in a run `a a a`
  * with merge (a,a) only even offsets merge), NOT the string-replace
  * shortcut: naive `replace("a b", "ab")` on a spaced symbol string
  * false-matches across symbol boundaries (suffix `…xa b`) and
  * misses back-to-back merges. The SQL oracle reproduces the same
  * canonical pass as a `list_reduce` fold, so engine and oracle agree
  * symbol-for-symbol. */
object Bpe {

  /** Ordered merge list; applying merges in index order to a word's
    * character sequence yields its BPE tokenization. */
  final case class BpeModel(merges: Seq[(String, String)]) {
    require(merges.forall { case (a, b) => a.nonEmpty && b.nonEmpty })
  }

  /** Canonical single-pass application of one merge to a symbol
    * sequence: left-to-right, a matched pair consumes both symbols. */
  private[graft] def applyMerge(
      syms: Array[String], a: String, b: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Encode one word under a frozen model. */
  private[graft] def encodeWord(word: String, merges: Seq[(String, String)])
      : Array[String] = {
    var syms = word.map(_.toString).toArray
    merges.foreach { case (a, b) =>
      if (syms.length > 1) syms = applyMerge(syms, a, b)
    }
    syms
  }

  /** Learn `numMerges` merges from the corpus. The distributed part is
    * one word-count shuffle + a bounded TakeOrdered collect; the merge
    * loop is driver-side over the <= maxWords table (Sennrich's
    * algorithm verbatim: count every adjacent pair occurrence weighted
    * by word frequency, merge the most frequent — ties to the
    * lexicographically smallest pair, the repo's deterministic-
    * boundary convention — stop early when no pairs remain). */
  def train(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      maxWords: Int = 65536): BpeModel = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(maxWords > 0, s"maxWords must be positive, got $maxWords")
    val words = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("w"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var table: Array[(Array[String], Long)] =
      words.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val merges = Seq.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val stats = new java.util.HashMap[(String, String), Long]()
      table.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          stats.merge(k, c, _ + _)
          i += 1
        }
      }
      if (stats.isEmpty) exhausted = true
      else {
        var best: (String, String) = null
        var bestC = -1L
        stats.forEach { (k, v) =>
          if (v > bestC || (v == bestC &&
            (k._1 < best._1 || (k._1 == best._1 && k._2 < best._2)))) {
            best = k; bestC = v
          }
        }
        merges += best
        table = table.map { case (syms, c) =>
          (if (syms.length > 1) applyMerge(syms, best._1, best._2)
           else syms, c)
        }
        m += 1
      }
    }
    BpeModel(merges.result())
  }

  /** The model as a tiny DataFrame `(idx, l, r)` — the [[graft.Verify]]
    * `_aux` dump shape, so the SQL oracle replays the merges. */
  def modelDf(spark: org.apache.spark.sql.SparkSession, m: BpeModel)
      : DataFrame = {
    import spark.implicits._
    m.merges.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("idx", "l", "r")
  }

  /** Frozen map-only encode: the document's words each tokenized under
    * the merge list, all symbols joined by single spaces (symbols never
    * contain spaces, so the value is unambiguous). */
  def encode(text: Column, m: BpeModel): Column =
    org.apache.spark.sql.graftshim.Shim.column(
      graft.functions.BpeEncode(
        org.apache.spark.sql.graftshim.Shim.expression(text),
        m.merges.toArray))
}
