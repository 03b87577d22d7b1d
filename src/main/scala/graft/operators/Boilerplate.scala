package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LINE-level boilerplate removal — the CCNet/RefinedWeb pass that
  * precedes document-level dedup in every public web pipeline: crawl
  * pages share navigation bars, cookie banners, and footers line for
  * line, and a line that appears in many DISTINCT documents is
  * template, not content (CCNet §3.1 dedups paragraphs by hash across
  * shards; RefinedWeb §3.2 strips repeated lines before MinHash so
  * template mass cannot glue unrelated pages into one near-dup
  * cluster). The reference stack has no line-level surface at all —
  * this extends the dedup family ([[TextDedup]]) one level below the
  * document.
  *
  * Two deployment shapes, mirroring the repo's frozen-model pattern
  * ([[LmScore]], [[DataMix]]):
  *
  *  - [[strip]] — corpus-native: count each line's distinct-document
  *    frequency over the corpus itself, drop lines at or above the
  *    threshold, reassemble documents in original line order. Three
  *    hash-partitioned shuffles (line df, count join, doc
  *    reassembly), each keyed and combinable — nothing all-pairs, no
  *    driver state, so the shape survives 100 TB as-is.
  *  - [[boilerplateSet]] + [[stripWithSet]] — the frozen split: fit
  *    the (bounded, deterministic) boilerplate line set once on a
  *    reference snapshot, then strip as a PURE MAP — `filter` over
  *    the split array against the broadcast set plus `array_join`,
  *    zero shuffles — so the same call cleans a structured stream at
  *    ingest (streamed == batch, like `cleanWithSet`).
  *
  * Lines are `\n`-separated verbatim (no trimming/case-folding — the
  * oracle must re-derive byte-identical lines); the line KEY at this
  * scale is the line text itself, which is also what the DuckDB
  * oracle joins on. At 100 TB the join key would be `xxhash64(line)`
  * with the same plan shape (the hash only shrinks shuffle width;
  * collisions are content-hash-rare and a second byte-equality
  * predicate restores exactness, as `wav_dedup` does).
  */
object Boilerplate {

  /** Distinct-document frequency per line: (line, ndocs). One explode
    * + a two-level groupBy (line,id → line), both hash-partitioned and
    * partially aggregated map-side. */
  def lineDocFreq(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"),
        explode(split(col(textCol), "\n")).as("line"))
      .groupBy("line", "id").agg(count(lit(1)).as("_n"))
      .groupBy("line").agg(count(lit(1)).as("ndocs"))

  /** Corpus-native strip: remove every line appearing in at least
    * `minDocs` distinct documents; documents reassemble in original
    * line order (posexplode position carried through the join, sorted
    * back inside the struct array). Documents whose every line is
    * boilerplate survive with empty text (the trailing id-only left
    * join restores them) — dropping documents is a policy decision
    * left to the quality gate, and [[stripWithSet]] must agree
    * row-for-row with this form. */
  def strip(docs: DataFrame, idCol: String, textCol: String,
      minDocs: Int): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val lines = docs.select(col(idCol).as("id"),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val bp = lineDocFreq(docs, idCol, textCol)
      .filter(col("ndocs") >= minDocs)
      .select("line")
    val kept = lines
      .join(bp.withColumn("_bp", lit(true)), Seq("line"), "left")
      .filter(col("_bp").isNull)
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("pos"), col("line"))))
        .as("ls"))
      .select(col("id"),
        array_join(transform(col("ls"), s => s.getField("line")), "\n")
          .as("text"))
    docs.select(col(idCol).as("id"))
      .join(kept, Seq("id"), "left")
      .select(col("id"), coalesce(col("text"), lit("")).as("text"))
  }

  /** The frozen fit: the boilerplate line set as a deterministic,
    * BOUNDED driver-side array — lines in at least `minDocs` distinct
    * docs, top `maxLines` by (ndocs desc, line asc) so the boundary is
    * reproducible (same rule as `oovRate`'s vocabulary). Bounded
    * collect: `maxLines` caps the driver memory regardless of corpus
    * size. */
  def boilerplateSet(docs: DataFrame, idCol: String, textCol: String,
      minDocs: Int, maxLines: Int = 100000): Array[String] = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    lineDocFreq(docs, idCol, textCol)
      .filter(col("ndocs") >= minDocs)
      .orderBy(col("ndocs").desc, col("line").asc)
      .limit(maxLines)
      .select("line")
      .collect()
      .map(_.getString(0))
  }

  /** The frozen apply: strip a fixed boilerplate set as a PURE MAP —
    * split, builtin higher-order `filter` against the set literal,
    * `array_join`. No join, no shuffle, no state: runs unchanged on a
    * structured stream, and at 100 TB its cost is the text scan
    * itself. The set rides the plan as an array literal (same
    * deployment as the `cleanWithSet` benchmark set); for multi-query
    * reuse Spark broadcasts the serialized plan once per stage. */
  def stripWithSet(docs: DataFrame, textCol: String,
      boilerplate: Array[String]): DataFrame = {
    val set = array(boilerplate.map(lit(_)).toIndexedSeq: _*)
    docs.withColumn(textCol,
      array_join(
        filter(split(col(textCol), "\n"), l => !array_contains(set, l)),
        "\n"))
  }
}
