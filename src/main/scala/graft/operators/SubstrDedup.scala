package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring deduplication — the ExactSubstr family of Lee et
  * al. 2021 ("Deduplicating Training Data Makes Language Models
  * Better", §4.1): any token window of length `k` whose text appears
  * more than once in the whole corpus is duplicated, and every token
  * covered by a duplicated window is removed from the training text.
  * The paper builds a single-machine suffix array; the Spark-native
  * shape is a LINEAR shingle pass — no suffix structure, no all-pairs:
  *
  *  1. per-row k-gram windows via `transform(sequence, slice)` higher-
  *     order builtins (no shuffle, no positional self-join);
  *  2. ONE hash-partition shuffle keyed on the gram to count corpus
  *     occurrences (a window aggregate — no join back);
  *  3. ONE shuffle keyed on the doc to merge overlapping/adjacent
  *     duplicated windows into maximal spans (classic gaps-and-islands
  *     with a running-max window — O(occurrences), driver-free).
  *
  * At 100 TB the gram-string shuffle dominates, so [[dupSpans]] takes
  * `hashKeys = true` to shuffle 8-byte xxhash64 keys instead of k-token
  * strings (~20x fewer shuffle bytes at k=50); a 64-bit collision over
  * ~10^12 grams is ~10^-5-probable and only ever ADDS a removed span,
  * the conservative direction for training data. The declared query
  * runs the exact string form so the DuckDB oracle re-derives every
  * gram verbatim; the spec pins hashed == exact on the test corpus.
  *
  * Tokens are single-space splits (the corpus convention shared by
  * every text operator here); `k = 50` is the paper's production
  * setting, smaller values suit short-document corpora. */
object SubstrDedup {

  private def gramsOf(df: DataFrame, textCol: String, idCol: String,
      k: Int, hashKeys: Boolean): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // narrow-source guard (r17 optimization round, guide §2.5 "one
    // huge unsplittable file — repartition immediately after the
    // read"): the gram construction (split + k-token concat per
    // window) is the expensive per-row step, and on a single-row-group
    // parquet source it ran inside the one-task scan stage. Same
    // guard as TextDedup.shingles — a no-op whenever the source is
    // already at least as wide as the session's parallelism.
    val target = df.sparkSession.sparkContext.defaultParallelism
    val wide =
      if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    val toks = wide.select(col(idCol), split(col(textCol), " ").as("__toks"))
    val grams = toks.select(col(idCol), posexplode(expr(
      s"""CASE WHEN size(__toks) >= $k
         |THEN transform(sequence(0, size(__toks) - $k),
         |               i -> concat_ws(' ', slice(__toks, i + 1, $k)))
         |ELSE array() END""".stripMargin)).as(Seq("pos", "gram")))
    if (hashKeys) grams.withColumn("__key", xxhash64(col("gram")))
      .drop("gram")
    else grams.withColumn("__key", col("gram")).drop("gram")
  }

  /** Maximal duplicated spans per document: `(id, span_start,
    * span_end, n_tokens)` with inclusive 0-based token positions.
    * A span is the union of overlapping-or-adjacent k-token windows
    * whose gram text occurs >= 2 times corpus-wide (including twice
    * within one document — the paper's "appears more than once"). */
  def dupSpans(df: DataFrame, textCol: String, idCol: String, k: Int,
      hashKeys: Boolean = false): DataFrame = {
    val grams = gramsOf(df, textCol, idCol, k, hashKeys)
    // corpus occurrence count as a window aggregate: one shuffle on the
    // gram key and the occurrences come back annotated — no second join
    val byKey = Window.partitionBy("__key")
    val dup = grams
      .withColumn("__cnt", count(lit(1)).over(byKey))
      .filter(col("__cnt") >= 2)
      .select(col(idCol), col("pos").as("__s"),
        (col("pos") + lit(k - 1)).as("__e"))
    // gaps-and-islands on (doc, start): a window starts a new island
    // when it clears the running max end by 2+ (adjacent windows — the
    // next span starting exactly one past the previous end — merge,
    // since their covered token sets are contiguous)
    val byDoc = Window.partitionBy(idCol).orderBy("__s")
    val runMax = byDoc.rowsBetween(Window.unboundedPreceding, -1)
    dup
      .withColumn("__pmax", max("__e").over(runMax))
      .withColumn("__new",
        when(col("__pmax").isNull || col("__s") > col("__pmax") + 1, 1L)
          .otherwise(0L))
      .withColumn("__isl", sum("__new").over(byDoc))
      .groupBy(col(idCol), col("__isl"))
      .agg(min("__s").as("span_start"), max("__e").as("span_end"))
      .select(col(idCol),
        col("span_start").cast("long").as("span_start"),
        col("span_end").cast("long").as("span_end"),
        (col("span_end") - col("span_start") + 1).cast("long")
          .as("n_tokens"))
  }

  /** The cleaned corpus: every token covered by a duplicated span is
    * dropped (ALL occurrences — the paper removes every copy; a later
    * exact-dedup pass keeps one representative of now-identical rows).
    * Documents with nothing duplicated pass through verbatim. One
    * doc-keyed join against the pair-bounded span table; the per-row
    * rewrite is a higher-order filter over the merged (disjoint,
    * sorted) spans, so it costs O(tokens x spans-in-doc). */
  def clean(df: DataFrame, textCol: String, idCol: String, k: Int,
      hashKeys: Boolean = true): DataFrame = {
    val spans = dupSpans(df, textCol, idCol, k, hashKeys)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start").as("s"),
        col("span_end").as("e"))).as("__spans"))
    df.join(spans, Seq(idCol), "left")
      .select(col(idCol), expr(
        s"""concat_ws(' ', filter(split(`$textCol`, ' '),
           |  (x, i) -> __spans IS NULL OR
           |            NOT exists(__spans, sp -> i >= sp.s AND i <= sp.e)))
           |""".stripMargin).as("text_clean"))
  }
}
