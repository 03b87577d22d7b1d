package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim

import graft.functions.{VectorSumLong, WordVecEmbed, WordVecModelRef}

/** Learned word vectors as a PARQUET MODEL TABLE — the engine's
  * semantically-real text encoder behind the [[graft.TextEncoder]]
  * seam (SURVEY S6).
  *
  * The reference encodes queries with a sentence-transformers model
  * (tests/ann/test_weaviate.py:38-44, examples/01_simple.ipynb:83
  * `{"path": "sentence-transformers/nli-mpnet-base-v2"}`); no
  * pretrained weights exist in this sandbox, so the engine LEARNS its
  * vectors from the corpus itself with positive-PMI-weighted random
  * indexing (Sahlgren 2005's random-indexing family: each context
  * word owns a deterministic ±1 hash vector; a word's embedding is
  * the PPMI-weighted sum of its co-occurring contexts' hash vectors —
  * the sparse-random-projection view of the PPMI co-occurrence
  * matrix factorizations word2vec approximates, Levy & Goldberg 2014).
  * The trained model is DATA, not code: a `(word, vec)` parquet table
  * — the same frozen-model pattern as [[LmScore]]/[[Classifier]]/
  * [[Bpe]] — so the oracle re-derives every pooled document vector in
  * SQL from the dumped table, and a real sentence-transformers model
  * exported to the same two-column layout drops in unchanged.
  *
  * Training is PLAN-DETERMINISTIC: co-occurrence and marginal counts
  * are longs, PPMI weights are quantized to integer micros, and the
  * embedding sum runs through [[VectorSumLong]] (associative long
  * adds), so two runs produce bit-identical models regardless of task
  * scheduling — the property that lets a declared query and its aux
  * dump train independently and still agree.
  *
  * Scale shape (100 TB): pair generation is a zero-shuffle
  * higher-order-function map over the token arrays (never a self-join
  * on position); the corpus shuffles ONCE, key-hashed on the forward
  * pair, into bounded counts; everything after (symmetrize, PPMI,
  * projection, normalize) operates on vocab-bounded tables with
  * broadcast joins. Encoding is either a broadcast join + one
  * map-side-partial mean aggregate (corpus form) or a zero-join
  * codegen'd map (frozen form, [[registerSql]] / [[encoder]]).
  */
object WordVec {

  /** Train a `(word, vec array<float>)` model. `window` is the
    * one-sided co-occurrence width; vocabulary keeps words with
    * `count >= minCount`, top `maxVocab` by (count desc, word) —
    * fully deterministic. Vectors are L2-normalized. */
  def train(
      docs: DataFrame,
      textCol: String,
      dim: Int = 64,
      window: Int = 2,
      minCount: Int = 2,
      maxVocab: Int = 65536): DataFrame = {
    require(dim > 0 && window > 0)
    val toks = Bm25.tokens(col(textCol))
    // vocabulary: bounded, deterministically tie-broken. Bounded
    // intermediates (vocab, pair counts, symmetrized counts) are
    // PINNED with localCheckpoint: each feeds 2+ downstream jobs, and
    // without the pin the 100M+-row pair stage re-executes once per
    // consumer (measured 256 s → 27 s on the 1M-doc probe) — the
    // DataMix materialize-bounded-lineage pattern.
    val vocab = docs
      .select(explode(toks).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(desc("cnt"), col("word"))
      .limit(maxVocab)
      .select("word")
      .localCheckpoint()
    // co-occurrence pairs at offsets 1..window, generated MAP-SIDE by
    // the codegen'd TokenWindowPairs kernel (the HOF zip formulation
    // evaluates interpreted and measured ~7× slower at 1M docs) — the
    // corpus never self-joins and shuffles exactly once (the groupBy)
    val pairs = docs
      .select(explode(Shim.column(graft.functions.TokenWindowPairs(
        Shim.expression(toks), window))).as("p"))
      .select(substring_index(col("p"), " ", 1).as("w"),
        substring_index(col("p"), " ", -1).as("c"))
      .join(broadcast(vocab.withColumnRenamed("word", "w")), Seq("w"), "left_semi")
      .join(broadcast(vocab.withColumnRenamed("word", "c")), Seq("c"), "left_semi")
      .groupBy("w", "c").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    // symmetrize on the COUNTED (bounded) table, not the raw pairs
    val sym = pairs
      .union(pairs.select(col("c").as("w"), col("w").as("c"), col("cnt")))
      .groupBy("w", "c").agg(sum(col("cnt")).as("cnt"))
      .localCheckpoint()
    val marg = sym.groupBy("w").agg(sum(col("cnt")).as("mw")).localCheckpoint()
    val totals = sym.agg(sum(col("cnt")).as("t"))
    // PPMI in integer micros: ln(cnt·T / (m(w)·m(c))), positive part —
    // quantized so the projection sum below is exact long arithmetic
    val ppmi = sym
      .join(broadcast(marg), Seq("w"))
      .join(broadcast(marg.select(col("w").as("c"), col("mw").as("mc"))),
        Seq("c"))
      .crossJoin(broadcast(totals))
      .withColumn("ppmi_micros",
        round(log(col("cnt").cast("double") * col("t").cast("double") /
          (col("mw").cast("double") * col("mc").cast("double"))) *
          lit(1000000.0)).cast("long"))
      .filter(col("ppmi_micros") > 0)
      .select("w", "c", "ppmi_micros")
    // random-indexing projection: context c owns the deterministic ±1
    // hash vector h(c,·) = pmod(xxhash64(c,·),2)·2−1 via the codegen'd
    // RiContrib kernel (bit-identical to the transform(...) HOF form,
    // whose interpreted lambda dominated the 1M-doc training probe);
    // v(w) = Σ_c ppmi(w,c)·h(c,·), summed in longs
    val sums = ppmi
      .select(col("w"), Shim.column(graft.functions.RiContrib(
        Shim.expression(col("c")),
        Shim.expression(col("ppmi_micros")), dim)).as("contrib"))
      .groupBy("w")
      .agg(Shim.column(VectorSumLong(
        Shim.expression(col("contrib"))).toAggregateExpression()).as("s"))
    // L2-normalize (float output; norm in double — micros can square
    // past long range)
    val norm = sqrt(aggregate(col("s"), lit(0.0),
      (a, x) => a + x.cast("double") * x.cast("double")))
    sums
      .withColumn("__n", norm)
      .filter(col("__n") > 0)
      .select(col("w").as("word"),
        transform(col("s"), x => (x.cast("double") / col("__n"))
          .cast("float")).as("vec"))
  }

  def save(model: DataFrame, path: String): Unit =
    model.write.mode("overwrite").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Corpus-form encode: mean-pool each row's in-vocabulary token
    * vectors (occurrence multiplicity preserved) via a broadcast join
    * + one map-side-partial [[graft.functions.VectorAvg]] — adds
    * `outCol: array<double>`. Rows with NO in-vocabulary token are
    * dropped (no direction to represent), matching the frozen form's
    * null. Mean in double, never re-cast to float, so the oracle's
    * DOUBLE re-derivation from the dumped model matches. */
  def encodeJoin(
      df: DataFrame,
      idCol: String,
      textCol: String,
      model: DataFrame,
      outCol: String = "vec"): DataFrame = {
    val toks = df
      .select(col(idCol), explode(Bm25.tokens(col(textCol))).as("word"))
    toks
      .join(broadcast(model), Seq("word"))
      .groupBy(idCol)
      .agg(graft.Graft.vectorAvg(col("vec")).as(outCol))
  }

  /** Collect a (bounded-vocabulary) model table into the frozen
    * reference object the zero-join deployment forms share. */
  def modelRef(model: DataFrame): WordVecModelRef =
    WordVecModelRef(model.select("word", "vec").collect().map { r =>
      r.getString(0) -> r.getSeq[Float](1).toArray
    }.toIndexedSeq)

  /** The `String => Array[Float]` face for [[graft.TextEncoder.set]] —
    * `similar('query text')` then encodes through the learned model. */
  def encoder(model: DataFrame): MeanPoolEncoder =
    MeanPoolEncoder(modelRef(model))

  /** Column-form frozen encode — the codegen'd expression, usable
    * directly in DataFrame code. */
  def embed(ref: WordVecModelRef, text: Column): Column =
    Shim.column(WordVecEmbed(Shim.expression(text), ref))

  /** Register `name(text)` in SQL bound to THIS model (replaces any
    * previous binding — models are session state, unlike the static
    * built-ins Graft.init registers once). */
  def registerSql(
      spark: SparkSession,
      ref: WordVecModelRef,
      name: String = "wordvec_embed"): Unit =
    Shim.replaceFunction(spark, name,
      es => WordVecEmbed(es.head, ref))
}

/** Serializable mean-pool encoder over a frozen [[WordVecModelRef]] —
  * the learned twin of [[graft.HashingEncoder]]. */
case class MeanPoolEncoder(ref: WordVecModelRef)
    extends (String => Array[Float]) with Serializable {
  override def apply(text: String): Array[Float] = ref.encodeToFloats(text)
  /** Double-precision pooling (pre-float-cast) for ranking paths that
    * stay in double end-to-end. */
  def encodeToDoubles(text: String): Array[Double] = ref.encodeToDoubles(text)
}
