package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.HashEmbed

/** The text→vector encoder seam (SURVEY S6).
  *
  * The reference drives a sentence-transformers model end-to-end
  * (tests/ann/test_weaviate.py:38-44) but treats the encoder as a
  * pluggable component of the embeddings config (01_simple.ipynb:
  * `{"path": "sentence-transformers/nli-mpnet-base-v2"}`). The engine's
  * equivalent is a plain `String => Array[Float]` hook:
  *
  *  - [[HashingEncoder]] is the in-repo, model-free implementation
  *    (bit-identical to the `hash_embed` Catalyst expression);
  *  - a real model drops in as any serializable function — e.g. a
  *    mapPartitions-batched ONNX/JNI session initialized per partition —
  *    exactly the [[graft.operators.Multimodal]] codec pattern;
  *  - [[TextEncoder.encodeColumn]] is the distributed batch-encode
  *    helper; [[TextEncoder.encode]] the driver-side single-string path
  *    used by the `similar('query text')` SQL rewrite.
  */
object TextEncoder {

  /** Session-global encoder used by `similar('text')` in SQL; swap in a
    * real model with [[set]]. Defaults to [[HashingEncoder]](64). */
  @volatile private var current: String => Array[Float] = HashingEncoder(64)

  def set(encoder: String => Array[Float]): Unit = { current = encoder }
  def reset(): Unit = { current = HashingEncoder(64) }

  /** The encoder currently registered — dialect rewrites inspect it to
    * decide whether the in-engine hash kernel can stand in per row. */
  def registered: String => Array[Float] = current

  /** Encode one string with the registered encoder (driver-side). */
  def encode(text: String): Array[Float] = current(text)

  /** Distributed batch encode: adds `outCol: array<float>` computed from
    * `textCol` by `encoder` (must be serializable; null text → null
    * vector). A per-partition-initialized model belongs inside the
    * encoder's first call (lazy session), mirroring Multimodal's codec. */
  def encodeColumn(
      df: DataFrame,
      textCol: String,
      outCol: String,
      encoder: String => Array[Float] = current): DataFrame = {
    val idx = df.schema.fieldIndex(textCol)
    val outSchema = df.schema.add(outCol,
      ArrayType(FloatType, containsNull = false), nullable = true)
    val enc = encoder // stable local so the closure doesn't capture `this`
    df.mapPartitions { it =>
      it.map { r =>
        val v = if (r.isNullAt(idx)) null else enc(r.getString(idx))
        Row.fromSeq(r.toSeq :+ v)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}

/** Model-free hashing encoder — the driver-side face of the `hash_embed`
  * expression (same kernel, bit-identical vectors). */
case class HashingEncoder(dim: Int = 64) extends (String => Array[Float])
    with Serializable {
  override def apply(text: String): Array[Float] =
    HashEmbed.compute(UTF8String.fromString(text), dim)
}

/** Helpers for the txtai SQL-dialect surface: `similar('query text')`
  * against a registered `txtai` virtual table (reference
  * examples/01_simple.ipynb:446,468,490,550 — `SELECT text, score FROM
  * txtai WHERE similar('...')`). */
object Txtai {

  /** Build a literal `array<float>` expression for an encoded query
    * (used by the `similar` function builder on string arguments). */
  private[graft] def encodedLiteral(text: String)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    Literal.create(TextEncoder.encode(text),
      ArrayType(FloatType, containsNull = false))

  private[graft] def literalText(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Option[String] =
    e match {
      case Literal(s: UTF8String, StringType) => Some(s.toString)
      case _ => None
    }

  /** Register the reference's `txtai` virtual table over the driver
    * testdata pair: documents joined to their embeddings, exposing
    * `id`, `text`, metadata, and the `vector` column that one-argument
    * `similar('...')` binds to. */
  def register(
      docs: DataFrame,
      embeddings: DataFrame,
      name: String = "txtai"): Unit = {
    import org.apache.spark.sql.functions.col
    val view = docs.join(embeddings, docs("doc_id") === embeddings("vec_id"))
      .select(docs("doc_id").as("id"), col("text"), col("lang"),
        col("source"), col("n_chars"), col("embedding").as("vector"))
    view.createOrReplaceTempView(name)
    // the view doubles as keyword_score's stats corpus (swap in a
    // persisted Bm25Index via Keyword.registerIndex at scale)
    Keyword.registerCorpus(view, "text")
  }
}
