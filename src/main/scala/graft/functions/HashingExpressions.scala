package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native hashing kernels for the dedup operators.
  *
  * The naive formulation (`transform(seq, i -> array_min(transform(sh,
  * s -> xxhash64(s, i))))`) evaluates interpreted higher-order lambdas
  * and re-hashes every string `numHashes` times — O(k·|sh|) string
  * hashes per row. These expressions hash each element ONCE (XXH64, the
  * same kernel as Spark's `xxhash64`) and derive the k hash family
  * members by multiply-add mixing with SplitMix64 constants — O(|sh|)
  * string hashes + O(k·|sh|) long arithmetic in a tight Java loop.
  */
private[functions] object HashMix {
  /** SplitMix64 — generates the per-position mixing constants. */
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def constants(k: Int): (Array[Long], Array[Long]) = {
    val a = new Array[Long](k); val b = new Array[Long](k)
    var i = 0
    while (i < k) {
      a(i) = splitmix64(2L * i) | 1L // odd multiplier
      b(i) = splitmix64(2L * i + 1)
      i += 1
    }
    (a, b)
  }

  def hashUtf8(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
}

/** ngram_shingles(text, n) -> array<string>: the DISTINCT word n-gram
  * shingles of a whitespace-tokenized document, in one pass (split +
  * n-gram build + dedup in tight Java; the `transform`/`concat_ws`
  * higher-order formulation evaluates interpreted lambdas per shingle).
  * Fewer than n tokens → null. */
case class NgramShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1)

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngram_shingles"
  // returns null for sub-threshold/empty inputs even when the
  // child is non-nullable
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].split(space, -1)
    if (toks.length < n) return null
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= toks.length - n) {
      // concat tokens i..i+n-1 with single spaces
      var j = 1
      var sh = toks(i)
      while (j < n) {
        sh = UTF8String.concat(sh, space, toks(i + j))
        j += 1
      }
      seen.add(sh)
      i += 1
    }
    val arr = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** hash_embed(text, dim) -> array<float>: L2-normalized hashed
  * bag-of-words embedding (HashingTF-style) — token t increments slot
  * `xxhash64(t) mod dim`. One pass, tight loop; model-free stand-in
  * for the out-of-engine encode step (SURVEY S6). */
case class HashEmbed(child: Expression, dim: Int)
    extends UnaryExpression with CodegenFallback {
  require(dim > 0)

  override def dataType: DataType =
    ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "hash_embed"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].split(space, -1)
    val acc = new Array[Double](dim)
    var i = 0
    while (i < toks.length) {
      val slot = java.lang.Math.floorMod(HashMix.hashUtf8(toks(i)), dim.toLong)
      acc(slot.toInt) += 1.0
      i += 1
    }
    var ss = 0.0
    var j = 0
    while (j < dim) { ss += acc(j) * acc(j); j += 1 }
    val norm = if (ss > 0) math.sqrt(ss) else 1.0
    val out = new Array[Any](dim)
    j = 0
    while (j < dim) { out(j) = (acc(j) / norm).toFloat; j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** minhash_signature(shingles array<string>, k) -> array<bigint>:
  * the k-position MinHash signature. Null shingle elements are skipped;
  * an empty/null array yields null. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  require(numHashes > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  // returns null for sub-threshold/empty inputs even when the
  // child is non-nullable
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  @transient private lazy val (consA, consB) = HashMix.constants(numHashes)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = HashMix.hashUtf8(arr.getUTF8String(i))
        var j = 0
        while (j < numHashes) {
          val v = h * consA(j) + consB(j)
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** simhash64(tokens array<string>) -> bigint: Charikar fingerprint —
  * bit i of the result is the sign of Σ_tokens (±1 per token's hash
  * bit i). Empty/null arrays yield null. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  // returns null for sub-threshold/empty inputs even when the
  // child is non-nullable
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val counters = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = HashMix.hashUtf8(arr.getUTF8String(i))
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counters(j) += 1 else counters(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var result = 0L
    var j = 0
    while (j < 64) {
      if (counters(j) > 0) result |= (1L << j)
      j += 1
    }
    result
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
