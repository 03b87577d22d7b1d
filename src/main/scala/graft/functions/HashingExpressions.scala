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
private[graft] object HashMix {
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

  /** SQL-portable 61-bit string hash: two polynomial folds over the
    * Unicode codepoints (mod two ~2^30 primes), each finished with two
    * xorshift-multiply rounds (a raw polynomial fold leaves short
    * strings clustered in the low bits — the finalizer spreads them so
    * per-bit balance holds), packed `h1 * 2^31 + h2`. Every intermediate
    * stays < 2^62, so overflow-checked engines (DuckDB BIGINT)
    * reproduce it exactly; the zero-seeded fold is emulated in DuckDB
    * 1.0 (whose `list_reduce` has no init argument) by prepending 0:
    *
    * {{{
    * r = list_reduce([0::BIGINT] || list_transform(string_split(t, ''),
    *                 c -> ascii(c)::BIGINT),
    *                 (a, x) -> (a * 31 + x) % 1000000007)
    * r = (xor(r, r >> 16) * 73244475) % 1000000007   -- twice
    * h1 = xor(r, r >> 16)
    * -- h2 likewise with (131, 2654435761, 998244353)
    * h = h1 * 2147483648 + h2
    * }}}
    *
    * Weaker avalanche than XXH64 (keep xxhash for pure-engine paths like
    * MinHash); use this where an external SQL oracle must recompute the
    * same fingerprints (SimHash near-dup verification). */
  def portableHash61(s: UTF8String): Long = {
    val str = s.toString
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h1 = (h1 * 31 + cp) % 1000000007L
      h2 = (h2 * 131 + cp) % 998244353L
      i += Character.charCount(cp)
    }
    h1 = ((h1 ^ (h1 >>> 16)) * 73244475L) % 1000000007L
    h1 = ((h1 ^ (h1 >>> 16)) * 73244475L) % 1000000007L
    h1 ^= h1 >>> 16
    h2 = ((h2 ^ (h2 >>> 16)) * 2654435761L) % 998244353L
    h2 = ((h2 ^ (h2 >>> 16)) * 2654435761L) % 998244353L
    h2 ^= h2 >>> 16
    (h1 << 31) + h2
  }
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

  override def nullSafeEval(input: Any): Any = {
    val floats = HashEmbed.compute(input.asInstanceOf[UTF8String], dim)
    val out = new Array[Any](dim)
    var j = 0
    while (j < dim) { out(j) = floats(j); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object HashEmbed {
  private val space = UTF8String.fromString(" ")

  /** The kernel, exposed so the driver-side / mapPartitions text-encoder
    * seam ([[graft.TextEncoder]]) computes bit-identical embeddings. */
  def compute(text: UTF8String, dim: Int): Array[Float] = {
    val toks = text.split(space, -1)
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
    val out = new Array[Float](dim)
    j = 0
    while (j < dim) { out(j) = (acc(j) / norm).toFloat; j += 1 }
    out
  }
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
  * bit i). Empty/null arrays yield null.
  *
  * Token hashes are [[HashMix.portableHash61]] (61 effective bits; bits
  * 61-63 are always 0) so an external SQL oracle can recompute identical
  * fingerprints and brute-force-verify the pigeonhole pair search. */
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
        val h = HashMix.portableHash61(arr.getUTF8String(i))
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

/** fingerprint(text) -> bigint: deterministic polynomial rolling hash of
  * the whole document — left fold `(acc * 31 + codepoint) mod 1e9+7`
  * seeded with the first codepoint (the DuckDB `list_reduce` fold shape,
  * bit-for-bit oracle-matchable). Empty string yields -1.
  *
  * Replaces the interpreted `aggregate(split(text, ''), ...)` HOF
  * formulation (per-character lambda invocations) with one tight loop
  * that stays inside whole-stage codegen via a static call. */
case class Fingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    Fingerprint.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Fingerprint$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Fingerprint {
  /** The fold kernel; public so generated code can call it. */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    if (str.isEmpty) return -1L
    var acc = str.codePointAt(0).toLong
    var i = Character.charCount(str.codePointAt(0))
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }
}
