package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick automaton over UTF-16 code units: the multi-pattern
  * matcher behind blocklist filters (the C4 "bad words" rule drops a
  * page if ANY listed phrase appears). One pass over the text finds
  * all patterns simultaneously — the naive form is |patterns| regex
  * scans per document, which at 100 TB × a few hundred phrases is the
  * difference between scan-bound and CPU-bound ingest. */
final class AhoCorasick(patterns: Seq[String]) extends Serializable {
  // trie as growable parallel arrays; transitions in per-node hashmaps
  private val next = scala.collection.mutable.ArrayBuffer(
    new java.util.HashMap[Char, Int]())
  private val fail = scala.collection.mutable.ArrayBuffer(0)
  private val hit = scala.collection.mutable.ArrayBuffer(false)

  patterns.foreach { p =>
    require(p.nonEmpty, "empty pattern")
    var node = 0
    var i = 0
    while (i < p.length) {
      val c = p.charAt(i)
      var to = next(node).getOrDefault(c, -1)
      if (to < 0) {
        to = next.length
        next += new java.util.HashMap[Char, Int]()
        fail += 0
        hit += false
        next(node).put(c, to)
      }
      node = to
      i += 1
    }
    hit(node) = true
  }
  // BFS failure links; hit flags propagate along them so a match
  // ending mid-pattern of another is still seen
  locally {
    val queue = new java.util.ArrayDeque[Integer]()
    val rootIt = next(0).entrySet().iterator()
    while (rootIt.hasNext) {
      val to = rootIt.next().getValue.intValue()
      fail(to) = 0
      queue.add(to)
    }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      if (hit(fail(u))) hit(u) = true
      val it = next(u).entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getKey.charValue()
        val to = e.getValue.intValue()
        var f = fail(u)
        while (f != 0 && !next(f).containsKey(c)) f = fail(f)
        val cand =
          if (next(f).containsKey(c)) next(f).get(c).intValue() else 0
        fail(to) = if (cand != to) cand else 0
        queue.add(to)
      }
    }
  }

  /** True iff any pattern occurs in `text`. */
  def containsAny(text: String): Boolean = {
    var node = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      while (node != 0 && !next(node).containsKey(c)) node = fail(node)
      node = next(node).getOrDefault(c, 0)
      if (hit(node)) return true
      i += 1
    }
    false
  }
}

/** contains_any(text, patterns) -> boolean: Aho-Corasick blocklist
  * test — `patterns` must be a FOLDABLE array of non-empty strings
  * (the blocklist is a constant of the query, like a frozen model),
  * so the automaton builds once per plan and each row costs one pass
  * over its text regardless of how many phrases the list holds.
  * Substring semantics, case-sensitive — compose with lower() for
  * case folding. */
case class ContainsAny(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "contains_any"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires a literal pattern array")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<string>), got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  @transient private lazy val automaton: AhoCorasick = {
    val arr = right.eval(InternalRow.empty).asInstanceOf[ArrayData]
    val ps = (0 until arr.numElements())
      .map(i => arr.getUTF8String(i).toString)
    require(ps.nonEmpty, s"$prettyName: empty pattern list")
    new AhoCorasick(ps)
  }

  override def nullSafeEval(text: Any, pats: Any): Any =
    automaton.containsAny(text.asInstanceOf[UTF8String].toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ahoCorasick", automaton,
      classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = $acRef.containsAny($t.toString());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
