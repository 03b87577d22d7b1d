package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** PassJoin edit-distance near-dup: blocking must lose NO pair within
  * distance k (equivalence with brute force over random corpora),
  * planted typos are found, and the plan has no cartesian. */
class EditDedupSpec extends SparkTestBase {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("the pigeonhole holds: for random pairs within distance k, at " +
    "least one segment key meets a probe key (pure-kernel check)") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 300) {
      val n = 6 + rnd.nextInt(18)
      val a = (0 until n).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      // mutate up to 2 edits
      var b = a
      for (_ <- 0 until rnd.nextInt(3)) {
        val op = rnd.nextInt(3)
        val p = rnd.nextInt(math.max(1, b.length))
        b = op match {
          case 0 if b.nonEmpty => b.substring(0, p) + b.substring(
            math.min(p + 1, b.length)) // delete
          case 1 => b.substring(0, p) + ('a' + rnd.nextInt(4)).toChar +
            b.substring(p) // insert
          case _ if b.nonEmpty => b.substring(0, p) +
            ('a' + rnd.nextInt(4)).toChar + b.substring(
            math.min(p + 1, b.length)) // replace
          case _ => b
        }
      }
      val k = 2
      if (lev(a, b) <= k && a.length >= k + 1 && b.length >= k + 1) {
        val segA = EditDedup.segments(a, k).toSet
        val prbB = EditDedup.probes(b, k).toSet
        val segB = EditDedup.segments(b, k).toSet
        val prbA = EditDedup.probes(a, k).toSet
        assert(segA.intersect(prbB).nonEmpty ||
          segB.intersect(prbA).nonEmpty,
          s"a=$a b=$b lev=${lev(a, b)}")
      }
    }
  }

  test("nearPairs == brute force over a random corpus (no lost pairs, " +
    "no phantom pairs, exact distances)") {
    val rnd = new scala.util.Random(5)
    val strs = (0 until 120).map { i =>
      if (i % 3 == 0 && i > 0) {
        // a mutated copy of an earlier string: planted near-dups
        val s = (0 until 10).map(_ => ('a' + ((i / 3 + 1) % 4)).toChar)
          .mkString + "xyz"
        s.updated(rnd.nextInt(s.length), 'q')
      } else (0 until 10 + rnd.nextInt(6))
        .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    }
    import spark.implicits._
    val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "t")
    val got = EditDedup.nearPairs(df, "id", "t", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expect = (for {
      i <- strs.indices; j <- strs.indices if i < j
      d = lev(strs(i), strs(j)) if d <= 2
    } yield (i.toLong, j.toLong, d.toLong)).toSet
    assert(got == expect,
      s"missing=${expect -- got} phantom=${got -- expect}")
    assert(expect.nonEmpty) // the corpus really contains near-dups
  }

  test("the plan joins on segment keys — no cartesian, no UDF") {
    import spark.implicits._
    val df = Seq((1L, "abcdefgh"), (2L, "abcdefxh")).toDF("id", "t")
    val plan = EditDedup.nearPairs(df, "id", "t", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BatchEvalPython") &&
      !plan.contains("ScalaUDF"), plan)
    val rows = EditDedup.nearPairs(df, "id", "t", 2).collect()
    assert(rows.length == 1 && rows.head.getLong(2) == 1L)
  }
}
