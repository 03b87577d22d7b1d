package graft.operators

import graft.SparkTestBase

/** SQ8: quantization error bound, exact model re-derivation, recall
  * against exact search, the constant-dimension guard, and the dirty
  * code contract. */
class Sq8Spec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  private val vecs = (0L until 200L).map { i =>
    (i, Array.fill(16)(rnd.nextFloat() * 2f - 1f))
  }

  test("dequantization error is within scale/2 per dimension") {
    val emb = vecs.toDF("vec_id", "embedding")
    val m = Sq8.train(emb, "embedding")
    val codes = Sq8.encode(emb, "embedding", m)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("code")).toMap
    vecs.foreach { case (id, v) =>
      val code = codes(id)
      assert(code.length == 16) // 4x smaller than float32
      v.indices.foreach { i =>
        val dq = m.mins(i) + (code(i) & 0xff) * m.scales(i)
        assert(math.abs(dq - v(i)) <= m.scales(i) / 2 + 1e-9,
          s"dim $i of $id: $dq vs ${v(i)} (scale ${m.scales(i)})")
      }
    }
  }

  test("the model is the exact corpus min/max") {
    val emb = vecs.toDF("vec_id", "embedding")
    val m = Sq8.train(emb, "embedding")
    (0 until 16).foreach { i =>
      val col = vecs.map(_._2(i).toDouble)
      assert(m.mins(i) == col.min)
      assert(math.abs(m.scales(i) - (col.max - col.min) / 255.0) < 1e-15)
    }
  }

  test("ADC search recall: top-1 is the exact top-1 (self-match) and " +
    "top-10 overlaps the exact top-10 on >= 8 ids") {
    val emb = vecs.toDF("vec_id", "embedding")
    val m = Sq8.train(emb, "embedding")
    val q = vecs.head._2
    val got = Sq8.search(Sq8.encode(emb, "embedding", m), "code",
      "vec_id", q, 10, m).collect().map(_.getLong(0))
    assert(got.head == 0L, s"self-match lost: ${got.toSeq}")
    val exact = vecs.map { case (id, v) =>
      var d = 0.0; var na = 0.0; var nb = 0.0
      v.indices.foreach { i =>
        d += v(i).toDouble * q(i); na += v(i).toDouble * v(i)
        nb += q(i).toDouble * q(i)
      }
      (d / (math.sqrt(na) * math.sqrt(nb)), id)
    }.sortBy { case (s, i) => (-s, i) }.take(10).map(_._2).toSet
    assert(got.count(exact.contains) >= 8, s"${got.toSeq} vs $exact")
  }

  test("a constant dimension gets scale 0, encodes as code 0, and " +
    "dequantizes to its min") {
    val emb = Seq((1L, Array(1.0f, 5.5f)), (2L, Array(2.0f, 5.5f)))
      .toDF("vec_id", "embedding")
    val m = Sq8.train(emb, "embedding")
    assert(m.scales(1) == 0.0)
    val code = Sq8.encode(emb, "embedding", m)
      .filter("vec_id = 1").head().getAs[Array[Byte]]("code")
    assert(code(1) == 0)
    val s = Sq8.search(Sq8.encode(emb, "embedding", m), "code", "vec_id",
      Array(1.0f, 5.5f), 1, m).head()
    assert(s.getLong(0) == 1L)
  }

  test("wrong-length codes and vectors null out (dirty contract)") {
    val emb = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val m = Sq8.train(emb, "embedding")
    val bad = Seq((9L, Array[Byte](1, 2, 3))).toDF("vec_id", "code")
    assert(Sq8.search(bad, "code", "vec_id", Array(1.0f, 2.0f), 1, m)
      .head().isNullAt(1)) // wrong-length code scores null, never throws
    val wrongDim = Seq((9L, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    assert(Sq8.encode(wrongDim, "embedding", m).head().isNullAt(2))
  }
}
