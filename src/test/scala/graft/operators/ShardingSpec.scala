package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Export sharding: determinism, balance, the within-partition
  * training order, and manifest consistency. */
class ShardingSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = (0L until 2000L).map(i => (i, s"tok a b c doc $i"))
    .toDF("doc_id", "text")

  test("shard and order are pure functions of the id (re-run equal), " +
    "and shards are reasonably balanced") {
    val a = Sharding.withShard(docs, "doc_id", 8)
      .select("doc_id", "shard", "train_order").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val b = Sharding.withShard(docs, "doc_id", 8)
      .select("doc_id", "shard", "train_order").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(a == b)
    val sizes = a.values.groupBy(_._1).view.mapValues(_.size)
    assert(sizes.size == 8)
    sizes.values.foreach(s => assert(s > 150 && s < 350, sizes.toMap))
  }

  test("shard order is NOT id order — the global shuffle actually " +
    "shuffles") {
    val firstShard = Sharding.withShard(docs, "doc_id", 1)
      .orderBy("train_order", "doc_id").select("doc_id")
      .limit(20).collect().map(_.getLong(0)).toSeq
    assert(firstShard != (0L until 20L).toSeq, firstShard)
  }

  test("exportOrdered: within each task a shard's rows are contiguous " +
    "and in ascending train_order, and a shard never spans tasks") {
    val out = Sharding.exportOrdered(docs, "doc_id", 4)
      .select("shard", "train_order")
    val parts = out.mapPartitions { it =>
      Iterator.single(it.map(r => (r.getLong(0), r.getLong(1))).toList)
    }.collect()
    parts.foreach { rows =>
      // shard-major, order-minor: the whole row list must already be
      // sorted by (shard, train_order)
      assert(rows == rows.sortBy(identity), "interleaved shards")
    }
    val shardToParts = parts.zipWithIndex.flatMap { case (rows, pi) =>
      rows.map(_._1).distinct.map(_ -> pi)
    }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.length)
    shardToParts.foreach { case (s, n) =>
      assert(n == 1, s"shard $s spans $n tasks")
    }
  }

  test("manifest totals reconcile with the assignment, and first_doc " +
    "is the min (train_order, id)") {
    val assigned = Sharding.withShard(docs, "doc_id", 8)
      .select("doc_id", "shard", "train_order").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val m = Sharding.manifest(docs, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(m.keySet == (0L until 8L).toSet)
    (0L until 8L).foreach { s =>
      val members = assigned.filter(_._2 == s)
      assert(m(s)._1 == members.size)
      assert(m(s)._2 == members.size * 6L) // every doc has 6 tokens
      val first = members.map(x => (x._3, x._1)).min._2
      assert(m(s)._3 == first, s"shard $s")
    }
  }

  test("parameter contract") {
    intercept[IllegalArgumentException] {
      Sharding.withShard(docs, "doc_id", 0)
    }
  }
}
