package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** IVF approximate kNN: training determinism, assignment sanity, and
  * the graceful-degradation contract (nprobe = k ⇒ exact search). */
class IvfSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val q = emb.filter(col("vec_id") === 0)
    .select("embedding").head().getSeq[Float](0).toArray

  test("training is deterministic: two train calls give identical codebooks") {
    val m1 = Ivf.train(emb, "embedding", k = 8)
    val m2 = Ivf.train(emb, "embedding", k = 8)
    assert(m1.centroids.length == 8)
    m1.centroids.zip(m2.centroids).foreach { case (a, b) =>
      assert(a.sameElements(b))
    }
  }

  test("every vector lands in the cluster whose centroid it is nearest " +
    "(assignment expression == driver-side model.nearest)") {
    val model = Ivf.train(emb, "embedding", k = 8)
    val rows = Ivf.assign(emb, "embedding", model)
      .select(col("vec_id"), col("cluster"), col("embedding"))
      .collect()
    rows.take(50).foreach { r =>
      val v = r.getSeq[Float](2).toArray
      assert(r.getInt(1) == model.nearest(v).head)
    }
    // all k clusters are populated on the test corpus (sane codebook)
    assert(rows.map(_.getInt(1)).distinct.length == 8)
  }

  test("self-query is found (its own cluster is always probed) and " +
    "nprobe = k degrades to exact search") {
    val model = Ivf.train(emb, "embedding", k = 8)
    val assigned = Ivf.assign(emb, "embedding", model).cache()
    val top = Ivf.search(assigned, "embedding", "vec_id", q, 5, model).head()
    assert(top.getAs[Long]("vec_id") == 0L)
    assert(math.abs(top.getAs[Double]("score") - 1.0) < 1e-12)
    val exact = Knn.search(emb, "embedding", "vec_id", q, 10)
      .select("vec_id").as[Long].collect().toSeq
    val full = Ivf.search(assigned, "embedding", "vec_id", q, 10, model,
      nprobe = 8).select("vec_id").as[Long].collect().toSeq
    assert(full == exact)
    assigned.unpersist()
  }

  test("IvfVectorIndex: cluster-partitioned storage round-trips the " +
    "codebook and prunes unprobed partitions at the scan") {
    val model = Ivf.train(emb, "embedding", k = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-idx").toString
    graft.index.IvfVectorIndex.build(emb, "embedding", "vec_id", dir, model)
    val idx = graft.index.IvfVectorIndex.load(spark, dir)
    // codebook round-trip is bit-exact
    idx.model.centroids.zip(model.centroids).foreach { case (a, b) =>
      assert(a.sameElements(b))
    }
    val res = idx.search(q, 5, nprobe = 2)
    assert(res.head().getAs[Long]("docid") == 0L)
    // partition pruning is visible in the physical plan
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster"), plan)
    assert(idx.count() == emb.count())
  }

  test("IVF+PQ: codes round-trip with the index, searchAdc re-ranks to " +
    "exact scores, and the ADC scan reads only (docid, code)") {
    val model = Ivf.train(emb, "embedding", k = 8)
    val pq = Pq.train(emb, "embedding", m = 8, ksub = 64)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    graft.index.IvfVectorIndex.build(
      emb, "embedding", "vec_id", dir, model, Some(pq))
    val idx = graft.index.IvfVectorIndex.load(spark, dir)
    // PQ codebook round-trips bit-exact
    val loaded = idx.pqModel.get
    assert(loaded.m == pq.m && loaded.ksub == pq.ksub)
    loaded.codebooks.zip(pq.codebooks).foreach { case (ba, bb) =>
      ba.zip(bb).foreach { case (a, b) => assert(a.sameElements(b)) }
    }
    // the ADC stage prunes the vector column from the scan entirely
    val adcPlan = Pq.adcScore(
        idx.df.filter(col("cluster").isin(0, 1)).select("docid", "code"),
        "code", q, pq)
      .queryExecution.executedPlan.toString
    assert(adcPlan.contains("ReadSchema") && !adcPlan.contains("vector"),
      adcPlan)
    val res = idx.searchAdc(q, 5, nprobe = 3)
    val top = res.select("docid", "score").head()
    assert(top.getLong(0) == 0L &&
      math.abs(top.getDouble(1) - 1.0) < 1e-9)
    // recall vs exact search within the same probed clusters
    val exact = idx.search(q, 5, nprobe = 3)
      .collect().map(_.getAs[Long]("docid")).toSet
    val got = res.collect().map(_.getAs[Long]("docid")).toSet
    assert(exact.intersect(got).size >= 4, s"recall ${exact.intersect(got)}")
  }

  test("IvfVectorIndex.append assigns with the stored codebook and the " +
    "appended rows are immediately searchable") {
    val model = Ivf.train(emb, "embedding", k = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-app").toString
    val half = emb.filter(col("vec_id") < 250)
    val rest = emb.filter(col("vec_id") >= 250)
    graft.index.IvfVectorIndex.build(half, "embedding", "vec_id", dir, model)
    val idx = graft.index.IvfVectorIndex.load(spark, dir)
      .append(rest, "embedding", "vec_id")
    assert(idx.count() == emb.count())
    // a query vector from the appended half self-matches at 1.0
    val qv = emb.filter(col("vec_id") === 300)
      .select("embedding").head().getSeq[Float](0).toArray
    val top = idx.search(qv, 1, nprobe = 1).select("docid", "score").head()
    assert(top.getLong(0) == 300L &&
      math.abs(top.getDouble(1) - 1.0) < 1e-9)
  }

  test("searchBatch matches per-query Ivf.search for every query and " +
    "scans only the probed-cluster union") {
    val model = Ivf.train(emb, "embedding", k = 8)
    val assigned = Ivf.assign(emb, "embedding", model).cache()
    val queries = emb.filter(col("vec_id") < 150)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val batch = Ivf.searchBatch(assigned, "embedding", "vec_id",
        queries, "qvec", "qid", 5, model, nprobe = 2)
      .collect()
      .groupBy(_.getAs[Long]("qid"))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getAs[Int]("rank"))
          .map(r => (r.getAs[Long]("id"),
            math.round(r.getAs[Double]("score") * 1e9))).toSeq
      }
    assert(batch.size == 150)
    // spot-check 10 queries against the single-query path
    (0L until 150L by 15L).foreach { qid =>
      val qv = emb.filter(col("vec_id") === qid)
        .select("embedding").head().getSeq[Float](0).toArray
      val single = Ivf.search(assigned, "embedding", "vec_id",
          qv, 5, model, nprobe = 2)
        .collect()
        .map(r => (r.getAs[Long]("vec_id"),
          math.round(r.getAs[Double]("score") * 1e9))).toSeq
      assert(batch(qid) == single, s"qid $qid: ${batch(qid)} vs $single")
    }
    assigned.unpersist()
  }

  test("compact merges append-fragmented files; contents, codebook, " +
    "and search results survive") {
    val model = Ivf.train(emb, "embedding", k = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-cmp").toString
    graft.index.IvfVectorIndex.build(
      emb.filter(col("vec_id") < 200), "embedding", "vec_id", dir, model)
    var idx = graft.index.IvfVectorIndex.load(spark, dir)
    (200L until 500L by 100L).foreach { lo =>
      idx = idx.append(
        emb.filter(col("vec_id") >= lo && col("vec_id") < lo + 100),
        "embedding", "vec_id")
    }
    // the SNAPSHOT's file count is what compaction shrinks (r17:
    // retained older snapshots keep their files on disk until the
    // retention window passes — that is the concurrent-reader
    // guarantee, not fragmentation)
    val before = idx.storageFootprint()._1
    idx.compact()
    val reloaded = graft.index.IvfVectorIndex.load(spark, dir)
    val after = reloaded.storageFootprint()._1
    assert(after < before, s"snapshot files: $before -> $after")
    assert(reloaded.count() == 500)
    reloaded.model.centroids.zip(model.centroids).foreach { case (a, b) =>
      assert(a.sameElements(b))
    }
    val top = reloaded.search(q, 1, nprobe = 1).select("docid", "score").head()
    assert(top.getLong(0) == 0L && math.abs(top.getDouble(1) - 1.0) < 1e-9)
    // the retention window bounds the disk tail: after enough further
    // commits the pre-compact generations are reaped
    var cur = reloaded
    (0 until 3).foreach(_ => cur = cur.compact())
    assert(!new java.io.File(dir, "gen=g-0000000001").exists,
      "expired generations must be reaped")
    assert(cur.count() == 500)
  }

  test("trainDistributed recovers well-separated direction groups and " +
    "matches the sample trainer's clustering on the same data") {
    val rnd = new scala.util.Random(3)
    val groups = Seq(
      Array(1.0f, 0.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f, 0.0f),
      Array(0.0f, 0.0f, 1.0f, 0.0f), Array(0.0f, 0.0f, 0.0f, 1.0f))
    val vecs = (0L until 400L).map { i =>
      val g = (i % 4).toInt
      (i, g, groups(g).map(x => x + rnd.nextFloat() * 0.2f))
    }
    val df = vecs.toDF("vec_id", "g", "embedding")
    val md = Ivf.trainDistributed(df, "embedding", k = 4, iters = 8)
    val assigned = Ivf.assign(df, "embedding", md)
      .select("g", "cluster").collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    // every ground-truth group maps to exactly one cluster and no two
    // groups share one (the 4 directions are trivially separable)
    val byGroup = assigned.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.toSet).toMap
    assert(byGroup.values.forall(_.size == 1), byGroup)
    assert(byGroup.values.flatten.toSet.size == 4, byGroup)
    // same partition of the data as the driver-side trainer
    val ms = Ivf.train(df, "embedding", k = 4, sampleSize = 400)
    val sampleAssigned = Ivf.assign(df, "embedding", ms)
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val distAssigned = Ivf.assign(df, "embedding", md)
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // cluster IDS may permute; the induced partition must be equal
    val p1 = sampleAssigned.groupBy(_._2).values
      .map(_.keys.toSet).toSet
    val p2 = distAssigned.groupBy(_._2).values
      .map(_.keys.toSet).toSet
    assert(p1 == p2)
  }

  test("recall@10 with nprobe=4 of 16 is high on the clustered corpus") {
    val model = Ivf.train(emb, "embedding", k = 16)
    val assigned = Ivf.assign(emb, "embedding", model)
    val exact = Knn.search(emb, "embedding", "vec_id", q, 10)
      .select("vec_id").as[Long].collect().toSet
    val approx = Ivf.search(assigned, "embedding", "vec_id", q, 10, model,
      nprobe = 4).select("vec_id").as[Long].collect().toSet
    // embeddings are label-clustered (TESTDATA.md) — the query's own
    // cluster holds its neighbors; require >= 80% overlap
    assert(exact.intersect(approx).size >= 8,
      s"recall too low: ${exact.intersect(approx).size}/10")
  }
}
