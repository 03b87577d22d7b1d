package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Bm25, Bm25Index}

/** BM25 / hybrid scale probe — the keyword twin of [[ScaleBench]]:
  * replicates the sf0.1 corpus to ~5M documents and measures the
  * ad-hoc full-tokenize path against the bucket-partitioned
  * [[Bm25Index]] read path, so the "only the query terms' buckets
  * open at 100 TB" claim carries a number, not an assumption (the
  * LSH/IVF probes' standard in BASELINE.md). Not part of the driver
  * contract; run manually:
  *
  * {{{ sbt "runMain graft.Bm25ScaleBench [replicas]" }}}
  *
  * replicas=1000 → 5M docs (~270M postings); embeddings are
  * replicated to the same 5M id space so the hybrid probe's semantic
  * fetch is measured against a corpus-sized vector table.
  */
object Bm25ScaleBench {
  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.map(_.toInt).getOrElse(1000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.init(spark)

    val docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val nDocs = docs0.count()
    val emb0 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val nEmb = emb0.count()
    // dense distinct ids: docs get doc_id + rep*|docs|; embeddings are
    // replicated (ceil) onto the SAME 0..replicas*|docs| id space so
    // every lexical candidate has a vector (rotated per replica like
    // ScaleBench, so the embedding space stays spread)
    val totalIds = replicas * nDocs
    val big = docs0.crossJoin(
        spark.range(replicas).select(col("id").as("rep")))
      .select((col("doc_id") + col("rep") * nDocs).as("doc_id"), col("text"))
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft-scale-bm25-docs").toString
    big.write.mode("overwrite").parquet(corpusDir)
    val corpus = spark.read.parquet(corpusDir)
    val total = corpus.count()
    println(s"corpus: $total docs")

    val embReps = (totalIds + nEmb - 1) / nEmb
    val bigEmb = emb0.crossJoin(
        spark.range(embReps).select(col("id").as("rep")))
      .select(
        (col("vec_id") + col("rep") * nEmb).as("vec_id"),
        when(col("rep") % 2 === 0, col("embedding"))
          .otherwise(concat(slice(col("embedding"), 33, 32),
            slice(col("embedding"), 1, 32))).as("embedding"))
      .filter(col("vec_id") < totalIds)
    val embDir = java.nio.file.Files
      .createTempDirectory("graft-scale-bm25-emb").toString
    bigEmb.write.mode("overwrite").parquet(embDir)
    val vectors = spark.read.parquet(embDir)
    println(s"vectors: ${vectors.count()} x 64 dims")

    val terms = Seq("vector", "hash", "join")
    val qv = emb0.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray

    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label: $s%.2f s")
      s
    }

    // the ad-hoc path: every query re-tokenizes the whole corpus
    time("ad-hoc bm25 top-10 from parquet (cold)") {
      Bm25.topK(corpus, "text", "doc_id", terms, 10).collect()
    }
    time("ad-hoc bm25 top-10 from parquet (warm)") {
      Bm25.topK(corpus, "text", "doc_id", terms, 10).collect()
    }

    // the indexed path: tokenize once, then a query opens only its
    // terms' hashed bucket partitions
    def probe(nBuckets: Int): Unit = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-scale-bm25-idx$nBuckets").toString
      time(s"Bm25Index.build nBuckets=$nBuckets (one-time write)") {
        Bm25Index.build(corpus, "text", "doc_id", s"$dir/idx", nBuckets)
      }
      val idx = Bm25Index.load(spark, s"$dir/idx")
      time(s"indexed search nBuckets=$nBuckets (cold)") {
        idx.search(terms, 10).collect()
      }
      time(s"indexed search nBuckets=$nBuckets (warm)") {
        idx.search(terms, 10).collect()
      }
      if (nBuckets == 64) {
        // hybrid over the same index: lexical candidates from pruned
        // buckets, vectors by In(docid) pushdown against the flat
        // corpus-sized embedding parquet (row-group stats pruning)
        time("hybrid via index, 50 candidates (cold)") {
          idx.hybridSearch(vectors, "vec_id", "embedding",
            terms, qv, k = 10).collect()
        }
        time("hybrid via index, 50 candidates (warm)") {
          idx.hybridSearch(vectors, "vec_id", "embedding",
            terms, qv, k = 10).collect()
        }
        // batch indexed hybrid: 32 queries, ONE pruned postings read +
        // ONE In(union-ids) vector fetch — the flagship serving path
        val vocab32 = spark.read.parquet(corpusDir)
          .select(explode(Bm25.tokens(col("text"))).as("t"))
          .groupBy("t").count()
          .orderBy(desc("count")).limit(64)
          .collect().map(_.getString(0))
        val hq = (0 until 32).map { i =>
          (i.toLong,
            Seq(vocab32(i % vocab32.length),
              vocab32((i + 17) % vocab32.length)),
            qv)
        }
        time("batch indexed hybrid: 32 queries, one pruned pass") {
          idx.hybridSearchBatch(vectors, "vec_id", "embedding",
            hq, k = 10).collect()
        }
      }
    }
    probe(64)
    probe(256)

    // ad-hoc hybrid: full corpus tokenize AND a full embedding-table
    // join per query — both tables corpus-sized
    time("ad-hoc hybrid from parquet (cold)") {
      Bm25.hybrid(corpus, "text", "doc_id", vectors, "vec_id",
          "embedding", terms, qv)
        .orderBy(desc("hybrid_micros"), col("docid").asc)
        .limit(10).collect()
    }

    // batch keyword: 32 queries over ONE shared postings pass — the
    // sequential equivalent costs 32 × the single ad-hoc number above
    val vocab = corpus
      .select(explode(Bm25.tokens(col("text"))).as("t"))
      .groupBy("t").count()
      .orderBy(desc("count")).limit(64)
      .collect().map(_.getString(0))
    val batch = (0 until 32).map { i =>
      (i.toLong, Seq(vocab(i % vocab.length), vocab((i + 17) % vocab.length)))
    }
    time("batch keyword: 32 queries, ONE shared pass (topKBatch)") {
      Bm25.topKBatch(corpus, "text", "doc_id", batch, 10).collect()
    }
    spark.stop()
  }
}
