package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/test decontamination — the benchmark-leak check every
  * public LLM training pipeline runs before training (GPT-3 appendix C
  * and The Pile both flag training documents sharing long n-grams with
  * evaluation sets; the reference family's data-prep story stops at
  * dedup, this is its eval-side twin).
  *
  * Spark-first shape: shingle BOTH corpora with the dedup operators'
  * [[graft.functions.NgramShingles]] (distinct string n-grams), explode,
  * and equi-join train shingles against test shingles — an inverted
  * join whose cost is Σ_s df_train(s)·df_test(s), never |train|·|test|
  * document pairs. The test side (an eval benchmark) is orders of
  * magnitude smaller than a 100 TB train corpus, so its exploded
  * shingles are broadcast: the train side never shuffles, and the scan
  * + join pipeline into one codegen stage. Per-(train,test) overlap
  * counts DISTINCT shared shingles (each shingle appears once per doc
  * by construction), so `minHits` thresholds exact containment
  * evidence, not tf-weighted noise. */
object Decontaminate {

  /** (train_id, test_id, shared) for every cross-corpus pair sharing at
    * least `minHits` distinct n-gram shingles. `maxShingleDf` drops
    * train-side stop-shingles (boilerplate present in more than that
    * many training docs — they flood the join with pairs that carry no
    * leak signal; dropped shingles don't count toward `shared`, making
    * it a lower bound exactly like [[TextDedup.ngramJaccardPairs]]). */
  def overlaps(
      train: DataFrame,
      trainIdCol: String,
      trainTextCol: String,
      test: DataFrame,
      testIdCol: String,
      testTextCol: String,
      n: Int,
      minHits: Int = 2,
      maxShingleDf: Option[Int] = Some(10000)): DataFrame = {
    var tr = TextDedup.shingles(train, trainIdCol, trainTextCol, n)
      .select(col("id").as("train_id"), explode(col("sh")).as("shingle"))
    maxShingleDf.foreach { cap =>
      val hot = tr.groupBy("shingle").count()
        .filter(col("count") > cap).select("shingle")
      tr = tr.join(broadcast(hot), Seq("shingle"), "left_anti")
    }
    val te = TextDedup.shingles(test, testIdCol, testTextCol, n)
      .select(col("id").as("test_id"), explode(col("sh")).as("shingle"))
    tr.join(broadcast(te), Seq("shingle"))
      .groupBy("train_id", "test_id")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minHits)
  }

  /** The training corpus minus every document [[overlaps]] flags — one
    * broadcast anti-join on the (small, pair-bounded) flag set. */
  def clean(
      train: DataFrame,
      trainIdCol: String,
      trainTextCol: String,
      test: DataFrame,
      testIdCol: String,
      testTextCol: String,
      n: Int,
      minHits: Int = 2,
      maxShingleDf: Option[Int] = Some(10000)): DataFrame = {
    val flagged = overlaps(train, trainIdCol, trainTextCol,
        test, testIdCol, testTextCol, n, minHits, maxShingleDf)
      .select(col("train_id").as(trainIdCol)).distinct()
    train.join(broadcast(flagged), Seq(trainIdCol), "left_anti")
  }
}
