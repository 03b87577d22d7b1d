package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Graft

/** Training-pair mining for metric learning — the step that turns a
  * labeled embedding corpus into (anchor, positive, hard-negative)
  * triplets, the data shape contrastive/dense-retrieval training
  * actually consumes (DPR, Karpukhin et al. 2020 §3.2 mines hard
  * negatives from a retriever's own top results; SBERT's triplet
  * loss wants the same). The positive is the anchor's most-similar
  * SAME-label item; the hard negative is the most-similar
  * DIFFERENT-label item among the anchor's LSH-bucket candidates —
  * "hard" because it is the confusable one, and bucket-restricted
  * because at corpus scale the exact different-label argmax is an
  * all-pairs scan (the same reason retrieval mining uses the ANN
  * index rather than brute force).
  *
  * Shape at 100 TB: positives are LABEL-BLOCKED (equi-join on the
  * label — bounded groups, the [[SemDedup]]/dedup_embedding
  * discipline), negatives are BUCKET-BLOCKED (equi-join on the
  * hyperplane-LSH bucket), and both argmaxes are
  * [[graft.functions.TopKByScore]] bounded-heap aggregates (k = 1:
  * the shuffle carries one pair per anchor per partition, never the
  * candidate lists). No window sort, no cartesian. Anchors missing
  * either side (singleton label, or a bucket with no other label)
  * drop out — the standard mining behavior. */
object Triplets {

  /** Mine one triplet per anchor: (idCol, pos_id, pos_cos, neg_id,
    * neg_cos), cosines rounded to 6 decimals; anchors lacking a
    * same-label peer or an in-bucket different-label candidate are
    * omitted. */
  def mine(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      lsh: HyperplaneLsh): DataFrame = {
    val base = AnnLsh.bucketize(emb, vecCol, lsh)
      .select(col(idCol).as("__id"), col(vecCol).as("__v"),
        col(labelCol).as("__l"), col("bucket"))
    val a = base.select(col("__id").as("__aid"), col("__v").as("__av"),
      col("__l"), col("bucket").as("__ab"))
    val pos = a
      .join(base.select(col("__id").as("__pid"), col("__v").as("__pv"),
        col("__l")), Seq("__l"))
      .filter(col("__aid") =!= col("__pid"))
      .select(col("__aid"),
        Graft.cosineSim(col("__av"), col("__pv")).as("__s"), col("__pid"))
      .groupBy("__aid")
      .agg(Graft.topKByScore(col("__s"), col("__pid"), 1).as("__tp"))
      .select(col("__aid"), col("__tp").getItem(0).getField("id").as("pos_id"),
        round(col("__tp").getItem(0).getField("score"), 6).as("pos_cos"))
    val neg = a
      .join(base.select(col("__id").as("__nid"), col("__v").as("__nv"),
        col("__l").as("__nl"), col("bucket")),
        col("__ab") === col("bucket"))
      .filter(col("__l") =!= col("__nl"))
      .select(col("__aid"),
        Graft.cosineSim(col("__av"), col("__nv")).as("__s"), col("__nid"))
      .groupBy("__aid")
      .agg(Graft.topKByScore(col("__s"), col("__nid"), 1).as("__tn"))
      .select(col("__aid"), col("__tn").getItem(0).getField("id").as("neg_id"),
        round(col("__tn").getItem(0).getField("score"), 6).as("neg_cos"))
    pos.join(neg, "__aid")
      .select(col("__aid").as(idCol), col("pos_id"), col("pos_cos"),
        col("neg_id"), col("neg_cos"))
  }
}
