package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.functions.{Bm25QueryModel, Bm25Score}
import graft.operators.{Bm25, Bm25Index}

/** The SQL dialect's `keyword_score('query terms')` — the lexical twin
  * of the `similar('query text')` predicate, so a hybrid query needs no
  * API call at all:
  *
  * {{{
  * SELECT id, keyword_score('vector database') AS bm
  * FROM txtai WHERE keyword_score('vector database') > 0
  * ORDER BY bm DESC LIMIT 10
  * }}}
  *
  * BM25 needs corpus-global statistics (per-term df, corpus n/avgdl)
  * that a row-scalar function cannot derive, so — like `similar`'s
  * driver-side text encoding — they are resolved at ANALYSIS time and
  * shipped into the plan as literals inside a [[Bm25QueryModel]]; the
  * per-row kernel is then pure, codegen'd, and pushdown-friendly. Two
  * stats sources, registered driver-side:
  *
  *  - [[Txtai.register]] registers its view as the stats corpus: one
  *    aggregate job per distinct query's terms (cached per
  *    registration) scans the corpus for df/n/avgdl — fine below
  *    cluster scale;
  *  - [[Keyword.registerIndex]] plugs a persisted [[Bm25Index]]: df
  *    comes from the query terms' bucket partitions only and n/avgdl
  *    from the stats sidecar — nothing scans the corpus, which is the
  *    100 TB path.
  *
  * One-argument form binds to the FROM relation's `text` column
  * (mirroring one-argument `similar`'s `vector` binding);
  * `keyword_score(col, 'terms')` names the column explicitly. The terms
  * string is tokenized exactly like [[Bm25]] queries, and scores are
  * bit-identical to [[Bm25.score]]'s `bm25_micros` over the registered
  * corpus by construction (same stats, same literal math). */
object Keyword {

  private case class Source(corpus: Option[(DataFrame, String)],
      index: Option[Bm25Index])

  private var source: Source = Source(None, None)
  private var statsCache: Option[(Long, Double)] = None
  private val dfCache =
    scala.collection.mutable.Map.empty[Seq[String], Map[String, Long]]

  /** Register a corpus DataFrame as the stats source (what
    * [[Txtai.register]] does with its view). */
  def registerCorpus(docs: DataFrame, textCol: String): Unit = synchronized {
    source = Source(Some((docs, textCol)), None)
    statsCache = None
    dfCache.clear()
  }

  /** Register a persisted [[Bm25Index]] as the stats source: df reads
    * only the query terms' bucket partitions, n/avgdl come from the
    * sidecar — the no-corpus-scan path. */
  def registerIndex(idx: Bm25Index): Unit = synchronized {
    source = Source(None, Some(idx))
    statsCache = None
    dfCache.clear()
  }

  /** The `keyword_score` function builder (registered via
    * [[GraftExtensions]]). */
  def build(es: Seq[Expression]): Expression = es match {
    case Seq(q) =>
      Bm25Score(UnresolvedAttribute("text"), model(queryText(q)))
    case Seq(textCol, q) =>
      Bm25Score(textCol, model(queryText(q)))
    case other => throw new IllegalArgumentException(
      s"keyword_score expects 1 or 2 arguments, got ${other.size}")
  }

  private def queryText(q: Expression): String =
    Txtai.literalText(q).getOrElse(throw new IllegalArgumentException(
      "keyword_score: the query must be a string literal — per-row " +
      "query terms would need per-row corpus statistics; score a fixed " +
      "query per pass instead"))

  private[graft] def model(text: String): Bm25QueryModel = synchronized {
    val terms = Bm25.TokenPattern.r
      .findAllIn(text.toLowerCase).toSeq.distinct
    require(terms.nonEmpty, s"keyword_score: no query terms in '$text'")
    val (n, avgdl) = stats()
    val dfs = dfCache.getOrElseUpdate(terms, dfOf(terms))
    val idfs = terms.map { t =>
      val df = dfs.getOrElse(t, 0L)
      math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    }
    Bm25QueryModel(terms, idfs, avgdl)
  }

  private def stats(): (Long, Double) = statsCache.getOrElse {
    val st = source match {
      case Source(_, Some(idx)) => (idx.n, idx.avgdl)
      case Source(Some((docs, textCol)), _) =>
        val row = Bm25.stats(docs, textCol).head()
        (row.getLong(0), row.getDouble(1))
      case _ => throw new IllegalStateException(
        "keyword_score: no corpus registered — call Txtai.register " +
        "(corpus stats) or Keyword.registerIndex (Bm25Index stats) first")
    }
    statsCache = Some(st)
    st
  }

  private def dfOf(terms: Seq[String]): Map[String, Long] = source match {
    case Source(_, Some(idx)) => idx.dfOf(terms)
    case Source(Some((docs, textCol)), _) =>
      docs
        .select(explode(array_distinct(Bm25.tokens(col(textCol))))
          .as("term"))
        .filter(col("term").isin(terms: _*))
        .groupBy("term").agg(count(lit(1)).as("df"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    case _ => throw new IllegalStateException(
      "keyword_score: no corpus registered — call Txtai.register " +
      "(corpus stats) or Keyword.registerIndex (Bm25Index stats) first")
  }
}
