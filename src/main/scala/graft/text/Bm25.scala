package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed BM25 retrieval over a document corpus — the standard
  * lexical ranking function (Robertson/Walker Okapi BM25, the Lucene
  * `ln(1 + (N - df + 0.5)/(df + 0.5))` idf variant), re-expressed as
  * three relational stages so a 100 TB corpus never does anything but
  * hash-partitioned aggregations and one broadcast join:
  *
  *   1. INDEX ([[buildIndex]]): postings `(term, doc_id, tf)` plus
  *      per-document lengths — one shuffle of (term, doc) pairs, both
  *      aggregations map-side combinable. Persist the postings bucketed
  *      by term for repeated query workloads (same posture as the
  *      minhash/bloom/IVF index family).
  *   2. STATS: `(term, df)` and the corpus constants (N, avgLen) —
  *      dimension-sized.
  *   3. SEARCH ([[topK]]): the query set's terms broadcast against the
  *      postings scan (only matching postings survive — the relational
  *      analog of reading the inverted lists), per-(query, doc) partial
  *      sums map-side, and a `row_number <= k` ranking that Spark plans
  *      as a WindowGroupLimit (map-side top-k pre-prune before the
  *      exchange — no query funnels the corpus through one task).
  *
  * Engine-exactness: floats never reach the gate's hash. The idf is
  * quantized ONCE per distinct df to micro-units
  * (`round(ln(...) * 1e6)` — a few hundred distinct df values, each a
  * single transcendental evaluation), the tf normalization is one
  * fixed-operand-order double expression quantized to nano-units, and
  * the final score is the exact BIGINT sum of their products — so
  * summation order cannot perturb the ranking and DuckDB reproduces the
  * score bit-for-bit (txt_bm25 gate).
  */
object Bm25 {

  /** k1 = 1.2, b = 0.75 — the standard defaults, kept fixed so the
    * quantized arithmetic matches the oracle's literal replay. */
  val k1 = 1.2
  val b = 0.75

  /** Postings relation `(term, doc_id, tf)`. One exchange. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))

  /** Per-document token counts `(doc_id, dl)` — null/empty texts keep a
    * row with dl = 0 (they can never match, but corpus constants must
    * count them: BM25's avgdl is over ALL documents). */
  def docLengths(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      coalesce(size(TextOps.tokens(col(textCol))), lit(0))
        .cast("long").as("dl"))

  /** Micro-unit idf per distinct document frequency:
    * `round(ln(1 + (N - df + 0.5)/(df + 0.5)) * 1e6)`. df is the ONLY
    * input, so the corpus evaluates the transcendental once per
    * distinct df value — dimension-sized. */
  def idfMicro(dfCol: Column, n: Long): Column =
    round(log(lit(1.0) + (lit(n.toDouble) - dfCol.cast("double") + lit(0.5))
      / (dfCol.cast("double") + lit(0.5))) * lit(1e6)).cast("long")

  /** Nano-unit BM25 tf normalization
    * `round(tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) * 1e9)` — ONE
    * double expression with a fixed operand order, reproduced literally
    * by the oracle, so the rounded long is engine-exact. `avgdl` is
    * passed as the exact double `sumDl / nDocs` (one IEEE division). */
  def tfnNano(tf: Column, dl: Column, avgdl: Double): Column =
    round(tf.cast("double") * lit(k1 + 1.0) /
      (tf.cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * (dl.cast("double") / lit(avgdl))))
      * lit(1e9)).cast("long")

  /** Top-k BM25 search. `queries` is `(query_id, text)`-shaped (column
    * names given by `qIdCol`/`qTextCol`); the query set is small by
    * contract (it broadcasts). Duplicate terms within one query count
    * once (standard bag-of-query-terms with binary query tf — the
    * common retrieval setup). Returns
    * `(query_id, doc_id, rank, score)` with `score` the exact
    * micro*nano-unit BIGINT sum; ties break by doc_id ascending.
    * Documents never matching any query term are absent (scores of 0
    * are not emitted); a query with no indexed terms returns no rows. */
  def topK(docs: DataFrame, queries: DataFrame, k: Int,
           idCol: String = "doc_id", textCol: String = "text",
           qIdCol: String = "query_id", qTextCol: String = "text")
      : DataFrame = {
    val post = postings(docs, idCol, textCol)
    val dls = docLengths(docs, idCol, textCol)
    val consts = dls.agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L)))
      .head()
    val n = consts.getLong(0)
    require(n > 0, "empty corpus")
    val avgdl = consts.getLong(1).toDouble / n.toDouble
    val dfRel = post.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .withColumn("idf_u", idfMicro(col("df"), n))
    val qterms = queries
      .select(col(qIdCol).as("query_id"),
        explode(TextOps.tokens(col(qTextCol))).as("term"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    post
      .join(broadcast(qterms), Seq("term"))
      .join(dfRel.select(col("term"), col("idf_u")), Seq("term"))
      .join(dls, Seq("doc_id"))
      .withColumn("__s", col("idf_u") * tfnNano(col("tf"), col("dl"), avgdl))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__s")).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"), col("score"))
  }

  /** Positional postings `(term, doc_id, pos)` — 0-based token
    * position, the relation behind [[phraseMatches]]. One explode, one
    * exchange-free projection (consumers group or join as they need). */
  def positionalPostings(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "term")))
      .select(col("term"), col("doc_id"), col("pos").cast("long").as("pos"))

  /** Exact consecutive-token phrase occurrences — the positional-index
    * phrase query of a search engine, planned relationally. Returns
    * `(doc_id, match_pos)`, one row per occurrence (0-based position of
    * the phrase's first token; overlapping occurrences all emit).
    *
    * Scale shape: the corpus is tokenized ONCE and immediately filtered
    * to the phrase's distinct terms — the `isin` predicate prunes
    * before anything shuffles, so the materialized relation
    * (localCheckpoint, so the k-1 self-joins below don't re-scan the
    * corpus k times) is bounded by the phrase terms' postings lists,
    * never the corpus. Then k-1 equi-joins on `(doc_id, pos - i)` chain
    * the positions; each join's build side is one term's postings, so
    * cost tracks the RAREST term — the classic inverted-index phrase
    * plan, with Catalyst free to reorder the equi-join chain. */
  def phraseMatches(docs: DataFrame, phrase: Seq[String],
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val terms = phrase.map(_.toLowerCase)
    val post = positionalPostings(docs, idCol, textCol)
      .filter(col("term").isin(terms.distinct: _*))
      .localCheckpoint()
    val first = post.filter(col("term") === terms.head)
      .select(col("doc_id"), col("pos").as("match_pos"))
    terms.zipWithIndex.tail.foldLeft(first) { case (acc, (t, i)) =>
      acc.join(post.filter(col("term") === t)
          .select(col("doc_id"), (col("pos") - i).as("match_pos")),
        Seq("doc_id", "match_pos"))
    }
  }
}
