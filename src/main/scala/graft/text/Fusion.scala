package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval rank fusion (Cormack, Clarke & Buettcher 2009,
  * "Reciprocal rank fusion outperforms Condorcet and individual rank
  * learning methods") — the standard way to combine a lexical (BM25)
  * and a dense (embedding ANN) ranking without score calibration:
  * each list contributes `1/(c + rank)` and candidates sort by the
  * sum.
  *
  * Spark-first shape: the input rankings are already top-k relations
  * (at most k rows per query each), so everything here is
  * query-output-sized — a union, one map-side-combinable aggregation,
  * and a per-query WindowGroupLimit ranking. Corpus scale lives
  * entirely in the upstream [[Bm25.topK]] / ANN stages; fusion adds no
  * corpus-sized work at any scale.
  *
  * Engine-exactness: contributions are nano-unit BIGINTs
  * (`round(1e9/(c + rank))` — one IEEE division + round, identical in
  * DuckDB), summed exactly; ties break by doc id. */
object Fusion {

  /** Fuse rankings shaped `(query_id, doc_id, rank)` (rank 1-based)
    * into `(query_id, doc_id, rrf_score, n_lists, rank)`: nano-unit
    * reciprocal-rank sum, how many input lists surfaced the doc, and
    * the fused 1-based rank (top `k` per query, ties by doc_id asc).
    * A doc appearing in several lists accumulates several
    * contributions — RRF's consensus signal. */
  def reciprocalRankFusion(rankings: Seq[DataFrame], k: Int,
                           c: Int = 60): DataFrame = {
    require(rankings.nonEmpty && k > 0 && c >= 0)
    val contribs = rankings.map(_.select(col("query_id"), col("doc_id"),
      round(lit(1e9) / (lit(c.toDouble) + col("rank").cast("double")))
        .cast("long").as("__c")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
    contribs.reduce(_ unionByName _)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__c")).as("rrf_score"),
        count(lit(1)).as("n_lists"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rrf_score"),
        col("n_lists"), col("rank"))
  }
}
