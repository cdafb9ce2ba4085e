package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min Sketch term-frequency index (Cormode & Muthukrishnan 2005,
  * "An improved data stream summary: the count-min sketch and its
  * applications") — the mergeable frequency summary a 100 TB ingest
  * keeps where an exact term-count table would be vocabulary-sized.
  *
  * Spark-first shape: the sketch IS a relation, `(row, bucket, n)` with
  * at most depth x width rows — built by ONE map-side-combinable
  * aggregation over the token stream (each token contributes `depth`
  * (row, bucket) cells via posexplode of its hash array; partial
  * aggregation collapses per-task before the exchange, so the shuffle
  * carries at most depth x width rows per task regardless of corpus
  * size). Estimation broadcast-joins the dimension-sized sketch to the
  * probe terms. Merging two sketches is a union + sum — associative,
  * commutative, replay-friendly: exactly the shape the streaming
  * ingest's persisted-index quartet wants.
  *
  * Engine-exactness: hashes are [[Corpus.hashBucket]] md5 buckets
  * (row i salts with `salt-i`), counters are exact BIGINTs, the
  * estimate is an integer `min` — every cell and every estimate is
  * bit-replayable by the DuckDB oracle (txt_cms gate). The classic CMS
  * guarantee holds: `est >= true`, `est <= true + eps*N` w.h.p.
  */
object Cms {

  /** Per-token sketch cells `(row, bucket)` for rows `0..depth-1`. */
  private def cells(term: Column, depth: Int, width: Int,
                    salt: String): Column =
    array((0 until depth).map(i =>
      pmod(Corpus.hashBucket(term, s"$salt-$i"), lit(width.toLong))): _*)

  /** Build the sketch relation `(row, bucket, n)` from a token stream:
    * one pass, one map-side-combinable aggregation; output is bounded
    * by depth x width cells, independent of corpus size. */
  def buildSketch(df: DataFrame, textCol: String,
                  depth: Int = 4, width: Int = 2048,
                  salt: String = "graft-cms"): DataFrame = {
    require(depth > 0 && width > 0)
    df.select(explode(TextOps.tokens(col(textCol))).as("__t"))
      .select(posexplode(cells(col("__t"), depth, width, salt)))
      .groupBy(col("pos").as("row"), col("col").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("row").cast("int"), col("bucket"), col("n"))
  }

  /** Merge sketches built with identical (depth, width, salt):
    * cell-wise sum. Associative + commutative, so partial sketches from
    * batches/shards/streams combine in any order. */
  def merge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty)
    sketches.reduce(_ unionByName _)
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("n")).as("n"))
  }

  /** Point-estimate the frequency of each probe term:
    * `(term, est)` where `est = min over rows of counter[row][h_row
    * (term)]` (0 for never-touched cells). The sketch side is
    * dimension-sized and broadcast; nothing probe-sized shuffles. */
  def estimate(sketch: DataFrame, probes: DataFrame, termCol: String,
               depth: Int = 4, width: Int = 2048,
               salt: String = "graft-cms"): DataFrame = {
    probes.select(col(termCol).as("term"))
      .select(col("term"),
        posexplode(cells(col("term"), depth, width, salt)))
      .join(broadcast(sketch),
        col("pos") === col("row") && col("col") === col("bucket"),
        "left")
      .groupBy(col("term"))
      .agg(min(coalesce(col("n"), lit(0L))).as("est"))
  }

  /** Heavy hitters among the probe terms: estimates >= threshold, with
    * the CMS over-count audit column (`est` never under-counts, so no
    * true heavy hitter is lost; false admissions are bounded by the
    * sketch's eps*N collision mass and resolved by the exact join the
    * caller runs on the surviving — small — candidate set). */
  def heavyHitters(sketch: DataFrame, probes: DataFrame, termCol: String,
                   threshold: Long, depth: Int = 4, width: Int = 2048,
                   salt: String = "graft-cms"): DataFrame =
    estimate(sketch, probes, termCol, depth, width, salt)
      .filter(col("est") >= threshold)
}
