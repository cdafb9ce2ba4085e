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

  /** Replay-idempotent batch append of a term-frequency sketch index:
    * the batch's `(row, bucket, n)` cells land in a batch-addressed
    * subdirectory (`path/batch=<id>`) with OVERWRITE, so a foreachBatch
    * re-delivery REPLACES the cells instead of doubling them — the
    * ingest doc-store durability posture ([[Hdr.writeHistogramBatch]]).
    * Cells are mergeable by sum, so [[readSketch]] is exact over any
    * batching. */
  def writeSketchBatch(df: DataFrame, textCol: String, path: String,
                       batchId: Long, depth: Int = 4, width: Int = 2048,
                       salt: String = "graft-cms"): Unit =
    buildSketch(df, textCol, depth, width, salt)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/batch=$batchId")

  /** The merged sketch of every batch appended to `path`: cell-wise sum
    * over sketch-sized data only (at most depth x width rows per
    * batch). */
  def readSketch(spark: org.apache.spark.sql.SparkSession,
                 path: String): DataFrame =
    merge(spark.read.parquet(path).select("row", "bucket", "n"))
}

/** HDR-histogram-style quantile sketch (Tene's HdrHistogram /
  * power-of-two DDSketch family): log-spaced buckets with `2^sbBits`
  * linear sub-buckets per octave, giving a `2^-sbBits` relative-error
  * bound on every quantile of a non-negative integer distribution with
  * a histogram of at most `~(64 - sbBits) * 2^sbBits` rows — the
  * mergeable distribution summary a 100 TB profiling pass keeps where
  * exact quantiles would need a global sort.
  *
  * Spark-first shape: the sketch IS a `(strata..., bucket, n)` relation
  * built by one map-side-combinable aggregation; merging shards/batches
  * is union + sum (associative, commutative — the CMS posture); the
  * quantile walk is a window over the sketch-sized relation, never over
  * the data.
  *
  * Engine-exactness: DETERMINISTIC, unlike KLL/t-digest — bucketing is
  * pure integer arithmetic (`floor(log2 v)` via the length of the
  * binary string, variable shifts, no floating point anywhere), and the
  * quantile crossing is the integer-mass comparison
  * `cum*1000 >= total*q_permille`, so the DuckDB oracle
  * (txt_len_quantiles) replays every bucket, bound, and crossing
  * bit-for-bit. */
object Hdr {

  private def pow2(k: Int): Long = 1L << k

  /** Bucket index of non-negative `v`: identity below `2^sbBits`
    * (exact), then octave `e = floor(log2 v)` keeps its top `sbBits`
    * fractional bits — `((e-b+1) << b) + ((v >> (e-b)) - 2^b)`. The two
    * regions meet continuously at `v = 2^b` and the index is monotone
    * in `v`. */
  def bucketize(v: Column, sbBits: Int): Column = {
    val b = sbBits
    val vv = greatest(v.cast("long"), lit(0L))
    val e = (length(bin(vv)) - 1).cast("int")
    val shifted = call_function("shiftrightunsigned", vv, e - lit(b))
    when(vv < pow2(b), vv).otherwise(
      shiftleft((e - lit(b) + 1).cast("long"), b) + shifted - lit(pow2(b)))
  }

  /** Inclusive lower bound of bucket `k` — the deterministic quantile
    * report value (true quantile lies in `[lo, lo + width)`). */
  def bucketLo(k: Column, sbBits: Int): Column = {
    val b = sbBits
    val g = call_function("shiftrightunsigned", k, lit(b))
    val sub = k.bitwiseAND(lit(pow2(b) - 1))
    when(k < pow2(b), k).otherwise(
      call_function("shiftleft", lit(1L), (g + lit(b) - 1).cast("int"))
        + call_function("shiftleft", sub, (g - 1).cast("int")))
  }

  /** Width of bucket `k`: 1 in the linear region, `2^(e-b)` in octave
    * `e` — so `width/lo <= 2^-sbBits` everywhere. */
  def bucketWidth(k: Column, sbBits: Int): Column =
    when(k < pow2(sbBits), lit(1L)).otherwise(
      call_function("shiftleft", lit(1L),
        (call_function("shiftrightunsigned", k, lit(sbBits)) - 1).cast("int")))

  /** Build the per-stratum histogram `(strata..., bucket, n)`: one
    * pass, one map-side-combinable aggregation, output bounded by
    * |strata| x buckets-per-sketch regardless of input size. */
  def buildHistogram(df: DataFrame, valueCol: String,
                     strata: Seq[String] = Nil,
                     sbBits: Int = 7): DataFrame = {
    require(sbBits >= 1 && sbBits <= 16)
    val keys = strata.map(col) :+ bucketize(col(valueCol), sbBits).as("bucket")
    df.groupBy(keys: _*).agg(count(lit(1)).as("n"))
  }

  /** Merge histograms built with identical (strata, sbBits): bucket-wise
    * sum. Associative + commutative — batch/shard/stream partials
    * combine in any order. */
  def merge(strata: Seq[String], hists: DataFrame*): DataFrame = {
    require(hists.nonEmpty)
    hists.reduce(_ unionByName _)
      .groupBy((strata :+ "bucket").map(col): _*)
      .agg(sum(col("n")).as("n"))
  }

  /** Replay-idempotent batch append of a per-stratum histogram index:
    * the batch's `(strata..., bucket, n)` rows land in a
    * batch-addressed subdirectory (`path/batch=<id>`) with OVERWRITE,
    * so a foreachBatch re-delivery REPLACES the rows instead of
    * doubling them — the ingest doc-store durability posture. Bucket
    * counts are mergeable by sum, so [[readHistogram]] is exact over
    * any batching. */
  def writeHistogramBatch(df: DataFrame, valueCol: String,
                          strata: Seq[String], path: String, batchId: Long,
                          sbBits: Int = 7): Unit =
    buildHistogram(df, valueCol, strata, sbBits)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/batch=$batchId")

  /** The merged histogram of every batch appended to `path`: bucket-wise
    * sum over index-sized data only. */
  def readHistogram(spark: org.apache.spark.sql.SparkSession, path: String,
                    strata: Seq[String]): DataFrame =
    merge(strata, spark.read.parquet(path)
      .select((strata :+ "bucket" :+ "n").map(col): _*))

  /** Per-stratum quantiles at the given permille points (e.g. 500 =
    * median, 990 = p99): `(strata..., q_permille, lo, width, cum_n,
    * total_n)` where `lo <= Q_q < lo + width`. The crossing bucket is
    * the first with `cum*1000 >= total*q` — integer mass comparison,
    * no division, replayed exactly by the oracle. Windows run over the
    * sketch-sized histogram, not the data. */
  def quantiles(hist: DataFrame, strata: Seq[String],
                qPermille: Seq[Int], sbBits: Int = 7): DataFrame = {
    require(qPermille.nonEmpty && qPermille.forall(q => q > 0 && q <= 1000))
    import org.apache.spark.sql.expressions.Window
    val part = if (strata.isEmpty) Window.partitionBy(lit(1))
               else Window.partitionBy(strata.map(col): _*)
    val cum = hist
      .withColumn("cum_n", sum(col("n")).over(part.orderBy(col("bucket"))))
      .withColumn("total_n", sum(col("n")).over(part))
    cum.select((strata.map(col) ++ Seq(col("bucket"), col("n"),
        col("cum_n"), col("total_n"),
        explode(array(qPermille.map(q => lit(q.toLong)): _*))
          .as("q_permille"))): _*)
      .filter(col("cum_n") * 1000 >= col("total_n") * col("q_permille") &&
        (col("cum_n") - col("n")) * 1000 <
          col("total_n") * col("q_permille"))
      .select((strata.map(col) ++ Seq(col("q_permille"),
        bucketLo(col("bucket"), sbBits).as("lo"),
        bucketWidth(col("bucket"), sbBits).as("width"),
        col("cum_n"), col("total_n"))): _*)
  }
}
