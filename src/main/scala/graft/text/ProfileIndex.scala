package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental, mergeable corpus-profile index.
  *
  * The monitoring primitive behind a long-running ingest pipeline: keep
  * per-stratum corpus statistics — document counts, size moments, and
  * DISTINCT counts (vocabulary size, exact-distinct document count) —
  * continuously up to date while data arrives in batches, WITHOUT ever
  * rescanning the corpus. Counts and extrema are trivially mergeable;
  * the distinct counts are the hard part, solved with HyperLogLog
  * sketches (Spark's native datasketches `hll_sketch_agg` /
  * `hll_union_agg` aggregates): per-batch sketches persisted to
  * parquet merge into a sketch of the union whose estimate tracks the
  * one-shot scan within the sketch's error envelope. NOT bit-identical
  * — DataSketches HLL does not guarantee that a union of partial
  * sketches and a directly-built sketch agree on the estimate (sparse/
  * dense mode transitions, and union switches the estimator from HIP
  * to the composite estimate), and at some corpus scales they visibly
  * diverge by a fraction of a percent. The contract is therefore:
  * exact columns (counts/sums/extrema) merge EXACTLY; the two
  * estimates land within a stated relative tolerance of the one-shot
  * profile (verified by the `txt_profile_incr` gate and
  * ProfileIndexSpec).
  *
  * Scale shape: each append aggregates only the batch (two hash
  * aggregations, both map-side combinable: one per-doc for counts and
  * moments, one per-token for the vocabulary sketch, joined on the
  * stratum key which is dimension-sized), then appends ONE ROW PER
  * STRATUM (~KB: two HLL blobs of `2^lgK` bytes + six longs) to the
  * index. Reading the profile scans only the index — `appends ×
  * strata` rows, never the corpus. At 100 TB the corpus is touched
  * exactly once, by the append that ingested each batch.
  *
  * Companion of the incremental minhash index (`Dedup.writeMinhashIndex`
  * family, content near-dup state) and the bloom membership index
  * (`Bloom`, exact-dup state) — this is the statistics member of the
  * persisted-ingest-state trio.
  *
  * Reference corpus-statistics surface: bioframe has no corpus ops; the
  * profile columns mirror `Corpus.profile` (this repo) and the standard
  * training-data curation reports (per-source doc/token counts, vocab
  * growth, dedup-rate tracking via distinct-doc estimates).
  */
object ProfileIndex {

  /** Per-stratum mergeable state of ONE increment: counts/moments plus
    * HLL sketches. Output columns: `stratum`, `n_docs`, `n_chars`,
    * `n_tokens`, `tok_min`, `tok_max`, `vocab_hll`, `docs_hll`.
    *
    * A null text counts as a document with 0 chars / 0 tokens (kept —
    * ingest accounting must not lose rows), contributes nothing to
    * either sketch.
    *
    * `lgK` is the HLL precision (2^lgK byte registers; 12 → 4 KB
    * sketches, ~1.6% relative error). All appends to one index must use
    * the same `lgK` — the merge requires equal register arrays.
    */
  def profileState(df: DataFrame, strataCol: String, textCol: String,
                   lgK: Int = 12): DataFrame = {
    val text = col(textCol)
    val perDoc = df.select(
      col(strataCol).as("stratum"),
      text.as("__text"),
      coalesce(length(text).cast("long"), lit(0L)).as("__nc"),
      when(text.isNull, lit(0L))
        .otherwise(size(TextOps.tokens(text)).cast("long")).as("__nt"))
    val docAgg = perDoc.groupBy(col("stratum")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("__nc")).as("n_chars"),
      sum(col("__nt")).as("n_tokens"),
      min(col("__nt")).as("tok_min"),
      max(col("__nt")).as("tok_max"),
      hll_sketch_agg(when(col("__text").isNotNull, xxhash64(col("__text"))),
        lit(lgK)).as("docs_hll"))
    val vocabAgg = perDoc
      .select(col("stratum"), explode(TextOps.tokens(col("__text"))).as("__term"))
      .groupBy(col("stratum"))
      .agg(hll_sketch_agg(col("__term"), lit(lgK)).as("vocab_hll"))
    // stratum is dimension-sized on both sides: broadcast, no shuffle of
    // either aggregate's output. Left join: a stratum whose every doc is
    // null-text has no token rows — its vocab sketch is absent (merged
    // as empty downstream).
    docAgg.join(broadcast(vocabAgg), Seq("stratum"), "left")
      .select(col("stratum"), col("n_docs"), col("n_chars"),
        col("n_tokens"), col("tok_min"), col("tok_max"),
        col("vocab_hll"), col("docs_hll"))
  }

  /** Create (overwrite) a profile index at `path` from an initial
    * corpus increment. */
  def writeProfileIndex(df: DataFrame, strataCol: String, textCol: String,
                        path: String, lgK: Int = 12): Unit =
    profileState(df, strataCol, textCol, lgK)
      .coalesce(1).write.mode("overwrite").parquet(path)

  /** Append one ingest batch's state to an existing index. Parquet
    * APPEND of stratum-count rows — the corpus itself is read once,
    * here, and never again. NOT replay-idempotent: a re-delivered batch
    * re-appends its stratum rows. Streaming callers should use
    * [[writeProfileBatch]] instead. */
  def appendProfileIndex(df: DataFrame, strataCol: String, textCol: String,
                         path: String, lgK: Int = 12): Unit =
    profileState(df, strataCol, textCol, lgK)
      .coalesce(1).write.mode("append").parquet(path)

  /** Replay-idempotent batch append: the batch's stratum rows land in a
    * batch-addressed subdirectory (`path/batch=<id>`) with OVERWRITE, so
    * a foreachBatch re-delivery REPLACES the rows instead of doubling
    * them — the same durability posture as the ingest doc store. Don't
    * mix with the flat [[appendProfileIndex]] layout in one index
    * (partition discovery rejects mixed flat/partitioned dirs);
    * [[readProfile]] reads either layout. */
  def writeProfileBatch(df: DataFrame, strataCol: String, textCol: String,
                        path: String, batchId: Long, lgK: Int = 12): Unit =
    profileState(df, strataCol, textCol, lgK)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/batch=$batchId")

  /** Merge a relation of [[profileState]] rows (any number of
    * increments) into the final per-stratum profile. Runs over
    * index-sized data only. Estimates are rounded to BIGINT (the
    * integer part of the HLL estimator). Deterministic for a FIXED
    * batching of the data, but different batchings may round-trip the
    * sketch through different estimator modes — compare estimates
    * across batchings with a tolerance, never for equality. */
  def mergeStates(states: DataFrame): DataFrame =
    states.groupBy(col("stratum")).agg(
      sum(col("n_docs")).as("n_docs"),
      sum(col("n_chars")).as("n_chars"),
      sum(col("n_tokens")).as("n_tokens"),
      min(col("tok_min")).as("tok_min"),
      max(col("tok_max")).as("tok_max"),
      floor(hll_sketch_estimate(hll_union_agg(col("vocab_hll"), lit(false))))
        .cast("long").as("vocab_est"),
      floor(hll_sketch_estimate(hll_union_agg(col("docs_hll"), lit(false))))
        .cast("long").as("docs_est"))

  /** The merged profile of everything appended to `path` so far. */
  def readProfile(spark: SparkSession, path: String): DataFrame =
    mergeStates(spark.read.parquet(path))

  /** One-shot profile of a corpus (no persistence) — what an index
    * built from ANY batching of the same rows merges to: exact columns
    * equal, estimates within the sketch tolerance (see the class doc).
    * The `txt_profile_incr` gate holds the incremental path to this. */
  def profileOneShot(df: DataFrame, strataCol: String, textCol: String,
                     lgK: Int = 12): DataFrame =
    mergeStates(profileState(df, strataCol, textCol, lgK))
}
