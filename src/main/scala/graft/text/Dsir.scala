package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"; the
  * public recipe behind targeting a raw crawl at a high-quality
  * reference corpus): fit two hashed-n-gram multinomial bucket models
  * (target and raw), weight every raw document by its log importance
  * ratio, keep the heaviest.
  *
  * Spark-first shape: both corpora reduce to DIMENSION-sized bucket
  * count vectors (one map-side-combinable aggregation each, D rows);
  * the per-bucket log ratio joins back to the raw corpus's feature
  * relation as a broadcast, and the per-document weight is one more
  * map-side-combinable sum — nothing corpus-sized ever shuffles except
  * the (doc, bucket) feature rows. At 100 TB: three text passes total
  * (target once for its bucket counts; raw once for its counts and
  * once for scoring), all map-side-combinable aggregations, no
  * corpus-sized windows, no driver-side actions inside the plan (the
  * smoothing totals come from an unpartitioned window over the
  * D-row bucket relation, not a collect).
  *
  * Engine-exactness (the txt_dsir gate): features use the md5 bucket
  * ([[Corpus.hashBucket]] — reproducible outside Spark), the per-bucket
  * log ratio is quantized ONCE per bucket to micro-units (D
  * transcendental evaluations, fixed operand order), and each
  * document's weight is the exact BIGINT sum of `count x micro-ratio` —
  * so DuckDB replays scores bit-for-bit and summation order is
  * irrelevant.
  */
object Dsir {

  /** Hashed unigram+bigram features: `(idCol, bucket, n)` — the DSIR
    * paper's hashed n-gram parameterization. Bigrams join adjacent
    * tokens with '_'; both gram orders share one bucket space. ONE text
    * scan: the bigram array concatenates onto the token array before
    * the single explode (a zero-length slice when the doc has < 2
    * tokens), so the corpus is read once per featurize call. */
  def featurize(df: DataFrame, idCol: String, textCol: String,
                numBuckets: Int = 4096,
                salt: String = "graft-dsir"): DataFrame = {
    require(numBuckets > 0)
    val toks = TextOps.tokens(col(textCol))
    val nBi = greatest(size(toks) - 1, lit(0))
    val bi = zip_with(slice(toks, lit(1), nBi), slice(toks, lit(2), nBi),
      (a, b) => concat(a, lit("_"), b))
    df.select(col(idCol), explode(concat(toks, bi)).as("__t"))
      .select(col(idCol),
        pmod(Corpus.hashBucket(col("__t"), salt), lit(numBuckets.toLong))
          .as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Per-bucket micro-unit log importance ratio — the broadcastable
    * model: `lr_u = round(ln(((ct+1) * (Tr+D)) / ((cr+1) * (Tt+D))) *
    * 1e6)` with add-1 smoothing, where ct/cr are the bucket's target/
    * raw feature counts and Tt/Tr the corpus totals. D rows. */
  def bucketLogRatios(rawFeats: DataFrame, targetFeats: DataFrame,
                      numBuckets: Int): DataFrame = {
    def counts(f: DataFrame, out: String) =
      f.groupBy(col("bucket")).agg(sum(col("n")).as(out))
    val ct = counts(targetFeats, "__ct")
    val cr = counts(rawFeats, "__cr")
    // corpus totals derive from the joined D-row bucket relation itself
    // (every feature lands in some bucket), via an unpartitioned window
    // over <= numBuckets rows — no driver action, so neither featurize
    // pass is recomputed just to read a scalar
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ct.join(cr, Seq("bucket"), "full_outer")
      .withColumn("__tt",
        (coalesce(sum(col("__ct")).over(all), lit(0L)) + numBuckets)
          .cast("double"))
      .withColumn("__tr",
        (coalesce(sum(col("__cr")).over(all), lit(0L)) + numBuckets)
          .cast("double"))
      .select(col("bucket"),
        round(log(
          (coalesce(col("__ct"), lit(0L)).cast("double") + lit(1.0))
            * col("__tr")
            / ((coalesce(col("__cr"), lit(0L)).cast("double") + lit(1.0))
              * col("__tt"))) * lit(1e6)).cast("long").as("lr_u"))
  }

  /** DSIR importance weight per raw document:
    * `(idCol, dsir_score, n_feat)` where `dsir_score` is the exact
    * BIGINT Σ n_bucket × lr_u(bucket) (higher = more target-like) and
    * `n_feat` the document's total feature count. Documents with no
    * features score 0 with n_feat 0 — kept, so selection policies see
    * every input row. Downstream selection composes relationally: rank,
    * threshold, or feed `dsir_score` to [[Corpus.sampleByHash]]-style
    * deterministic samplers. */
  def importanceWeights(raw: DataFrame, target: DataFrame,
                        idCol: String, textCol: String,
                        numBuckets: Int = 4096,
                        salt: String = "graft-dsir"): DataFrame = {
    val rf = featurize(raw, idCol, textCol, numBuckets, salt)
    val tf = featurize(target, idCol, textCol, numBuckets, salt)
    val lr = bucketLogRatios(rf, tf, numBuckets)
    val scored = rf.join(broadcast(lr), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("n") * col("lr_u")).as("__s"),
        sum(col("n")).as("__nf"))
    raw.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__s"), lit(0L)).as("dsir_score"),
        coalesce(col("__nf"), lit(0L)).as("n_feat"))
  }
}
