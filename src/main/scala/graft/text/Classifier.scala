package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Trainable document-quality classifier: hashed bag-of-words logistic
  * regression, trained by driver-coordinated distributed gradient
  * descent and scored by pure relational arithmetic.
  *
  * The standard pretraining-corpus recipe (a fastText/CCNet-style linear
  * model over token features, used to rank crawl documents against a
  * high-quality seed set) re-expressed Spark-first:
  *
  *   - FEATURES ([[featurizeHashed]]): tokens hashed into `[0, D)` with
  *     the engine-portable md5 bucket ([[Corpus.hashBucket]]) — NOT a
  *     JVM-private hash — so the featurization itself is reproducible by
  *     any engine (the `txt_feat_hash` gate re-derives it in DuckDB) and
  *     a model survives being scored outside Spark.
  *   - TRAINING ([[trainLogReg]]): full-batch gradient descent where the
  *     MODEL lives on the driver (a `D`-sized double array — dimension-
  *     sized by construction) and the DATA never moves: the feature
  *     relation is hash-partitioned by document once and cached; each
  *     iteration computes per-document margins with a broadcast of the
  *     current weights (exchange-free aggregation on the cached
  *     partitioning) and reduces the `D`-sized gradient with a map-side-
  *     combined aggregation whose shuffle carries at most
  *     `partitions x D` partial sums — per-iteration network cost is
  *     independent of corpus size.
  *   - SCORING ([[scoreTrained]]): broadcast-join the weights, sum, and
  *     sigmoid — codegen'd column arithmetic, no model object and no UDF
  *     at inference, so scoring 100 TB is an ordinary aggregation query.
  *
  * Float caveat, stated plainly: gradient sums reduce in shuffle order,
  * so trained coefficients are deterministic only up to float summation
  * order — specs assert planted-signal recovery and margin separation,
  * not bitwise weights, and the driver gate covers the (exactly
  * reproducible) featurization instead.
  */
object Classifier {

  /** `(idCol, feature, tf)` — md5-hashed token counts in `[0, D)`.
    * Multiple terms colliding into one bucket sum their counts (the
    * standard hashing-trick semantic). */
  def featurizeHashed(df: DataFrame, idCol: String, textCol: String,
                      numFeatures: Int = 512,
                      salt: String = "graft-feat"): DataFrame = {
    require(numFeatures > 0, s"numFeatures=$numFeatures")
    df.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("__term"))
      .select(col(idCol),
        pmod(Corpus.hashBucket(col("__term"), salt),
          lit(numFeatures.toLong)).as("feature"))
      .groupBy(col(idCol), col("feature"))
      .agg(count(lit(1)).cast(LongType).as("tf"))
  }

  /** A trained linear model: `weights(d)` for feature `d`, plus the
    * intercept and the per-iteration mean log-loss trace (driver-side
    * diagnostics — length `iters`). */
  final case class LinearModel(weights: Array[Double], intercept: Double,
                               loss: Array[Double])

  /** Full-batch logistic-regression GD over a hashed feature relation.
    *
    * `feats` is [[featurizeHashed]] output (or any `(id, feature, tf)`
    * relation with `feature` in `[0, numFeatures)`); `labels` is
    * `(id, label)` with label in {0, 1}. Documents without features
    * still train the intercept (they enter through the label join with
    * an empty dot product). `l2` regularizes weights, not the
    * intercept; `lr` is the step size.
    *
    * Scale shape per iteration: one job — margins from the CACHED
    * doc-partitioned relation (no exchange: the cache partitioning
    * satisfies the groupBy), residuals joined back on the same
    * partitioning, then a `D`-bounded gradient reduce. The driver holds
    * and updates only the `D+1` model floats. For stochastic variants,
    * pre-sample with [[Corpus.sampleByHash]] per epoch salt — the
    * estimator stays deterministic-by-content rather than RNG-stateful. */
  def trainLogReg(feats: DataFrame, labels: DataFrame, idCol: String,
                  numFeatures: Int, iters: Int = 30, lr: Double = 0.5,
                  l2: Double = 0.0): LinearModel = {
    require(iters >= 1 && numFeatures > 0)
    val spark = feats.sparkSession
    val id = col(idCol)
    // one materialization, hash-partitioned by document: every
    // per-iteration doc-keyed aggregation and the residual join-back
    // reuse this single exchange for the whole training run
    val tfl = feats.select(id, col("feature").cast(LongType),
        col("tf").cast("double").as("tf"))
      .join(labels.select(id, col("label").cast("double").as("label")),
        Seq(idCol))
      .repartition(graft.core.Par.width(feats), id)
      .persist()
    // bounded label statistics, computed once: docs with NO feature rows
    // (empty text) never enter tfl but still train the intercept
    val la = labels.agg(count(lit(1)).cast("double"),
      coalesce(sum(col("label").cast("double")), lit(0.0))).head()
    val (nAll, sumY) = (la.getDouble(0), la.getDouble(1))
    val fa = tfl.groupBy(id).agg(first(col("label")).as("y"))
      .agg(count(lit(1)).cast("double"),
        coalesce(sum(col("y")), lit(0.0))).head()
    val nNoFeat = nAll - fa.getDouble(0)
    val sumYNoFeat = sumY - fa.getDouble(1)

    val w = new Array[Double](numFeatures)
    var b = 0.0
    val lossTrace = new Array[Double](iters)
    try {
      var it = 0
      while (it < iters) {
        val p0 = 1.0 / (1.0 + math.exp(-b))
        // per-doc probability + residual over the cached partitioning
        // (no exchange: groupBy key == cache partitioning key)
        val dots = withWeight(tfl, w, "__w")
          .withColumn("__wx", col("tf") * col("__w"))
          .groupBy(id)
          .agg(sum(col("__wx")).as("__dot"), first(col("label")).as("__y"))
          .withColumn("__p",
            lit(1.0) / (lit(1.0) + exp(-(col("__dot") + lit(b)))))
          .withColumn("__r", col("__p") - col("__y"))
          .persist()
        // D-bounded gradient reduce: the shuffle carries at most
        // partitions x D partial sums — independent of corpus size
        val gRows = tfl.join(dots.select(id, col("__r")), Seq(idCol))
          .groupBy(col("feature"))
          .agg(sum(col("tf") * col("__r")).as("g"))
          .collect()
        val sRow = dots.agg(
          coalesce(sum(
            when(col("__y") > 0.5, -log(greatest(col("__p"), lit(1e-12))))
              .otherwise(-log(greatest(lit(1.0) - col("__p"), lit(1e-12))))),
            lit(0.0)),
          coalesce(sum(col("__r")), lit(0.0))).head()
        dots.unpersist(false)
        val lossNoFeat =
          if (nNoFeat > 0)
            -(sumYNoFeat * math.log(math.max(p0, 1e-12)) +
              (nNoFeat - sumYNoFeat) * math.log(math.max(1.0 - p0, 1e-12)))
          else 0.0
        lossTrace(it) = (sRow.getDouble(0) + lossNoFeat) / math.max(nAll, 1.0)
        val gb = sRow.getDouble(1) + nNoFeat * p0 - sumYNoFeat
        gRows.foreach { r =>
          val d = r.getLong(0).toInt
          w(d) -= lr * (r.getDouble(1) / nAll + l2 * w(d))
        }
        b -= lr * gb / math.max(nAll, 1.0)
        it += 1
      }
    } finally { tfl.unpersist(false); () }
    LinearModel(w, b, lossTrace)
  }

  /** Above this dimensionality the weight vector stops riding the plan
    * as a literal array and becomes a broadcast join instead: a
    * fastText-scale D (millions of buckets) embedded as a `typedlit`
    * re-serializes megabytes of plan every iteration and bloats every
    * task binary, while a broadcast dimension ships once per stage.
    * 64k doubles = 512 KB of plan literal — the stated boundary, same
    * posture as the Bloom probe cascade's blob-size threshold. */
  val maxLiteralWeights: Int = 65536

  /** Attach the model weight of each row's `feature` as column `out`.
    * Small D: `element_at` over a literal array (constant-folded into
    * the plan, whole-stage-codegen'd — 1-based element_at, 0-based
    * feature). Large D (> [[maxLiteralWeights]]): broadcast-join a
    * (feature, weight) dimension built from the NONZERO weights only
    * (absent feature → 0.0 via the left join's coalesce), so the plan
    * carries a broadcast reference, never the array. */
  private def withWeight(df: DataFrame, w: Array[Double],
                         out: String): DataFrame =
    if (w.length <= maxLiteralWeights)
      df.withColumn(out,
        element_at(typedlit(w.toSeq), (col("feature") + 1).cast("int")))
    else {
      val s = df.sparkSession
      import s.implicits._
      val nz = w.iterator.zipWithIndex
        .collect { case (v, i) if v != 0.0 => (i.toLong, v) }.toSeq
      df.join(broadcast(nz.toDF("feature", "__nzw")), Seq("feature"), "left")
        .withColumn(out, coalesce(col("__nzw"), lit(0.0)))
        .drop("__nzw")
    }

  /** Exact AUC (Mann-Whitney with tie-averaged ranks) of a score column
    * against a {0,1} label — the classifier-eval primitive, shaped for
    * scale: the corpus reduces FIRST to one row per distinct score
    * value (count + positive count), and only that bounded relation
    * flows through the ordered cumulative window.
    *
    * The window is GLOBAL and single-partition by construction, so its
    * input cardinality (distinct scores) must be bounded — integer
    * margins ([[Corpus.scoreLinear]]) are. A float/double score column
    * at corpus scale has ~N distinct values and would funnel the corpus
    * through one task, so it is REJECTED unless `quantize` supplies the
    * bounding expression (e.g. `round(col("prob") * 1e6).cast("long")`)
    * — enforced here in code, not prose: AUC over the quantized score
    * is both bounded AND engine-exact.
    *
    * All rank arithmetic stays in exact longs (half-rank trick:
    * `2*rank` is always integral under tie averaging); the single IEEE
    * division at the end is reproducible bit-for-bit by the DuckDB
    * oracle (txt_auc gate). Returns one row:
    * `(n_pos, n_neg, auc)` — `auc` null when either class is absent. */
  def evalAuc(df: DataFrame, labelCol: String, scoreCol: String,
              quantize: Option[org.apache.spark.sql.Column] = None)
      : DataFrame = {
    val scoreExpr = quantize.getOrElse {
      val dt = df.schema(scoreCol).dataType
      require(!dt.isInstanceOf[org.apache.spark.sql.types.FloatType] &&
        !dt.isInstanceOf[org.apache.spark.sql.types.DoubleType],
        s"evalAuc: score column '$scoreCol' is $dt — a continuous score " +
        "has unbounded distinct values and the global rank window would " +
        "funnel the corpus through one task. Pass quantize = " +
        "Some(round(col(\"" + scoreCol + "\") * 1e6).cast(\"long\")) " +
        "(or any bounding expression) to make the window input bounded.")
      col(scoreCol)
    }
    val byScore = df.groupBy(scoreExpr.as("__s"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col(labelCol) > lit(0.5), 1L).otherwise(0L)).as("__np"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    val ranked = byScore
      .withColumn("__before", coalesce(sum(col("__n")).over(w), lit(0L)))
      // 2 * (average rank of this score's tie group), exactly integral
      .withColumn("__r2", lit(2L) * col("__before") + col("__n") + lit(1L))
    ranked.agg(
        sum(col("__np")).as("__P"),
        sum(col("__n") - col("__np")).as("__N"),
        sum(col("__np") * col("__r2")).as("__sum2"))
      .select(col("__P").as("n_pos"), col("__N").as("n_neg"),
        when(col("__P") > 0 && col("__N") > 0,
          (col("__sum2") - col("__P") * (col("__P") + 1))
            .cast("double") / (lit(2.0) * col("__P") * col("__N")))
          .as("auc"))
  }

  /** Relational inference: `(id, margin, prob, keep)` from a trained
    * model — broadcast-literal weights, codegen'd arithmetic, no UDF.
    * Documents with no features score `sigmoid(intercept)`. */
  def scoreTrained(feats: DataFrame, allIds: DataFrame, idCol: String,
                   model: LinearModel, threshold: Double = 0.5): DataFrame = {
    val id = col(idCol)
    val dots = withWeight(feats, model.weights, "__w")
      .withColumn("__wx", col("tf").cast("double") * col("__w"))
      .groupBy(id).agg(sum(col("__wx")).as("__dot"))
    allIds.select(id).join(dots, Seq(idCol), "left")
      .select(id,
        (coalesce(col("__dot"), lit(0.0)) + lit(model.intercept))
          .as("margin"))
      .withColumn("prob", lit(1.0) / (lit(1.0) + exp(-col("margin"))))
      .withColumn("keep", col("prob") >= lit(threshold))
  }
}
