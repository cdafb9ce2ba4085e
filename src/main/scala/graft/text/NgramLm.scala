package graft.text

import graft.core.Par
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Count-based n-gram language model with Stupid Backoff scoring — the
  * perplexity-filtering signal every large-scale pretraining pipeline
  * runs (CCNet trains a 5-gram LM on a clean reference corpus and drops
  * the worst-perplexity tail; Gopher/MassiveText do the same with a
  * CommonCrawl-side model). Two halves:
  *
  *   - [[train]]: corpus -> pruned count tables for every order `1..n`,
  *     one relation `(order, key, count)` keyed by the md5 of the
  *     space-joined gram (fixed-width 32-char shuffle keys, never text —
  *     the [[Corpus.ngramNovelty]] convention). Persist it as parquet
  *     and the LM is a reusable artifact like the minhash/IVF indexes.
  *   - [[score]]: documents x LM -> per-token backoff level and Stupid
  *     Backoff log-score, aggregated per document.
  *
  * Stupid Backoff (Brants et al. 2007, "Large Language Models in
  * Machine Translation") is the count-ratio backoff built FOR
  * distributed count tables: `S(w | ctx) = count(ctx·w) / count(ctx)`
  * when the full gram was seen, else `alpha * S(w | shorter ctx)` —
  * no discounting or normalization state, so training is nothing but
  * counting, which is exactly what a 1000-executor groupBy does well.
  *
  * Scale shape, train: one per-doc window pass builds every order's
  * gram in a single projection (lag chains, codegen'd, no lambdas), one
  * hash exchange on the 32-char key with map-side partial counts, and a
  * `minCount` prune that bounds the table (orders >= 2; unigrams stay,
  * they define the vocabulary). Nothing corpus-sized ever sits on the
  * driver.
  *
  * Scale shape, score: positions explode to at most `n` `(key, order)`
  * probes each, ONE shuffle join against the count relation (unique
  * keys — no fan-out; AQE rebalances the stop-word-gram skew), then a
  * per-position pivot and a per-doc lag window recovers every
  * context count from the previous position's gram counts — the
  * context of the order-k gram ending at `p` IS the order-(k-1) gram
  * ending at `p-1`, so no second join is needed. State is bounded per
  * document; there is no corpus-wide window anywhere.
  *
  * Backoff-level bookkeeping is exact integer arithmetic (which gram
  * order matched, per token), so gates hash it; the log-score/ppl
  * doubles ride alongside for users but stay out of oracle hashes
  * (sum-of-ln is not IEEE-reproducible across engines).
  */
object NgramLm {

  /** Train order-`1..n` count tables over `df[textCol]`.
    * Output: `(order: int, key: string md5-of-gram, count: long)`,
    * orders >= 2 pruned to `count >= minCount` (count(ctx) >=
    * count(ctx·w) guarantees every surviving gram's backoff context
    * also survives, so [[score]] never divides by a missing context). */
  def train(df: DataFrame, idCol: String, textCol: String, n: Int = 3,
            minCount: Long = 2L): DataFrame = {
    require(n >= 1, s"n=$n")
    val pos = laggedRel(df, idCol, textCol, n)
    val grams = gramStructs(n)
    pos.select(explode(array(grams: _*)).as("__g"))
      .select(col("__g.order").as("order"), col("__g.key").as("key"))
      .filter(col("key").isNotNull)
      .groupBy(col("order"), col("key"))
      .agg(count(lit(1)).as("count"))
      .filter(col("order") === 1 || col("count") >= minCount)
  }

  /** Score `df[textCol]` against a trained count relation.
    *
    * Per document: `n_tok`, one `n_l{k}` column per order (tokens whose
    * LONGEST matched gram had order k), `n_oov` (token absent from the
    * training vocabulary), and the Stupid Backoff `logscore` /
    * `ppl = exp(-logscore / n_tok)`. A token at 0-based position `p`
    * can attempt at most `maxOrder = min(n, p+1)`; each backoff step
    * from there multiplies by `alpha`; an OOV token scores
    * `alpha^maxOrder / total_tokens` (a floor, not a probability — the
    * model is unnormalized by construction). Docs with no tokens have
    * no output row (the [[Corpus.ngramNovelty]] empty-doc contract). */
  def score(df: DataFrame, idCol: String, textCol: String, lm: DataFrame,
            n: Int = 3, alpha: Double = 0.4): DataFrame = {
    require(n >= 1, s"n=$n")
    val pos = laggedRel(df, idCol, textCol, n)
    val grams = gramStructs(n)
    // (id, p, order, count-of-gram-ending-at-p): one join, unique keys
    // on the build side (md5 of the space-joined gram is injective
    // across orders — tokens cannot contain spaces)
    val probed = pos
      .select(col("__id"), col("__p"), explode(array(grams: _*)).as("__g"))
      .select(col("__id"), col("__p"), col("__g.order").as("__k"),
        col("__g.key").as("key"))
      .filter(col("key").isNotNull)
      .join(lm.select(col("key"), col("count").as("__c")), Seq("key"), "left")
    // pivot counts per position, then pull each context count from the
    // previous position with a per-doc lag
    val cs = (1 to n).map(k =>
      max(when(col("__k") === k, col("__c"))).as(s"__c$k"))
    val perPos = probed.groupBy(col("__id"), col("__p"))
      .agg(cs.head, cs.tail: _*)
    val w = Window.partitionBy(col("__id")).orderBy(col("__p"))
    val ctx = (1 until n).map(k =>
      lag(col(s"__c$k"), 1).over(w).as(s"__x$k"))
    val total = lm.filter(col("order") === 1)
      .agg(sum(col("count")).as("__total"))
    val withCtx = perPos.select(
      (col("__id") +: col("__p") +:
        (1 to n).map(k => col(s"__c$k")) ++: ctx): _*)
      .crossJoin(broadcast(total))
    val maxOrder = least(lit(n), col("__p") + 1)
    // built innermost-out: the k=n test ends up OUTERMOST, so the
    // longest matched order wins
    val level = (1 to n).foldLeft(lit(0)) { (acc, k) =>
      when(col(s"__c$k").isNotNull, k).otherwise(acc)
    }
    // S(level k>1) = c_k / ctx_k; S(level 1) = c_1 / total; each step
    // down from maxOrder costs a factor alpha; OOV floors at 1/total
    // after maxOrder alpha-steps
    val base = (2 to n).foldLeft(
      when(col("__lvl") === 1,
        log(col("__c1").cast(DoubleType)) -
          log(col("__total").cast(DoubleType)))
        .otherwise(-log(col("__total").cast(DoubleType)))) { (acc, k) =>
      when(col("__lvl") === k,
        log(col(s"__c$k").cast(DoubleType)) -
          log(col(s"__x${k - 1}").cast(DoubleType))).otherwise(acc)
    }
    val scored = withCtx
      .withColumn("__lvl", level)
      .withColumn("__steps", maxOrder - col("__lvl"))
      .withColumn("__ls", base + col("__steps") * math.log(alpha))
    val lvlAggs = (1 to n).map(k =>
      sum(when(col("__lvl") === k, 1L).otherwise(0L)).as(s"n_l$k"))
    scored.groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tok"),
        (lvlAggs :+
          sum(when(col("__lvl") === 0, 1L).otherwise(0L)).as("n_oov") :+
          sum(col("__ls")).as("logscore")): _*)
      .withColumn("ppl",
        exp(-col("logscore") / col("n_tok").cast(DoubleType)))
      .withColumnRenamed("__id", idCol)
  }

  /** Train on a deterministic content-addressed `trainFraction` split
    * ([[Corpus.sampleByHash]] semantics — reproducible across engines
    * and runs) and score the held-out remainder: the one-call form of
    * CCNet-style perplexity filtering over a single corpus. */
  def trainScoreSplit(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, minCount: Long = 2L, alpha: Double = 0.4,
                      trainFraction: Double = 0.8,
                      salt: String = "lm"): DataFrame = {
    val bucket = Corpus.hashBucket(col(idCol), salt)
    val cut = (trainFraction * 4294967296.0).toLong
    val lm = train(df.filter(bucket < cut), idCol, textCol, n, minCount)
    score(df.filter(bucket >= cut), idCol, textCol, lm, n, alpha)
  }

  /** `(__id, __p, __t, __t1 .. __t{n-1})` token-position relation with
    * the previous `n-1` tokens materialized per position (lag columns
    * must be bound to real columns before any generator references
    * them — window expressions are illegal inside explode). Exchanged
    * on doc id FIRST so the tokenizing regex parallelizes past a
    * single scan split (the [[graft.dedup.Dedup.shingleRel]] lesson). */
  private def laggedRel(df: DataFrame, idCol: String, textCol: String,
                        n: Int): DataFrame = {
    val w = Window.partitionBy(col("__id")).orderBy(col("__p"))
    val pos = df.select(col(idCol).as("__id"), col(textCol).as("__text"))
      .repartition(Par.width(df), col("__id"))
      .select(col("__id"),
        posexplode(TextOps.tokens(col("__text"))).as(Seq("__p", "__t")))
    val lagCols = (1 until n).map(j =>
      lag(col("__t"), j).over(w).as(s"__t$j"))
    pos.select((col("__id") +: col("__p") +: col("__t") +: lagCols): _*)
  }

  /** One `(order, key)` struct per order `1..n` from a [[laggedRel]]
    * row: the order-k gram ends at this position and exists iff the
    * (k-1)-back token is non-null. */
  private def gramStructs(n: Int): Seq[Column] = {
    val toks: IndexedSeq[Column] =
      col("__t") +: (1 until n).map(j => col(s"__t$j"))
    (1 to n).map { k =>
      val parts = (k - 1 to 0 by -1).map(toks)
      struct(lit(k).as("order"),
        when(toks(k - 1).isNotNull,
          md5(concat_ws(" ", parts: _*).cast("binary"))).as("key"))
    }
  }
}
