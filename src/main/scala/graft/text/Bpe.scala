package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenizer training and application
  * (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
  * Words with Subword Units" — the standard LLM tokenizer-construction
  * recipe): start from characters + an end-of-word marker, repeatedly
  * merge the corpus-wide most frequent adjacent symbol pair.
  *
  * Spark-first shape: the corpus is read ONCE into a word-count
  * relation; every training iteration then runs over that
  * vocabulary-sized relation (pair explode → map-side-combinable
  * weighted count → a 1-row argmax collect, the Lloyd-iteration
  * posture), never over the corpus again. At 100 TB the corpus pass is
  * one token aggregation; iterations cost |vocab|, not |corpus|. The
  * symbol-merge fold is a higher-order `aggregate` expression —
  * interpreter-evaluated, which is fine on the dimension-sized vocab
  * relation (the same rationale as the Lloyd/PQ codebook steps; the
  * corpus-sized stages stay codegen'd).
  *
  * Engine-exactness: pair counts are exact BIGINT sums; the argmax
  * tiebreak is `(count DESC, left ASC, right ASC)` in binary string
  * order; the merge application is the greedy left-to-right
  * non-overlapping fold — each replayed identically by the DuckDB
  * oracle's generated per-iteration CTE chain (txt_bpe /
  * txt_bpe_apply). */
object Bpe {

  /** `</w>` — Sennrich's end-of-word marker: lets a merge learn that a
    * pair is word-final, and makes detokenization unambiguous. */
  val EndOfWord = "</w>"

  /** Characters of `word` plus the end-of-word marker. */
  def symbolize(word: Column): Column =
    concat(split(word, ""), array(lit(EndOfWord)))

  /** Greedy left-to-right non-overlapping application of ONE merge
    * `(a, b) -> m` to a symbol array: fold, merging when the
    * accumulated tail is exactly `a` and the next symbol is `b` (so
    * `aaaa` under `(a,a)` becomes `aa aa`, not `aa a a`). */
  def mergeOne(syms: Column, a: String, b: String, m: String): Column =
    aggregate(syms, lit(Array.empty[String]),
      (acc, s) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(m))))
          .otherwise(concat(acc, array(s))))

  /** Weighted adjacent-pair counts `(s1, s2, c)` of a symbolized
    * vocabulary relation `(word, n, syms)`. */
  private def pairCounts(ws: DataFrame): DataFrame = {
    val nP = greatest(size(col("syms")) - 1, lit(0))
    ws.select(col("n"),
        explode(zip_with(slice(col("syms"), lit(1), nP),
          slice(col("syms"), lit(2), nP),
          (a, b) => struct(a.as("s1"), b.as("s2")))).as("p"))
      .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
      .agg(sum(col("n")).as("c"))
  }

  /** The word-count relation `(word, n, syms)` a training run iterates
    * on — the single corpus pass. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .select(col("word"), col("n"), symbolize(col("word")).as("syms"))

  /** Train `numMerges` BPE merges:
    * `(rank, left, right, merged, pair_n)` with `rank` 1-based in merge
    * order. One Spark job per merge: the pair-count argmax over the
    * persisted child vocab is also what materializes it (the fold never
    * gets its own count() job), so the parent generation can only be
    * unpersisted AFTER that argmax — `prev` defers the drop by one
    * generation. The final merge skips the fold entirely (its output
    * vocabulary is never read). Stops early (fewer rows) if the
    * vocabulary runs out of pairs. */
  def train(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges > 0)
    val spark = df.sparkSession
    import spark.implicits._
    var ws = wordCounts(df, textCol).persist()
    var prev: DataFrame = null
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long)]
    try {
      var i = 0
      var exhausted = false
      while (i < numMerges && !exhausted) {
        val top = pairCounts(ws)
          .orderBy(col("c").desc, col("s1").asc, col("s2").asc)
          .limit(1).collect()
        // the argmax just materialized every partition of ws; its
        // parent generation is no longer reachable work
        if (prev != null) { prev.unpersist(); prev = null }
        if (top.isEmpty) exhausted = true
        else {
          val r = top.head
          val (a, b, c) = (r.getString(0), r.getString(1), r.getLong(2))
          merges += ((i + 1L, a, b, a + b, c))
          i += 1
          if (i < numMerges) {
            val next = ws.select(col("word"), col("n"),
              mergeOne(col("syms"), a, b, a + b).as("syms")).persist()
            prev = ws
            ws = next
          }
        }
      }
    } finally {
      ws.unpersist()
      if (prev != null) prev.unpersist()
    }
    merges.toSeq.toDF("rank", "left", "right", "merged", "pair_n")
  }

  /** Fold an ordered merge list over a vocabulary relation's `syms`
    * column, preserving every other column. Expression depth is
    * bounded by materializing the vocab every `checkpointEvery`
    * merges, so a real 30k-merge tokenizer plans as ~600 shallow
    * stages instead of one 30k-deep expression tree. */
  private def foldMerges(vocab0: DataFrame,
                         merges: Seq[(String, String, String)],
                         checkpointEvery: Int): DataFrame = {
    require(checkpointEvery > 0)
    val others = vocab0.columns.filterNot(_ == "syms").map(col).toSeq
    var vocab = vocab0
    val batches = merges.grouped(checkpointEvery).toSeq
    var prev: Option[DataFrame] = None
    batches.zipWithIndex.foreach { case (g, gi) =>
      val folded = g.foldLeft(col("syms")) { case (c, (a, b, m)) =>
        mergeOne(c, a, b, m)
      }
      vocab = vocab.select(others :+ folded.as("syms"): _*)
      if (gi < batches.size - 1) { // bound depth between batches
        vocab = vocab.persist()
        vocab.count() // materialize, then the previous block can go
        prev.foreach(_.unpersist())
        prev = Some(vocab)
      }
    }
    // the last persisted block stays cached: the returned (lazy) plan
    // reads it instead of re-deriving the full merge chain
    vocab
  }

  /** Tokenize a corpus with an ordered merge list:
    * `(idCol, subword)` rows, one per emitted subword occurrence.
    * Merges apply to the DISTINCT-word vocabulary only (vocab-sized
    * fold work), then join back to the (doc, word) occurrences — the
    * corpus never sees the fold. */
  def applyMerges(df: DataFrame, idCol: String, textCol: String,
                  merges: Seq[(String, String, String)],
                  checkpointEvery: Int = 50): DataFrame = {
    val words = df.select(col(idCol),
      explode(TextOps.tokens(col(textCol))).as("word"))
    val vocab = foldMerges(
      words.select(col("word")).distinct()
        .select(col("word"), symbolize(col("word")).as("syms")),
      merges, checkpointEvery)
    words.join(vocab, Seq("word"))
      .select(col(idCol), explode(col("syms")).as("subword"))
  }

  /** Corpus-wide subword frequencies `(subword, n)` under an ordered
    * merge list — the tokenizer-statistics path. Unlike
    * [[applyMerges]] + count, the corpus never joins back: the fold
    * runs on the word-count relation and occurrences weight the sum,
    * so everything past the one corpus pass is vocabulary-sized. */
  def subwordCounts(df: DataFrame, textCol: String,
                    merges: Seq[(String, String, String)],
                    checkpointEvery: Int = 50): DataFrame =
    foldMerges(wordCounts(df, textCol), merges, checkpointEvery)
      .select(col("n"), explode(col("syms")).as("subword"))
      .groupBy(col("subword")).agg(sum(col("n")).as("n"))
}
