package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-language-model subword tokenizer (Kudo 2018, "Subword
  * Regularization" — the SentencePiece `--model_type=unigram` recipe;
  * the other of the two tokenizer constructions real LLM pipelines
  * use, alongside BPE):
  *
  *   1. SEED a piece inventory from corpus substrings (all substrings
  *      up to `maxPieceLen` above a frequency floor, plus every single
  *      character so any word stays segmentable);
  *   2. score each piece with its micro-quantized log relative
  *      frequency;
  *   3. SEGMENT by Viterbi — per word, the piece sequence of maximal
  *      total score;
  *   4. TRAIN by hard EM: re-count pieces over the Viterbi
  *      segmentations (weighted by word frequency), re-score, prune to
  *      the target inventory, repeat.
  *
  * Spark-first shape (the [[Bpe]] posture): the corpus is read ONCE
  * into a distinct-word count relation; seeding explodes substrings of
  * DISTINCT WORDS only (|vocab| x len² rows, never corpus-sized); the
  * piece inventory is dimension-sized (a tokenizer vocabulary), so
  * segmentation ships it into a codegen'd kernel as a reference object
  * — the broadcast-dimension pattern — and each EM iteration is one
  * vocabulary-sized pass (segment distinct words, weight by n,
  * re-aggregate piece counts).
  *
  * Engine-exactness (what makes this ORACLE-GATEABLE, unlike stock
  * SentencePiece): scores are `round(ln(count/total) * 1e6)` BIGINTs
  * (the Bm25/Dsir micro-quantization pattern — both engines evaluate
  * IEEE `ln` on identical integer ratios), Viterbi runs in exact Long
  * arithmetic, and every tie is resolved deterministically: per
  * position, candidates compare by (total score DESC, piece count ASC,
  * last-piece length DESC); seed pruning orders by (count DESC, piece
  * ASC). The DuckDB oracle replays segmentation as a generated
  * per-position DP CTE chain (the BPE-train-oracle idiom), bit for
  * bit. Hard EM (Viterbi counts) rather than expected counts is what
  * keeps training deterministic — documented divergence from Kudo's
  * soft EM, same argmax segmentations in the common case. */
object Unigram {

  /** Distinct-word counts `(word, n)` — the single corpus pass. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** Seed piece inventory with micro-quantized log-frequency scores:
    * `(piece, cnt, logp_micro)`. Pieces are the corpus' substrings of
    * length <= maxPieceLen with total (occurrence-weighted) count >=
    * minCount, truncated to the `maxSeed` most frequent (count DESC,
    * piece ASC) — plus EVERY single character regardless of floor or
    * truncation, so Viterbi can always cover a word. Substring
    * explosion runs over DISTINCT words, weighted by their counts. */
  def seedPieces(words: DataFrame, maxPieceLen: Int = 6,
                 minCount: Long = 2L, maxSeed: Int = 1 << 16): DataFrame = {
    require(maxPieceLen >= 1 && maxSeed >= 1)
    val subs = words
      .select(col("n"), col("word"), length(col("word")).as("__l"))
      .select(col("n"),
        explode(expr(
          s"""flatten(transform(sequence(1, __l), i ->
             |  transform(sequence(i, least(__l, i + ${maxPieceLen - 1})),
             |    j -> substring(word, i, j - i + 1))))""".stripMargin))
          .as("piece"))
      .groupBy(col("piece")).agg(sum(col("n")).as("cnt"))
    val chars = subs.filter(length(col("piece")) === 1)
    val multi = subs.filter(length(col("piece")) > 1 &&
        col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(maxSeed)
    score(chars.unionByName(multi))
  }

  /** Attach `logp_micro = round(ln(cnt / total) * 1e6)` to a
    * `(piece, cnt)` relation — total via a window over the
    * inventory-sized relation, not a collect. */
  private def score(pieces: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    pieces
      .withColumn("__tot", sum(col("cnt")).over(
        Window.partitionBy(lit(1))))
      .select(col("piece"), col("cnt"),
        round(log(col("cnt").cast("double") / col("__tot").cast("double"))
          * 1e6).cast("long").as("logp_micro"))
  }

  /** Viterbi segmentation of every word in `words` against a
    * driver-side piece inventory: `(word, pieces: array<string>)`.
    * The inventory is dimension-sized (a tokenizer vocab), so it rides
    * into the codegen'd kernel as a reference object — the
    * broadcast-dimension pattern. */
  def segment(words: DataFrame, vocab: Map[String, Long],
              maxPieceLen: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
    words.withColumn("pieces",
      column(UnigramSegment(expression(col("word")), vocab, maxPieceLen)))
  }

  /** One hard-EM iteration: Viterbi-segment the distinct words under
    * the current scores, re-count pieces weighted by word frequency,
    * re-score. Pieces that win no segmentation slot are dropped —
    * EXCEPT single characters, which are floored at count 1 to keep
    * every word coverable. */
  private def emStep(words: DataFrame,
                     pieces: Array[(String, Long, Long)],
                     maxPieceLen: Int): DataFrame = {
    val vocab = pieces.map(p => (p._1, p._3)).toMap
    val used = segment(words, vocab, maxPieceLen)
      .select(col("n"), explode(col("pieces")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("n")).as("cnt"))
    val spark = words.sparkSession
    import spark.implicits._
    val chars = pieces.map(_._1).filter(_.length == 1)
      .toSeq.toDF("piece").withColumn("cnt", lit(1L))
    score(used.unionByName(
      chars.join(used.select(col("piece")), Seq("piece"), "left_anti")))
  }

  /** Train a unigram-LM piece inventory: seed, `emIters` hard-EM
    * rounds, prune to `vocabSize` (count DESC, piece ASC; single
    * characters always kept), one final re-score. Returns
    * `(piece, cnt, logp_micro)`. The inventory is collected per
    * iteration — it is the model (dimension-sized), same posture as
    * `Ann.ivfCentroids`. */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
            maxPieceLen: Int = 6, emIters: Int = 2,
            minCount: Long = 2L, maxSeed: Int = 1 << 16): DataFrame = {
    require(vocabSize >= 1 && emIters >= 0)
    val spark = df.sparkSession
    import spark.implicits._
    val words = wordCounts(df, textCol).localCheckpoint()
    var inv = seedPieces(words, maxPieceLen, minCount, maxSeed)
      .as[(String, Long, Long)].collect()
    for (_ <- 1 to emIters)
      inv = emStep(words, inv, maxPieceLen).as[(String, Long, Long)].collect()
    val (chars, multi) = inv.partition(_._1.length == 1)
    val kept = chars ++ multi
      .sortBy(p => (-p._2, p._1))
      .take(math.max(0, vocabSize - chars.length))
    val rescored = score(kept.toSeq.toDF("piece", "cnt", "__old")
      .select(col("piece"), col("cnt")))
    rescored
  }

  /** Deterministic id table `(piece, token_id)`: 1-based binary-order
    * rank — engine-portable, the [[Bpe.vocabIds]] rule. */
  def vocabIds(pieces: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    pieces.select(col("piece")).distinct()
      .withColumn("token_id",
        row_number().over(Window.orderBy(col("piece"))).cast("long"))
  }

  /** Tokenize a corpus to piece-id sequences under a trained
    * inventory: `(idCol, word_pos, sub_pos, token_id)` — the
    * [[Bpe.encodeIds]] artifact shape. The Viterbi fold runs on the
    * DISTINCT-word vocabulary and joins back to the position-carrying
    * occurrences; ids broadcast. */
  def encodeIds(df: DataFrame, idCol: String, textCol: String,
                pieces: DataFrame, maxPieceLen: Int = 6): DataFrame = {
    import df.sparkSession.implicits._
    val vocab = pieces.select(col("piece"), col("logp_micro"))
      .as[(String, Long)].collect().toMap
    val words = df.select(col(idCol),
      posexplode(TextOps.tokens(col(textCol))).as(Seq("word_pos", "word")))
    val segs = segment(words.select(col("word")).distinct(), vocab,
      maxPieceLen)
    val ids = vocabIds(pieces)
    words.join(segs, Seq("word"))
      .select(col(idCol), col("word_pos").cast("long").as("word_pos"),
        posexplode(col("pieces")).as(Seq("sub_pos", "piece")))
      .join(broadcast(ids), Seq("piece"))
      .select(col(idCol), col("word_pos"),
        col("sub_pos").cast("long").as("sub_pos"), col("token_id"))
  }
}
