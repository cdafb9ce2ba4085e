package graft

import org.apache.spark.sql.functions._

import graft.text.Unigram

/** Unigram-LM tokenizer: Viterbi exactness and tie rules, seed
  * coverage, EM determinism, prune discipline, encode positions. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def seg(word: String, vocab: Map[String, Long],
                  maxLen: Int = 6): Seq[String] = {
    val out = Unigram.segment(Seq(word).toDF("word"), vocab, maxLen)
      .select(col("pieces")).as[Seq[String]].collect()
    out.head
  }

  test("viterbi picks the max-score cover, exact long arithmetic") {
    // 'abc': ab+c = -1 + -5 = -6; a+bc = -4 + -2 = -6 (tie, 2 pieces
    // each) -> longer LAST piece wins: a+bc (last len 2 beats c's 1)
    val v = Map("a" -> -4L, "b" -> -9L, "c" -> -5L, "ab" -> -1L,
      "bc" -> -2L)
    assert(seg("abc", v) == Seq("a", "bc"))
    // strictly better total wins regardless of piece count:
    // abc as one piece if present and cheap
    assert(seg("abc", v + ("abc" -> -3L)) == Seq("abc"))
    // fewer pieces breaks exact score ties: a+bc (-6, 2 pieces) loses
    // to abc (-6, 1 piece)
    assert(seg("abc", v + ("abc" -> -6L)) == Seq("abc"))
  }

  test("single-char fallback covers any word; unknown-char word is null") {
    val v = Map("x" -> -1L, "y" -> -2L)
    assert(seg("xyx", v) == Seq("x", "y", "x"))
    val out = Unigram.segment(Seq("xqz").toDF("word"), v, 6)
      .select(col("pieces").isNull).as[Boolean].collect()
    assert(out.head, "uncoverable word must yield null")
  }

  test("seedPieces: frequency floor on multi-char pieces, every " +
    "single char kept, deterministic truncation") {
    val df = Seq("banana banana band").toDF("text")
    val words = Unigram.wordCounts(df, "text")
    val pieces = Unigram.seedPieces(words, maxPieceLen = 3,
        minCount = 2L, maxSeed = 4)
      .select($"piece", $"cnt").as[(String, Long)].collect().toMap
    // chars always present
    assert(Seq("b", "a", "n", "d").forall(pieces.contains))
    // 'ban' occurs in both words (weighted 2+1=3) -> above floor
    assert(pieces.contains("ban") || pieces.size >= 5)
    // nothing below the floor among multi-char survivors
    assert(pieces.filter(_._1.length > 1).values.forall(_ >= 2L))
  }

  test("train is deterministic and prune keeps single chars") {
    val df = Seq((1L, "low lower lowest low banana band bandana"),
      (2L, "low lowest banana")).toDF("doc_id", "text")
    def run() = Unigram.train(df, "text", vocabSize = 12,
        maxPieceLen = 4, emIters = 2)
      .orderBy("piece").as[(String, Long, Long)].collect().toSeq
    val a = run()
    assert(a == run(), "train must be deterministic")
    val chars = a.map(_._1).filter(_.length == 1).toSet
    // every character of the corpus survives pruning
    assert(Set("l", "o", "w", "e", "r", "s", "t", "b", "a", "n", "d")
      .subsetOf(chars))
    // inventory respects the target size over multi-char pieces
    assert(a.count(_._1.length > 1) <= 12)
  }

  test("encodeIds: positions reconstruct the sequence, ids are " +
    "binary-order ranks, segmentation is score-optimal") {
    val df = Seq((1L, "aa ab"), (2L, "ab")).toDF("doc_id", "text")
    val pieces = Seq(("a", 10L, -4L), ("b", 5L, -9L), ("aa", 4L, -2L),
      ("ab", 6L, -1L)).toDF("piece", "cnt", "logp_micro")
    val rows = Unigram.encodeIds(df, "doc_id", "text", pieces, 6)
      .as[(Long, Long, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2, r._3))
    // vocab sorted: a=1, aa=2, ab=3, b=4
    // doc1: 'aa' -> [aa] (id 2); 'ab' -> [ab] (id 3)
    assert(rows.filter(_._1 == 1L).map(r => (r._2, r._3, r._4)) ==
      Seq((0L, 0L, 2L), (1L, 0L, 3L)))
    assert(rows.filter(_._1 == 2L).map(_._4) == Seq(3L))
  }

  test("hard-EM concentrates mass: a dominant word becomes one piece") {
    val df = Seq(("the the the the the the the the cat")).toDF("text")
    val inv = Unigram.train(df, "text", vocabSize = 8,
        maxPieceLen = 3, emIters = 2, minCount = 2L)
      .as[(String, Long, Long)].collect()
    val vocab = inv.map(p => (p._1, p._3)).toMap
    assert(vocab.contains("the"), s"expected 'the' in ${vocab.keys}")
    assert(seg("the", vocab, 3) == Seq("the"))
  }
}
