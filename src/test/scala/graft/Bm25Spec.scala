package graft

import org.apache.spark.sql.functions._

import graft.text.Bm25

/** BM25 retrieval: formula agreement with a hand-rolled reference,
  * ranking sanity (tf and idf effects), quantized-score exactness
  * properties, and edge cases. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple cherry"),
    (2L, "banana cherry date"),
    (3L, "apple apple apple banana"),
    (4L, "elephant fig grape"),
    (5L, "")
  ).toDF("doc_id", "text")

  /** Driver-side reference implementation of the exact quantized
    * arithmetic (same operand order as the engine). */
  private def refScores(corpus: Seq[(Long, String)],
                        queryTerms: Seq[String]): Map[Long, Long] = {
    val toks = corpus.map { case (id, t) =>
      id -> t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    }.toMap
    val n = corpus.size.toLong
    val avgdl = toks.values.map(_.size.toLong).sum.toDouble / n.toDouble
    val dfm = toks.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
    val qs = queryTerms.distinct.filter(dfm.contains)
    corpus.flatMap { case (id, _) =>
      val tl = toks(id)
      val dl = tl.size.toLong
      val s = qs.map { t =>
        val tf = tl.count(_ == t).toLong
        if (tf == 0) 0L
        else {
          val idfU = math.round(math.log(1.0 +
            (n.toDouble - dfm(t).toDouble + 0.5) / (dfm(t).toDouble + 0.5))
            * 1e6)
          val tfnN = math.round(tf.toDouble * (Bm25.k1 + 1.0) /
            (tf.toDouble + Bm25.k1 * ((1.0 - Bm25.b) +
              Bm25.b * (dl.toDouble / avgdl))) * 1e9)
          idfU * tfnN
        }
      }.sum
      if (s > 0) Some(id -> s) else None
    }.toMap
  }

  test("scores match the quantized reference formula exactly") {
    val q = Seq((100L, "apple banana")).toDF("query_id", "text")
    val got = Bm25.topK(docs, q, k = 10)
      .select($"doc_id", $"score").as[(Long, Long)].collect().toMap
    val want = refScores(
      Seq((1L, "apple banana apple cherry"), (2L, "banana cherry date"),
        (3L, "apple apple apple banana"), (4L, "elephant fig grape"),
        (5L, "")),
      Seq("apple", "banana"))
    assert(got == want, s"got=$got want=$want")
  }

  test("ranking: more occurrences of a rare term outrank fewer; a " +
      "nonmatching doc is absent; ranks are dense per query") {
    val q = Seq((100L, "apple")).toDF("query_id", "text")
    val r = Bm25.topK(docs, q, k = 10)
      .orderBy($"rank").select($"doc_id", $"rank").as[(Long, Long)].collect()
    // doc 3 has 3x apple in 4 tokens; doc 1 has 2x in 4 tokens
    assert(r.head._1 == 3L)
    assert(r.map(_._1).toSet == Set(1L, 3L)) // docs 2,4,5 never match
    assert(r.map(_._2).toSeq == Seq(1L, 2L))
  }

  test("idf: a rarer term contributes more than a common one at equal tf") {
    // 'date' appears in 1 doc, 'banana' in 3 — query for each alone,
    // same doc (2) holds both at tf=1 and identical dl
    val qd = Seq((1L, "date")).toDF("query_id", "text")
    val qb = Seq((1L, "banana")).toDF("query_id", "text")
    val sd = Bm25.topK(docs, qd, 10).filter($"doc_id" === 2L)
      .select($"score").as[Long].head()
    val sb = Bm25.topK(docs, qb, 10).filter($"doc_id" === 2L)
      .select($"score").as[Long].head()
    assert(sd > sb, s"rare-term score $sd should beat common-term $sb")
  }

  test("duplicate query terms count once; unknown-term-only query " +
      "returns nothing; k truncates") {
    val q1 = Seq((1L, "apple apple apple")).toDF("query_id", "text")
    val q2 = Seq((1L, "apple")).toDF("query_id", "text")
    val a = Bm25.topK(docs, q1, 10).select($"doc_id", $"score")
      .as[(Long, Long)].collect().toMap
    val b = Bm25.topK(docs, q2, 10).select($"doc_id", $"score")
      .as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(Bm25.topK(docs,
      Seq((1L, "zzzz")).toDF("query_id", "text"), 10).isEmpty)
    assert(Bm25.topK(docs,
        Seq((1L, "apple")).toDF("query_id", "text"), 1)
      .count() == 1)
  }

  test("phraseMatches: consecutive positions only, overlaps emit, " +
      "prefix near-miss and reordered terms don't match") {
    val corpus = Seq(
      (1L, "the quick brown fox"),          // match at 1
      (2L, "quick brown quick brown fox"),  // match at 2 only
      (3L, "quick fox brown"),              // terms present, not adjacent
      (4L, "brown quick fox"),              // reordered
      (5L, "Quick BROWN fox, quick brown fox!"), // case/punct: 0 and 3
      (6L, "quick brown"),                  // prefix only
      (7L, "")).toDF("doc_id", "text")
    val out = Bm25.phraseMatches(corpus, Seq("quick", "brown", "fox"))
      .as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 1L), (2L, 2L), (5L, 0L), (5L, 3L)))
    // overlapping self-phrase: "a a a a" under phrase (a, a) -> 0,1,2
    val selfy = Seq((1L, "a a a a")).toDF("doc_id", "text")
    assert(Bm25.phraseMatches(selfy, Seq("a", "a"))
      .as[(Long, Long)].collect().toSet ==
      Set((1L, 0L), (1L, 1L), (1L, 2L)))
    // single-term phrase degenerates to term lookup: docs 1-5 all
    // contain fox, doc 5 twice -> 6 occurrences
    assert(Bm25.phraseMatches(corpus, Seq("fox")).count() == 6)
  }
}
