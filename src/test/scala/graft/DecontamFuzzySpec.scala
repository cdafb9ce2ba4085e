package graft

import graft.text.Corpus

/** Fuzzy decontamination: self-flagging at 1.0, paraphrase catch that
  * exact grams miss, clean docs pass, exact Jaccard values. */
class DecontamFuzzySpec extends SparkSpec {
  import spark.implicits._

  private val evalDoc = "the quick brown fox jumps over the lazy dog today"
  // shares most 3-shingles with evalDoc (one word changed at the end)
  private val nearDup = "the quick brown fox jumps over the lazy dog tonight"
  private val clean = "completely different subject matter entirely here now"

  test("verbatim leak self-flags at 1.0; near-dup flags; clean passes") {
    val corpus = Seq((1L, evalDoc), (2L, nearDup), (3L, clean))
      .toDF("doc_id", "text")
    val eval_ = Seq((100L, evalDoc)).toDF("doc_id", "text")
    val got = Corpus.decontaminateFuzzy(corpus, eval_, "doc_id", "text",
        threshold = 0.5)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got(1L) == 1.0, "verbatim")
    assert(got.contains(2L) && got(2L) > 0.5 && got(2L) < 1.0, "near-dup")
    assert(!got.contains(3L), "clean doc flagged")
    // exact value: 8 shared of (9 + 9 - 8) shingles
    val sh = (s: String) => s.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val (a, b) = (sh(evalDoc), sh(nearDup))
    val want = a.intersect(b).size.toDouble / a.union(b).size
    assert(math.abs(got(2L) - want) < 1e-12)
  }

  test("threshold filters; empty eval set yields empty result") {
    val corpus = Seq((1L, evalDoc), (2L, nearDup)).toDF("doc_id", "text")
    val eval_ = Seq((100L, evalDoc)).toDF("doc_id", "text")
    val strict = Corpus.decontaminateFuzzy(corpus, eval_, "doc_id", "text",
      threshold = 0.95).as[(Long, Long, Double)].collect()
    assert(strict.map(_._1).toSet == Set(1L))
    val none = Corpus.decontaminateFuzzy(corpus,
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text")
    assert(none.count() == 0)
  }
}
