package graft

import graft.text.NgramLm
import org.apache.spark.sql.functions._

/** Stupid Backoff n-gram LM: train counts, backoff levels, scores. */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private def lmOf(rows: (Long, String)*) =
    NgramLm.train(rows.toDF("id", "text"), "id", "text",
      n = 3, minCount = 2L)

  test("train counts and prunes: unigrams kept, higher orders need " +
    "minCount") {
    // "a b c" twice and "a b d" once: trigram 'a b c' count 2 survives,
    // 'a b d' (1) pruned; bigram 'a b' count 3
    val lm = lmOf(1L -> "a b c", 2L -> "a b c", 3L -> "a b d")
    val byOrder = lm.groupBy("order").agg(count(lit(1)).as("n"),
        sum("count").as("tot"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    // unigrams: a(3) b(3) c(2) d(1) — all kept
    assert(byOrder(1) == (4L, 9L))
    // bigrams: 'a b'(3), 'b c'(2) survive; 'b d'(1) pruned
    assert(byOrder(2) == (2L, 5L))
    // trigrams: 'a b c'(2) survives; 'a b d'(1) pruned
    assert(byOrder(3) == (1L, 2L))
  }

  test("score assigns longest-match backoff levels per token") {
    val lm = lmOf(1L -> "a b c", 2L -> "a b c", 3L -> "a b d")
    // doc "a b c z": p0 'a' maxOrder1 level1; p1 'b' bigram 'a b' level2;
    // p2 'c' trigram 'a b c' level3; p3 'z' OOV
    val out = NgramLm.score(Seq(9L -> "a b c z").toDF("id", "text"),
        "id", "text", lm, n = 3).collect().head
    assert(out.getAs[Long]("n_tok") == 4L)
    assert(out.getAs[Long]("n_l1") == 1L)
    assert(out.getAs[Long]("n_l2") == 1L)
    assert(out.getAs[Long]("n_l3") == 1L)
    assert(out.getAs[Long]("n_oov") == 1L)
  }

  test("score is exact Stupid Backoff arithmetic on a hand case") {
    val lm = lmOf(1L -> "a b c", 2L -> "a b c", 3L -> "a b d")
    // total unigram tokens = 9
    // doc "b d": p0 'b' level1 S=3/9; p1 'd': bigram 'b d' pruned,
    // maxOrder2 -> backoff to unigram d(1): S=0.4 * 1/9
    val out = NgramLm.score(Seq(9L -> "b d").toDF("id", "text"),
        "id", "text", lm, n = 3, alpha = 0.4).collect().head
    val expected = math.log(3.0 / 9.0) +
      (math.log(1.0 / 9.0) + math.log(0.4))
    assert(math.abs(out.getAs[Double]("logscore") - expected) < 1e-9)
    assert(math.abs(out.getAs[Double]("ppl") -
      math.exp(-expected / 2.0)) < 1e-9)
  }

  test("level-3 context division uses the PREVIOUS position's bigram " +
    "count (no second join)") {
    // trigram 'a b c' 2x, context bigram 'a b' 3x -> S = 2/3 at level 3
    val lm = lmOf(1L -> "a b c", 2L -> "a b c", 3L -> "a b d")
    val out = NgramLm.score(Seq(9L -> "a b c").toDF("id", "text"),
        "id", "text", lm, n = 3).collect().head
    val expected = math.log(3.0 / 9.0) + // 'a' unigram 3/9
      math.log(3.0 / 3.0) + // 'a b' / 'a' = 3/3
      math.log(2.0 / 3.0) // 'a b c' / 'a b' = 2/3
    assert(math.abs(out.getAs[Double]("logscore") - expected) < 1e-9)
  }

  test("in-domain text scores lower perplexity than shuffled gibberish") {
    val corpus = (1L to 40L).map(i =>
      i -> "the quick brown fox jumps over the lazy dog again and again")
    val lm = NgramLm.train(corpus.toDF("id", "text"), "id", "text",
      n = 3, minCount = 2L)
    val probe = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "dog quick the over fox lazy brown jumps the").toDF("id", "text")
    val ppl = NgramLm.score(probe, "id", "text", lm, n = 3)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("ppl")).toMap
    assert(ppl(1L) < ppl(2L))
  }

  test("empty and sub-n docs: no row for zero tokens; short docs score " +
    "at their max attainable order") {
    val lm = lmOf(1L -> "a b c", 2L -> "a b c")
    val out = NgramLm.score(
      Seq(1L -> "", 2L -> "  ", 3L -> "a").toDF("id", "text"),
      "id", "text", lm, n = 3)
    val rows = out.collect().map(r => r.getAs[Long]("id")).toSet
    assert(rows == Set(3L))
    val r3 = out.filter($"id" === 3L).collect().head
    assert(r3.getAs[Long]("n_l1") == 1L && r3.getAs[Long]("n_oov") == 0L)
  }

  test("trainScoreSplit is a disjoint deterministic partition") {
    val docs = (1L to 100L).map(i => i -> s"tok$i common words here")
      .toDF("id", "text")
    val out = NgramLm.trainScoreSplit(docs, "id", "text", n = 2,
      minCount = 1L, trainFraction = 0.5)
    val scoredIds = out.select("id").as[Long].collect().toSet
    val cut = (0.5 * 4294967296.0).toLong
    val expect = (1L to 100L).filter { i =>
      val h = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(s"lm|$i")
          .take(8), 16)
      h >= cut
    }.toSet
    assert(scoredIds == expect)
  }
}
