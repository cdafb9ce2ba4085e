package graft

import graft.text.Corpus
import org.apache.spark.sql.functions._

/** Corpus-curation operators: Gopher-style repetition signals and
  * deterministic content-hash sampling (Rae et al. 2021 appendix A1.1
  * for the rule shapes; the exact fractions are this engine's
  * contract, oracled in the txt_repetition / doc_sample_strat gates). */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionSignals: duplicated lines and a dominant bigram") {
    val df = Seq(
      (1L, "spam spam\nspam spam\nunique line here"),
      (2L, "all lines differ\ncompletely here"),
      (3L, "")).toDF("id", "text")
    val out = Corpus.repetitionSignals(df, "id", "text")
      .orderBy($"id").collect()
    // doc 1: lines (spam spam)x2 + 1 unique -> dup 2/3; chars 9+9+16=34,
    // dup 18/34; tokens spam,spam,spam,spam,unique,line,here -> bigrams
    // [spam spam]x3, [spam unique], [unique line], [line here] -> top 3/6
    assert(out(0).getLong(1) == 3L)
    assert(math.abs(out(0).getDouble(2) - 2.0 / 3.0) < 1e-15)
    assert(math.abs(out(0).getDouble(3) - 18.0 / 34.0) < 1e-15)
    assert(math.abs(out(0).getDouble(4) - 3.0 / 6.0) < 1e-15)
    // doc 2: no duplicate lines, no repeated bigram
    assert(out(1).getLong(1) == 2L && out(1).getDouble(2) == 0.0)
    assert(out(1).getDouble(4) == 1.0 / 4.0)
    // doc 3: empty text -> zero lines, null fractions
    assert(out(2).getLong(1) == 0L && out(2).isNullAt(2) && out(2).isNullAt(4))
  }

  test("dedupParagraphs: corpus-wide first occurrence by (id, pos) wins; " +
    "trim/empty lines drop; within-doc repeats also dedup") {
    val df = Seq(
      (2L, "shared para\nunique to two"),
      (1L, "first line\n  shared para  \n\nfirst line"),
      (3L, "shared para")).toDF("id", "text")
    val out = Corpus.dedupParagraphs(df, "id", "text")
      .orderBy($"id", $"pos").collect()
    // doc 1: (0, first line) keep; (1, shared para) keep — (1,1) < (2,0)
    // beats doc 2 and 3; (2, "") dropped; (3, first line) dup of (1,0)
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getBoolean(3))).toSeq ==
      Seq((1L, 0, true), (1L, 1, true), (1L, 3, false),
        (2L, 0, false), (2L, 1, true), (3L, 0, false)))
    // hash column groups identical paragraphs across docs
    assert(out(1).getString(2) == out(3).getString(2))
  }

  test("dedupLines: frequency threshold removes from EVERY doc; blanks " +
    "are structure; docs rebuild in order; total-loss doc keeps its row") {
    // "common" appears 3x corpus-wide (> maxOccurrences=2) -> removed
    // everywhere; "rare" appears 2x -> kept; blank line kept as structure
    val df = Seq(
      (1L, "keep me\ncommon\nrare"),
      (2L, "common\n\nrare\ntail"),
      (3L, "  common  ")).toDF("id", "text")
    val out = Corpus.dedupLines(df, "id", "text", maxOccurrences = 2L)
      .orderBy($"id").collect()
    assert(out.map(_.getString(1)).toSeq ==
      Seq("keep me\nrare", "\nrare\ntail", ""))
    assert(out.map(r => (r.getLong(2), r.getLong(3))).toSeq ==
      Seq((3L, 1L), (4L, 1L), (1L, 1L))) // (n_lines, n_removed)
    // trimmed-form counting: "  common  " counted with "common"
    // (asserted by doc 3 losing its only line above)
    // threshold is strictly greater-than: occurrences == max keep
    val keepAll = Corpus.dedupLines(df, "id", "text", maxOccurrences = 3L)
      .orderBy($"id").collect()
    assert(keepAll.forall(_.getLong(3) == 0L))
  }

  test("url ops: canonicalize strips tracking/ports/www/fragments; host " +
    "and registered domain; nulls and non-URLs pass through") {
    import graft.text.TextOps
    val rows = Seq(
        "HTTPS://WWW.Ex.COM:443/P/?utm_source=x&id=7#f",
        "http://a.com:80/",
        "http://news.bbc.co.uk/a?x=1",
        "plain text",
        null)
      .toDF("url")
      .select(TextOps.canonicalizeUrl($"url").as("c"),
        TextOps.urlHost($"url").as("h"),
        TextOps.registeredDomain($"url").as("d"))
      .collect()
    assert(rows(0).getString(0) == "https://ex.com/P/?id=7")
    assert(rows(0).getString(1) == "www.ex.com" &&
      rows(0).getString(2) == "ex.com")
    assert(rows(1).getString(0) == "http://a.com")
    assert(rows(2).getString(0) == "http://news.bbc.co.uk/a?x=1" &&
      rows(2).getString(2) == "bbc.co.uk")
    assert(rows(3).getString(0) == "plain text" &&
      rows(3).getString(1) == "" && rows(3).getString(2) == "")
    assert(rows(4).isNullAt(0) && rows(4).isNullAt(1) && rows(4).isNullAt(2))
    // canonical equality is the dedup key: tracking-only variants collide
    val canon = Seq("http://a.com/x?utm_a=1", "http://WWW.A.com/x",
        "http://a.com/x/")
      .toDF("url").select(TextOps.canonicalizeUrl($"url").as("c"))
      .distinct().collect()
    assert(canon.length == 1 && canon(0).getString(0) == "http://a.com/x")
  }

  test("dedupLines: null text passes through as NULL with zero counts") {
    import graft.text.Corpus
    val df = Seq((1L, "a\nb"), (2L, null.asInstanceOf[String]), (3L, ""))
      .toDF("id", "text")
    val out = Corpus.dedupLines(df, "id", "text").orderBy($"id").collect()
    assert(out.length == 3)
    assert(out(0).getString(1) == "a\nb")
    assert(out(1).isNullAt(1) && out(1).getLong(2) == 0L &&
      out(1).getLong(3) == 0L)
    assert(out(2).getString(1) == "" && out(2).getLong(2) == 1L)
  }

  test("registeredDomain resolves packaged public suffixes: ccTLD second " +
    "levels, 3-label private suffixes, bare ref preserved by canonicalize") {
    import graft.text.TextOps
    val rows = Seq(
        "http://a.example.com.au/x",
        "https://shop.example.co.uk/y",
        "http://b.example.gob.mx/z",
        "https://user.github.io/p",
        "http://files.bucket.s3.amazonaws.com/key",
        "http://plain.example.org/q",
        "http://repo.example.com/t?ref=main&ref_src=tw&utm_s=1")
      .toDF("url")
      .select(TextOps.registeredDomain($"url").as("d"),
        TextOps.canonicalizeUrl($"url").as("c"))
      .collect()
    assert(rows(0).getString(0) == "example.com.au")
    assert(rows(1).getString(0) == "example.co.uk")
    assert(rows(2).getString(0) == "example.gob.mx")
    assert(rows(3).getString(0) == "user.github.io")
    assert(rows(4).getString(0) == "bucket.s3.amazonaws.com")
    assert(rows(5).getString(0) == "example.org")
    // functional ?ref= survives; referral ref_src and utm_* are stripped
    assert(rows(6).getString(1) == "http://repo.example.com/t?ref=main")
    // the custom-set parameter strips what the caller names
    val custom = Seq("http://a.com/x?sid=9&id=1").toDF("url")
      .select(TextOps.canonicalizeUrl($"url", "sid").as("c")).collect()
    assert(custom(0).getString(0) == "http://a.com/x?id=1")
  }

  test("packSequences: concat-and-chunk offsets and sequence spans; " +
    "zero-token docs omitted") {
    val df = Seq((1L, 4L), (2L, 9L), (3L, 3L), (4L, 10L), (5L, 0L))
      .toDF("id", "n_tokens")
    val out = Corpus.packSequences(df, "id", "n_tokens", seqLen = 10L)
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    // stream offsets 0,4,13,16; chunk boundaries every 10 tokens
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 0L, 0L),    // [0,4)   entirely in seq 0
      (2L, 4L, 0L, 4L, 1L),    // [4,13)  crosses into seq 1
      (3L, 13L, 1L, 3L, 1L),   // [13,16) inside seq 1
      (4L, 16L, 1L, 6L, 2L)))  // [16,26) spans seqs 1..2; doc 5 omitted
  }

  test("gopherQuality: each rule fails in isolation; clean prose keeps") {
    // 60 simple words incl. stopwords, one bullet line out of three
    val good = (("the cat sat on the mat and it was very fine today " * 5)
      .trim + "\nplain line\n- one bullet of three lines")
    val tooShort = "the cat is on a mat"                 // 7 words < 50
    val bullets = Array.fill(8)("- item").mkString("\n") // all lines bulleted
    val symbols = (Array.fill(60)("### 123").mkString(" ")
      + " the of and to in")                             // alpha frac ~0
    val noStop = Array.fill(60)("zyxwivous").mkString(" ")
    val df = Seq((1L, good), (2L, tooShort), (3L, bullets), (4L, symbols),
      (5L, noStop)).toDF("id", "text")
    val out = Corpus.gopherQuality(df, "id", "text")
      .orderBy($"id").collect()
    assert(out.map(_.getAs[Boolean]("keep")).toSeq ==
      Seq(true, false, false, false, false))
    // signal columns carry the reason each doc failed
    assert(out(1).getAs[Long]("n_words") == 6L)
    assert(out(2).getAs[Double]("frac_bullet_lines") == 1.0)
    assert(out(3).getAs[Double]("frac_alpha_words") < 0.1)
    assert(out(4).getAs[Long]("n_stop") == 0L)
    // frac_ellipsis rule: lines ending in "..." counted against the cap
    val ell = Seq((9L, Array.fill(60)("word ...").mkString("\n")
      + " the of and it was")).toDF("id", "text")
    val eRow = Corpus.gopherQuality(ell, "id", "text").collect().head
    assert(eRow.getAs[Double]("frac_ellipsis_lines") > 0.9)
    assert(!eRow.getAs[Boolean]("keep"))
  }

  test("redactPii: emails, IPs, long digit runs; short numbers and bare " +
    "words survive; email local-part digits aren't half-eaten") {
    val df = Seq(
      "mail bob.smith+x@corp.example.org now",
      "node 10.0.255.7 port 80 pin 123456 acct 12345678",
      "id 1234567890@9876543210.example.com tail",
      "clean text with no pii at all").toDF("text")
      .select(Corpus.redactPii($"text").as("r"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq(
      "mail <EMAIL> now",
      "node <IP> port 80 pin 123456 acct <NUM>",
      "id <EMAIL> tail",
      "clean text with no pii at all"))
  }

  test("decontaminate: distinct-gram and eval-doc counts; clean docs " +
    "absent; repeated grams in a doc count once") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "nothing shared here at all"),
      (3L, "beta gamma beta gamma")).toDF("doc_id", "text")
    val evalSet = Seq(
      (10L, "beta gamma delta epsilon"),
      (11L, "gamma delta zeta")).toDF("doc_id", "text")
    val out = text.Corpus
      .decontaminate(corpus, evalSet, "doc_id", "text", n = 2)
      .orderBy("doc_id").collect()
    // doc 1: grams {alpha beta, beta gamma, gamma delta}; "beta gamma"
    // hits eval 10, "gamma delta" hits 10 and 11 -> 2 grams, 2 eval docs
    // doc 3: duplicated "beta gamma" counts once -> 1 gram, 1 eval doc
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq((1L, 2L, 2L), (3L, 1L, 1L)))
  }

  test("topTerms: integer rank key (tf desc, df asc, term asc); log-idf " +
    "score; k truncation") {
    val corpus = Seq(
      (1L, "apple apple banana cherry"),
      (2L, "banana banana banana date"),
      (3L, "cherry date elderberry")).toDF("doc_id", "text")
    val out = text.Corpus.topTerms(corpus, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank").collect()
    // doc 1: apple tf=2 (df=1); banana/cherry tf=1 with df 2,2 -> banana
    //   beats cherry on term asc at equal (tf, df)
    val got = out.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getInt(5))).toSeq
    assert(got == Seq(
      (1L, "apple", 2L, 1L, 1), (1L, "banana", 1L, 2L, 2),
      (2L, "banana", 3L, 2L, 1), (2L, "date", 1L, 2L, 2),
      (3L, "elderberry", 1L, 1L, 1), (3L, "cherry", 1L, 2L, 2)))
    // tfidf = tf * ln(N/df). Catalyst's Logarithm evaluates via
    // StrictMath.log (1 ulp off the Math.log intrinsic for ln 3) — the
    // very cross-engine hazard that keeps tfidf out of the oracle gate.
    val apple = out.find(r => r.getLong(0) == 1L).get
    assert(apple.getDouble(4) == 2.0 * StrictMath.log(3.0 / 1.0))
  }

  test("sampleByHash: deterministic, salt-sensitive, and monotone in the " +
    "fraction (same salt at a larger rate is a superset)") {
    val df = spark.range(2000).toDF("id")
    def ids(fraction: Double, salt: String): Set[Long] =
      Corpus.sampleByHash(df, "id", fraction, salt)
        .collect().map(_.getLong(0)).toSet
    val a = ids(0.25, "s1")
    assert(ids(0.25, "s1") == a, "re-running must select identical rows")
    // ~25% within binomial slop
    assert(a.size > 380 && a.size < 620)
    assert(a.subsetOf(ids(0.5, "s1")), "growing the rate keeps prior rows")
    assert(ids(0.25, "s2") != a, "a different salt is a different sample")
    assert(ids(0.0, "s1").isEmpty && ids(1.0, "s1").size == 2000)
  }

  test("sampleStratified: per-stratum rates match sampleByHash with the " +
    "same salt; absent strata drop") {
    val df = spark.range(1200)
      .select($"id", concat(lit("s"), pmod($"id", lit(3))).as("src"))
    val out = Corpus.sampleStratified(df, "id", "src",
      Map("s0" -> 1.0, "s1" -> 0.5), salt = "x")
    val byStratum = out.groupBy($"src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum("s0") == 400, "rate 1.0 keeps the whole stratum")
    assert(byStratum.get("s2").isEmpty, "unlisted strata are dropped")
    // the s1 selection is exactly sampleByHash at 0.5 restricted to s1
    val direct = Corpus.sampleByHash(df.filter($"src" === "s1"), "id", 0.5, "x")
      .collect().map(_.getLong(0)).toSet
    val strat = out.filter($"src" === "s1").collect()
      .map(_.getLong(0)).toSet
    assert(strat == direct)
  }

  test("property: profile quantiles equal the sorted-list percentile_disc " +
    "rule on random multisets") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genVals: Gen[List[Long]] =
      Gen.choose(1, 60).flatMap(n => Gen.listOfN(n, Gen.choose(0L, 20L)))
    val prop = Prop.forAll(genVals) { vs =>
      val df = vs.map(("s", _)).toDF("src", "v")
      val row = Corpus.profile(df, "src", $"v").head()
      val sorted = vs.sorted
      def disc(p: Double): Long =
        sorted(math.ceil(p * vs.length).toLong.toInt - 1)
      row.getAs[Long]("n_docs") == vs.length &&
        row.getAs[Long]("total") == vs.sum &&
        row.getAs[Long]("p50") == disc(0.5) &&
        row.getAs[Long]("p90") == disc(0.9) &&
        row.getAs[Long]("p99") == disc(0.99)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("ngramNovelty: first owner keeps 1.0, an exact copy scores 0.0, " +
    "a partial borrower lands in between; short docs have no row") {
    val df = Seq(
      (1L, "a b c d e"),          // grams: abc bcd cde — first owner
      (2L, "a b c d e"),          // exact copy: all grams owned by 1
      (3L, "a b c x y z"),        // abc owned by 1; bcx cxy xyz novel
      (4L, "q r")).toDF("doc_id", "text") // < 3 tokens: no row
    val out = Corpus.ngramNovelty(df, "doc_id", "text", n = 3)
    assertFrame(out,
      Seq(Seq(1L, 3L, 3L, 1.0), Seq(2L, 3L, 0L, 0.0),
        Seq(3L, 4L, 3L, 0.75)),
      "doc_id", "n_grams", "n_novel", "novelty")
  }

  test("profile: exact discrete quantiles from the value histogram " +
    "(percentile_disc rank rule, duplicates collapse into one bucket)") {
    // stratum a: values 1..10 -> p50 = 5 (ceil(0.5*10)=5th), p90 = 9,
    // p99 = 10; stratum b: 7,7,7,100 -> n=4, p50 = 7 (rank 2), p90 = 100
    // (rank 4), min 7, max 100, mean 121/4
    val df = ((1 to 10).map(v => ("a", v.toLong)) ++
      Seq(("b", 7L), ("b", 7L), ("b", 7L), ("b", 100L)))
      .toDF("src", "v")
    val out = Corpus.profile(df, "src", $"v")
    assertFrame(out,
      Seq(Seq("a", 10L, 55L, 1L, 10L, 5.5, 5L, 9L, 10L),
        Seq("b", 4L, 121L, 7L, 100L, 30.25, 7L, 100L, 100L)),
      "src", "n_docs", "total", "min_v", "max_v", "mean_v", "p50", "p90", "p99")
  }

  test("capPerKey keeps at most cap rows per key, deterministically, " +
    "with a map-side WindowGroupLimit pre-prune") {
    val df = (1L to 25L).map(i => (i, if (i <= 20) "big" else "small"))
      .toDF("id", "dom")
    val out = Corpus.capPerKey(df, "dom", "id", cap = 3)
    val counts = out.groupBy($"dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("big" -> 3L, "small" -> 3L))
    // deterministic under re-execution (hash order, no RNG)
    assert(rowsOf(out) == rowsOf(Corpus.capPerKey(df, "dom", "id", cap = 3)))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter must pre-prune before the exchange:\n$plan")
  }

  test("c4QualityFilter: each line and page rule in isolation") {
    val kept3 = "one good line with five words.\n" +
      "two good line with five words.\nthree good line with five words."
    val df = Seq(
      (1L, kept3),                                       // 3 kept -> page keep
      (2L, kept3 + "\nshort line."),                     // word floor drops l4
      (3L, kept3 + "\nno terminal punctuation on this line"),
      (4L, kept3 + "\nplease enable javascript to continue."),
      (5L, kept3 + "\nlorem ipsum dolor sit amet today."),  // page poison
      (6L, kept3 + "\na curly { brace poisons the page."),  // page poison
      (7L, "only two kept lines here today.\nsecond kept line is here now."),
      (8L, ""),                                          // empty doc
      (9L, "ends with a quote as terminal \""))
      .toDF("doc_id", "text")
    val out = Corpus.c4QualityFilter(df, "doc_id", "text")
    assertFrame(out,
      Seq(
        Seq(1L, 3L, 3L, true),
        Seq(2L, 4L, 3L, true),   // dropped line doesn't kill the page
        Seq(3L, 4L, 3L, true),
        Seq(4L, 4L, 3L, true),   // javascript line dropped, page survives
        Seq(5L, 4L, 4L, false),  // lorem ipsum kills the page
        Seq(6L, 4L, 4L, false),  // curly brace kills the page
        Seq(7L, 2L, 2L, false),  // under the 3-kept-line floor
        Seq(8L, 0L, 0L, false),
        Seq(9L, 1L, 1L, false)), // quote counts as terminal punctuation
      "doc_id", "n_lines", "n_kept", "page_keep")
  }

  test("duplicatedSpans: all-but-first window occurrences merge into " +
    "maximal token spans") {
    val base = "a b c d e f g h"            // one exact 8-token window
    val df = Seq(
      // 19 tokens; the window at p=11 repeats the one at p=0 -> [11,19)
      (1L, s"$base x y z $base"),
      // whole doc duplicates doc 1's first window -> [0,8)
      (2L, base),
      // shorter than the window -> contributes nothing
      (3L, "q w e r t"),
      // 9 tokens: window p=0 duplicates doc 1, p=1 ('b..i') is novel
      (4L, s"$base i"),
      // exact copy of doc 1: every one of its 12 windows is removable
      // and they chain into ONE maximal span [0,19)
      (5L, s"$base x y z $base"))
      .toDF("doc_id", "text")
    val out = Corpus.duplicatedSpans(df, "doc_id", "text", n = 8)
    assertFrame(out,
      Seq(Seq(1L, 11L, 19L, 1L), Seq(2L, 0L, 8L, 1L),
        Seq(4L, 0L, 8L, 1L), Seq(5L, 0L, 19L, 12L)),
      "doc_id", "span_start", "span_end", "n_dup_windows")
  }

  test("unicode normalization: NFC recomposes, NFKC folds compatibility " +
    "forms, normal text passes through, nulls stay null") {
    import graft.text.TextOps
    val df = Seq(
      (1L, "café"),        // e + combining acute -> U+00E9
      (2L, "plain ascii"),
      (3L, "ﬁle"),          // LATIN SMALL LIGATURE FI (NFKC -> "fi")
      (4L, null.asInstanceOf[String])).toDF("id", "text")
    val out = df.select($"id",
        TextOps.normalizeUnicode($"text").as("nfc"),
        TextOps.normalizeUnicode($"text", "NFKC").as("nfkc"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out(1L)._1 == "café" && out(1L)._2 == "café")
    assert(out(2L)._1 == "plain ascii")
    assert(out(3L)._1 == "ﬁle" && out(3L)._2 == "file")
    assert(out(4L)._1 == null && out(4L)._2 == null)
  }

  test("chunk: stride windows, clipped tail, empty doc keeps one row") {
    val df = Seq(
      (1L, "abcdefghij"),   // len 10, size 6 stride 4 -> starts 0, 4
      (2L, "abcdef"),       // exact fit -> one chunk
      (3L, "ab"),           // shorter than size -> one chunk
      (4L, "")              // empty -> one empty chunk
    ).toDF("doc_id", "text")
    val out = Corpus.chunk(df, size = 6, overlap = 2)
    assertFrame(out, Seq(
      Seq(1L, 0L, 0L, "abcdef"), Seq(1L, 1L, 4L, "efghij"),
      Seq(2L, 0L, 0L, "abcdef"),
      Seq(3L, 0L, 0L, "ab"),
      Seq(4L, 0L, 0L, "")),
      "doc_id", "chunk_id", "chunk_start", "chunk_text")
  }

  test("chunk: last window reaches the end exactly once past a boundary") {
    // len 11, size 6, stride 4: starts 0, 4, 8 (8+6 covers 11)
    val df = Seq((1L, "abcdefghijk")).toDF("doc_id", "text")
    val out = Corpus.chunk(df, size = 6, overlap = 2)
    assertFrame(out, Seq(
      Seq(1L, 0L, 0L, "abcdef"), Seq(1L, 1L, 4L, "efghij"),
      Seq(1L, 2L, 8L, "ijk")),
      "doc_id", "chunk_id", "chunk_start", "chunk_text")
  }

  test("mixBySource: integer weights copy, fractions sample " +
    "deterministically, absent sources drop") {
    val df = (0L until 40L).map(i =>
      (i, if (i < 20) "a" else if (i < 30) "b" else "zzz"))
      .toDF("doc_id", "source")
    val out = Corpus.mixBySource(df, Map("a" -> 2.5, "b" -> 1.0))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // source b: exactly one epoch per doc (frac 0 adds nothing)
    assert(out.count(_._2 == "b") == 10)
    assert(out.filter(_._2 == "b").forall(_._3 == 0L))
    // source zzz: dropped entirely
    assert(!out.exists(_._2 == "zzz"))
    // source a: epochs 0 and 1 are full copies; epoch 2 is the ~50%
    // md5 sample — deterministic, so two runs agree exactly
    val a = out.filter(_._2 == "a")
    assert(a.count(_._3 == 0L) == 20 && a.count(_._3 == 1L) == 20)
    val frac = a.filter(_._3 == 2L).map(_._1).toSet
    assert(frac.nonEmpty && frac.size < 20, s"fractional epoch size ${frac.size}")
    val again = Corpus.mixBySource(df, Map("a" -> 2.5, "b" -> 1.0))
      .filter($"epoch" === 2L).select("doc_id").as[Long].collect().toSet
    assert(again == frac)
    // monotone: a larger fractional rate keeps every rate-0.5 row
    val larger = Corpus.mixBySource(df, Map("a" -> 2.75))
      .filter($"epoch" === 2L).select("doc_id").as[Long].collect().toSet
    assert(frac.subsetOf(larger))
  }

  test("temperatureWeights: alpha<1 upweights small sources, expected " +
    "mass hits the target, alpha=1 is proportional") {
    // 160 'big' docs vs 10 'small'
    val df = (0L until 170L).map(i => (i, if (i < 160) "big" else "small"))
      .toDF("doc_id", "source")
    val w = Corpus.temperatureWeights(df, targetRows = 340L, alpha = 0.5)
    // expected output mass = sum over sources of m_s * n_s ~ target
    val mass = w("big") * 160 + w("small") * 10
    assert(math.abs(mass - 340.0) < 1e-6, s"mass=$mass")
    // rebalancing: small source's per-doc multiplicity exceeds big's
    // by ~sqrt(160/10) = 4x
    val ratio = w("small") / w("big")
    assert(ratio > 3.9 && ratio < 4.1, s"ratio=$ratio")
    // alpha=1: every doc gets the same multiplicity (pure scaling)
    val w1 = Corpus.temperatureWeights(df, targetRows = 340L, alpha = 1.0)
    assert(math.abs(w1("small") / w1("big") - 1.0) < 1e-6)
    // determinism end to end through the mixture
    val m1 = Corpus.mixByTemperature(df, 340L).collect().map(_.toSeq).toSet
    val m2 = Corpus.mixByTemperature(df, 340L).collect().map(_.toSeq).toSet
    assert(m1 == m2 && m1.nonEmpty)
  }

  test("shuffleShards: a deterministic permutation — every row exactly " +
      "once, contiguous 1-based positions per shard, salt-independent " +
      "orders, stable across repartitionings") {
    val df = (1L to 500L).map(i => (i, s"doc$i")).toDF("id", "text")
    val out = Corpus.shuffleShards(df, "id", nShards = 8, salt = "s1")
    val rows = out.select($"id", $"shard", $"shard_pos")
      .as[(Long, Int, Long)].collect()
    assert(rows.length == 500 && rows.map(_._1).distinct.length == 500)
    assert(rows.forall(r => r._2 >= 0 && r._2 < 8))
    // per-shard positions are exactly 1..|shard|
    rows.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._3).sorted.sameElements(1L to g.length.toLong)) }
    // content-addressed: identical under a different physical layout
    val again = Corpus.shuffleShards(df.repartition(7), "id", 8, "s1")
      .select($"id", $"shard", $"shard_pos").as[(Long, Int, Long)]
      .collect().sortBy(_._1)
    assert(again.sameElements(rows.sortBy(_._1)))
    // a different salt is a genuinely different permutation
    val other = Corpus.shuffleShards(df, "id", 8, "s2")
      .select($"id", $"shard", $"shard_pos").as[(Long, Int, Long)]
      .collect().sortBy(_._1)
    assert(!other.sameElements(rows.sortBy(_._1)))
  }

  test("writeShards: shard-partitioned layout, rows inside a shard file " +
      "in shuffled read order") {
    val df = (1L to 300L).map(i => (i, s"d$i")).toDF("id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft-shards")
      .resolve("out").toString
    Corpus.writeShards(df, "id", nShards = 4, path)
    val back = spark.read.parquet(path)
    assert(back.count() == 300)
    assert(back.select("shard").distinct().count() == 4)
    // within one shard partition the file order IS shard_pos order
    val one = spark.read.parquet(s"$path/shard=2")
      .select($"shard_pos").as[Long].collect()
    assert(one.sameElements(one.sorted))
    // and the relation matches shuffleShards exactly
    val expect = Corpus.shuffleShards(df, "id", 4)
      .select($"id", $"shard", $"shard_pos").as[(Long, Int, Long)]
      .collect().toSet
    val got = back.select($"id", $"shard".cast("int"), $"shard_pos")
      .as[(Long, Int, Long)].collect().toSet
    assert(got == expect)
  }

  test("splitByGroup: group-atomic, exhaustive, fraction-monotone") {
    val df = (1L to 400L).map(i => (i, s"host${i % 40}")).toDF("id", "host")
    val out = Corpus.splitByGroup(df, "host",
      Seq("train" -> 0.7, "val" -> 0.15, "test" -> 0.15))
    // every row lands in exactly one split (exhaustive cuts)
    assert(out.filter($"split".isNull).count() == 0)
    assert(out.count() == 400)
    // group-atomic: one split per host
    val perHost = out.groupBy($"host")
      .agg(countDistinct($"split").as("n")).filter($"n" =!= 1).count()
    assert(perHost == 0)
    // monotone: widening the train fraction never evicts a train group
    val narrow = Corpus.splitByGroup(df, "host",
        Seq("train" -> 0.5, "rest" -> 0.5))
      .filter($"split" === "train").select($"host").distinct()
      .as[String].collect().toSet
    val wide = Corpus.splitByGroup(df, "host",
        Seq("train" -> 0.7, "rest" -> 0.3))
      .filter($"split" === "train").select($"host").distinct()
      .as[String].collect().toSet
    assert(narrow.subsetOf(wide))
    // deterministic across repartitionings
    val re = Corpus.splitByGroup(df.repartition(7), "host",
      Seq("train" -> 0.7, "val" -> 0.15, "test" -> 0.15))
    assert(re.select($"id", $"split").as[(Long, String)].collect().toSet ==
      out.select($"id", $"split").as[(Long, String)].collect().toSet)
  }

  test("keySkew: exact counts, integer shares, uniform key reads ~100") {
    // key 'a' x 60, 'b' x 30, 'c' x 10 -> total 100, 3 keys
    val df = (Seq.fill(60)("a") ++ Seq.fill(30)("b") ++ Seq.fill(10)("c"))
      .toDF("k")
    val out = Corpus.keySkew(df, "k", topK = 2).collect()
    assert(out.length == 2)
    assert(out(0).getString(0) == "a" && out(0).getLong(1) == 60L)
    assert(out(0).getLong(2) == 600000L) // 60e6/100
    assert(out(0).getLong(3) == 180L)    // 60*100*3/100: 1.8x mean
    assert(out(1).getString(0) == "b" && out(1).getLong(3) == 90L)
    // uniform distribution: every key's skew_x100 is exactly 100
    val uni = (1 to 4).flatMap(k => Seq.fill(25)(s"k$k")).toDF("k")
    val us = Corpus.keySkew(uni, "k", topK = 4).collect()
    assert(us.forall(_.getLong(3) == 100L))
  }

  test("cdcChunks: chunks tile the text exactly; shared content chunks " +
    "identically under shifted offsets; short/empty-doc edges") {
    val shared = "the quick brown fox jumps over the lazy dog and then " +
      "keeps running through the content defined chunking fixture text " +
      "until several chunk boundaries have certainly been crossed here"
    val df = Seq(
      (1L, "A" + shared),
      (2L, "completely different prefix of another length " + shared),
      (3L, "tiny"),       // shorter than the window: one whole chunk
      (4L, "")            // empty: no chunks
    ).toDF("id", "text")
    val out = Corpus.cdcChunks(df, "id", "text").collect()
    // tiling: per doc, starts are contiguous and lens sum to length
    Seq(1L, 2L, 3L).foreach { id =>
      val rows = out.filter(_.getLong(0) == id).sortBy(_.getLong(1))
      val text = df.filter($"id" === id).head().getString(1)
      assert(rows.head.getLong(1) == 0L)
      rows.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(1) + a.getLong(2) == b.getLong(1))
        case _ =>
      }
      assert(rows.map(_.getLong(2)).sum == text.length.toLong)
    }
    assert(out.count(_.getLong(0) == 3L) == 1) // single whole chunk
    assert(!out.exists(_.getLong(0) == 4L))    // empty doc silent
    // the CDC property: docs 1 and 2 share interior chunk hashes even
    // though the shared block sits at different offsets
    val h1 = out.filter(_.getLong(0) == 1L).map(_.getString(3)).toSet
    val h2 = out.filter(_.getLong(0) == 2L).map(_.getString(3)).toSet
    assert((h1 & h2).nonEmpty,
      "shifted shared content must realign on identical chunks")
    // determinism under repartitioning
    val re = Corpus.cdcChunks(df.repartition(5), "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
    assert(re == out.map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet)
    // plan contract: the r12 rolling-hash kernel made CDC a pure
    // map-side projection + generate — NO exchange anywhere (r11's
    // scan shuffled boundary rows through a distinct + window)
    val plan = Corpus.cdcChunks(df, "id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"CDC plan must not shuffle:\n$plan")
    // rolling update == direct window sum (the oracle's form), checked
    // on a 300-char fixture at every position via a brute replay
    val probe = (0 until 300).map(i => ('a' + (i * 7 + i * i % 13) % 26).toChar)
      .mkString
    val eng = Corpus.cdcChunks(Seq((9L, probe)).toDF("id", "text"), "id", "text")
      .collect().map(_.getLong(1)).sorted
    val M = 2147483647L; val P = 1000003L
    val direct = (16 to probe.length - 1).filter { p =>
      val win = probe.substring(p - 16, p)
      val h = win.foldLeft(0L)((acc, c) => (acc * P + c.toLong) % M)
      h % 64 == 0
    }.map(_.toLong)
    assert(eng.toSeq == (0L +: direct).sorted,
      s"engine starts ${eng.toSeq} vs direct-sum bounds $direct")
  }

  test("snapshotDelta: added/removed/changed only, unchanged silent, " +
    "null text is empty-content presence") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c"),
      (4L, null.asInstanceOf[String])).toDF("id", "text")
    val neu = Seq((1L, "a"), (2L, "B2"), (5L, "e"),
      (4L, "now present")).toDF("id", "text")
    val out = Corpus.snapshotDelta(old, neu, "id", "text")
      .as[(Long, String)].collect().toSet
    // 1 unchanged (silent), 2 changed, 3 removed, 5 added,
    // 4: null -> real text = changed (NOT added)
    assert(out == Set((2L, "changed"), (3L, "removed"),
      (5L, "added"), (4L, "changed")))
    // identical snapshots -> empty delta
    assert(Corpus.snapshotDelta(old, old, "id", "text").isEmpty)
  }

  test("adaptiveQualityFilter: per-group floor(keepPpm*n/1e6) kept, " +
    "best scores first, ties on id") {
    val df = Seq(
      // lang en: scores 10,20,30,40,50 -> keep 60% = 3 (50,40,30)
      (1L, "en", 10L), (2L, "en", 20L), (3L, "en", 30L),
      (4L, "en", 40L), (5L, "en", 50L),
      // lang fr: all tie at 7 -> keep floor(0.6*3)=1, lowest id wins
      (6L, "fr", 7L), (7L, "fr", 7L), (8L, "fr", 7L)
    ).toDF("id", "lang", "score")
    val out = Corpus.adaptiveQualityFilter(df, "lang", "score", "id",
        keepPpm = 600000L)
      .select($"id").as[Long].collect().toSet
    assert(out == Set(3L, 4L, 5L, 6L))
    // keepPpm=1e6 keeps everything; 0 keeps nothing
    assert(Corpus.adaptiveQualityFilter(df, "lang", "score", "id",
      1000000L).count() == 8)
    assert(Corpus.adaptiveQualityFilter(df, "lang", "score", "id",
      0L).count() == 0)
  }
}
