package graft

import org.apache.spark.sql.functions._

import graft.text.ProfileIndex

/** Incremental corpus-profile index: exact count/moment merging, HLL
  * estimates tracking the one-shot profile within the sketch tolerance
  * (NOT bitwise — DataSketches HLL union of partials need not equal a
  * directly-built sketch), and batching invariance of the exact
  * columns under any split of the corpus. */
class ProfileIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0 until 600).map { i =>
    val src = if (i % 3 == 0) "web" else "book"
    // vocabulary overlaps across docs: ~120 distinct tokens per source
    val text = (0 until 5 + i % 7)
      .map(j => s"w${(i * 7 + j * 13) % 120}").mkString(" ")
    (i.toLong, src, text)
  }.toDF("doc_id", "source", "text")

  private def freshPath(tag: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"profidx-$tag").toFile
    d.delete(); d.getAbsolutePath
  }

  test("exact columns: counts, sums, extrema match a direct computation") {
    val p = freshPath("exact")
    ProfileIndex.writeProfileIndex(
      corpus.filter($"doc_id" < 200), "source", "text", p)
    ProfileIndex.appendProfileIndex(
      corpus.filter($"doc_id" >= 200 && $"doc_id" < 400), "source", "text", p)
    ProfileIndex.appendProfileIndex(
      corpus.filter($"doc_id" >= 400), "source", "text", p)
    val prof = ProfileIndex.readProfile(spark, p)
      .orderBy("stratum").collect()

    val expect = corpus
      .select($"source".as("stratum"), length($"text").cast("long").as("nc"),
        size(graft.text.TextOps.tokens($"text")).cast("long").as("nt"))
      .groupBy("stratum")
      .agg(count(lit(1)).as("n_docs"), sum("nc").as("n_chars"),
        sum("nt").as("n_tokens"), min("nt").as("tok_min"),
        max("nt").as("tok_max"))
      .orderBy("stratum").collect()

    assert(prof.length == 2)
    prof.zip(expect).foreach { case (got, exp) =>
      assert(got.getString(0) == exp.getString(0))
      (1 to 5).foreach(i => assert(got.getLong(i) == exp.getLong(i),
        s"col $i of ${got.getString(0)}"))
    }
  }

  test("HLL tolerance: incremental merge tracks one-shot, estimates sane") {
    val p = freshPath("hll")
    ProfileIndex.writeProfileIndex(
      corpus.filter($"doc_id" % 2 === 0), "source", "text", p)
    ProfileIndex.appendProfileIndex(
      corpus.filter($"doc_id" % 2 =!= 0), "source", "text", p)
    val incr = ProfileIndex.readProfile(spark, p)
    val once = ProfileIndex.profileOneShot(corpus, "source", "text")
    // exact columns identical; estimates within the sketch envelope of
    // one-shot (union-of-partials vs direct sketch may diverge slightly)
    assertProfilesAgree(incr, once)

    // estimates near truth: below the ~2^lgK coupon-promotion threshold
    // the sketch is a coupon set, but the estimator is bias-corrected,
    // not a raw coupon count — allow its documented ~2% envelope
    def near(est: Long, truth: Long, what: String): Unit =
      assert(math.abs(est - truth) <= math.max(2L, (truth * 0.02).toLong),
        s"$what: est=$est truth=$truth")
    val truth = corpus
      .select($"source", explode(graft.text.TextOps.tokens($"text")).as("t"))
      .groupBy("source").agg(countDistinct($"t").as("v"))
      .as[(String, Long)].collect().toMap
    incr.select("stratum", "vocab_est").as[(String, Long)].collect()
      .foreach { case (s, est) => near(est, truth(s), s"vocab of $s") }
    // docs_hll counts distinct texts (exact-dup-insensitive)
    val dtruth = corpus.groupBy("source")
      .agg(countDistinct($"text").as("d")).as[(String, Long)].collect().toMap
    incr.select("stratum", "docs_est").as[(String, Long)].collect()
      .foreach { case (s, est) => near(est, dtruth(s), s"docs of $s") }
  }

  test("batching invariance: 2-batch and 5-batch splits agree with one-shot") {
    val one = ProfileIndex.profileOneShot(corpus, "source", "text")
    Seq(2, 5).foreach { nb =>
      val p = freshPath(s"b$nb")
      ProfileIndex.writeProfileIndex(
        corpus.filter($"doc_id" % nb === 0), "source", "text", p)
      (1 until nb).foreach(i => ProfileIndex.appendProfileIndex(
        corpus.filter($"doc_id" % nb === i), "source", "text", p))
      val merged = ProfileIndex.readProfile(spark, p)
      assertProfilesAgree(merged, one, s"$nb-batch split")
    }
  }

  /** Exact columns bitwise equal; estimate columns within the sketch
    * envelope (5% relative, floor of 2 absolute) — the txt_profile_incr
    * gate's contract. */
  private def assertProfilesAgree(got: org.apache.spark.sql.DataFrame,
                                  exp: org.apache.spark.sql.DataFrame,
                                  tag: String = ""): Unit = {
    val exactCols = Seq("stratum", "n_docs", "n_chars", "n_tokens",
      "tok_min", "tok_max").map(col)
    val ge = got.select(exactCols: _*)
    val ee = exp.select(exactCols: _*)
    assert(ge.exceptAll(ee).isEmpty && ee.exceptAll(ge).isEmpty,
      s"$tag exact columns diverged")
    val g = got.select($"stratum", $"vocab_est", $"docs_est")
      .as[(String, Long, Long)].collect()
      .map { case (s, v, d) => s -> (v, d) }.toMap
    val e = exp.select($"stratum", $"vocab_est", $"docs_est")
      .as[(String, Long, Long)].collect()
      .map { case (s, v, d) => s -> (v, d) }.toMap
    assert(g.keySet == e.keySet, s"$tag strata diverged")
    def near(a: Long, b: Long, what: String): Unit =
      assert(math.abs(a - b) <= math.max(2L, (b * 0.05).toLong),
        s"$tag $what: got=$a expected~$b")
    g.foreach { case (s, (v, d)) =>
      near(v, e(s)._1, s"vocab of $s"); near(d, e(s)._2, s"docs of $s")
    }
  }

  test("null text: counted as a 0-char 0-token doc, absent from sketches") {
    val df = Seq((1L, "s", "alpha beta"), (2L, "s", null), (3L, "s", "alpha"))
      .toDF("doc_id", "source", "text")
    val prof = ProfileIndex.profileOneShot(df, "source", "text").collect()(0)
    assert(prof.getAs[Long]("n_docs") == 3L)
    assert(prof.getAs[Long]("n_tokens") == 3L)
    assert(prof.getAs[Long]("tok_min") == 0L)
    assert(prof.getAs[Long]("vocab_est") == 2L) // alpha, beta
    assert(prof.getAs[Long]("docs_est") == 2L)  // two non-null texts
  }
}
