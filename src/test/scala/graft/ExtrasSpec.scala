package graft

import graft.ops.Extras
import org.apache.spark.sql.functions._

class ExtrasSpec extends SparkSpec {
  import spark.implicits._

  test("binnify tiles chromosomes, clips the last bin (extras.py:125-167)") {
    val cs = Seq(("chr1", 250L), ("chr2", 100L)).toDF("chrom", "length")
    val out = Extras.binnify(cs, 100L, relIds = true)
    assertFrame(out, Seq(
      Seq("chr1", 0L, 100L, 0L), Seq("chr1", 100L, 200L, 1L),
      Seq("chr1", 200L, 250L, 2L), Seq("chr2", 0L, 100L, 0L)),
      "chrom", "start", "end", "rel_id")
  }

  test("makeChromarms splits at mid; missing mid -> whole chrom") {
    val cs = Seq(("chr1", 100L), ("chrM", 16L)).toDF("chrom", "length")
    val mids = Seq(("chr1", 30L)).toDF("chrom", "mid")
    val out = Extras.makeChromarms(cs, mids)
    assertFrame(out, Seq(
      Seq("chr1", 0L, 30L, "chr1_p"), Seq("chr1", 30L, 100L, "chr1_q"),
      Seq("chrM", 0L, 16L, "chrM")), "chrom", "start", "end", "name")
  }

  test("pairByDistance midpoint band (extras.py:389-543)") {
    // mids: 5, 25, 55, 105
    val df = Seq(("chr1", 0L, 10L, "a"), ("chr1", 20L, 30L, "b"),
      ("chr1", 50L, 60L, "c"), ("chr1", 100L, 110L, "d"))
      .toDF("chrom", "start", "end", "name")
    val out = Extras.pairByDistance(df, minSep = 10L, maxSep = 40L,
      suffixes = ("_1", "_2"), binSize = 16)
    assertFrame(out.select($"name_1", $"name_2"),
      Seq(Seq("a", "b"), Seq("b", "c")), "name_1", "name_2")
  }

  test("jaccardIntervals: hand-computed overlap/union, internal overlap " +
    "merged away, empty intersection yields 0 and null jaccard") {
    // a: [0,10)+[5,15) merge to [0,15); [30,40). b: [10,20), [35,50)
    val a = Seq(("chr1", 0L, 10L), ("chr1", 5L, 15L), ("chr1", 30L, 40L))
      .toDF("chrom", "start", "end")
    val b = Seq(("chr1", 10L, 20L), ("chr1", 35L, 50L))
      .toDF("chrom", "start", "end")
    // inter = [10,15)=5 + [35,40)=5 = 10; bp_a=25, bp_b=25, union=40
    val r = Extras.jaccardIntervals(a, b, binSize = 16).head()
    assert(r.getLong(0) == 10L && r.getLong(1) == 40L)
    assert(math.abs(r.getDouble(2) - 0.25) < 1e-15 && r.getLong(3) == 2L)
    val disjoint = Extras.jaccardIntervals(a,
      Seq(("chr2", 0L, 5L)).toDF("chrom", "start", "end"), binSize = 16).head()
    assert(disjoint.getLong(0) == 0L && disjoint.getLong(1) == 30L &&
      disjoint.isNullAt(2) == false) // 0/30 = 0.0, not null
    assert(disjoint.getDouble(2) == 0.0)
  }

  test("multiIntersect: runs labelled by the number of covering SETS, " +
    "internal overlap within a set counted once") {
    // set A [0,10)+[5,15) merges to [0,15); set B [8,20)
    val a = Seq(("c1", 0L, 10L), ("c1", 5L, 15L)).toDF("chrom", "start", "end")
    val b = Seq(("c1", 8L, 20L)).toDF("chrom", "start", "end")
    assertFrame(Extras.multiIntersect(Seq(a, b), bucketSize = 8),
      Seq(Seq("c1", 0L, 8L, 1L), Seq("c1", 8L, 15L, 2L),
        Seq("c1", 15L, 20L, 1L)),
      "chrom", "start", "end", "n_sets")
  }

  test("coverageHistogram: hand-computed depth bands incl. the depth-0 " +
    "chromsizes remainder") {
    // chr1 [0,10)+[5,15): depth 1 on [0,5)+[10,15)=10, depth 2 on [5,10)=5
    // chr2 [20,30): depth 1 on 10 more. genome = 2*100 = 200 -> depth0 175
    val df = Seq(("chr1", 0L, 10L), ("chr1", 5L, 15L), ("chr2", 20L, 30L))
      .toDF("chrom", "start", "end")
    val cs = Seq(("chr1", 100L), ("chr2", 100L)).toDF("chrom", "length")
    val out = Extras.coverageHistogram(df, cs, bucketSize = 8)
    assertFrame(out.select($"depth", $"n_bases"),
      Seq(Seq(0L, 175L), Seq(1L, 20L), Seq(2L, 5L)), "depth", "n_bases")
    val fr = out.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(fr(2L) == 5.0 / 200.0 && fr(0L) == 175.0 / 200.0)
  }

  test("relDistance: hand-computed flanks, coincident midpoint = 0, " +
    "missing flank drops the row") {
    val a = Seq((1L, "chr1", 10L, 20L),   // mid 15: flanks 5 and 18
      (2L, "chr1", 16L, 20L),             // mid 18: coincident with b mid
      (3L, "chr1", 0L, 2L),               // mid 1: no upstream b -> drop
      (4L, "chr2", 0L, 10L))              // chrom with no b at all -> drop
      .toDF("id", "chrom", "start", "end")
    val b = Seq(("chr1", 0L, 10L),        // mid 5
      ("chr1", 16L, 20L),                 // mid 18
      ("chr1", 25L, 35L))                 // mid 30
      .toDF("chrom", "start", "end")
    val out = Extras.relDistance(a, b, binSize = 16)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((10L, 3L, 3.0 / 13.0)))
    assert(out(2L) == ((0L, 0L, 0.0)))
  }

  test("pairByDistance intervening count filter") {
    val df = Seq(("chr1", 0L, 2L, "a"), ("chr1", 10L, 12L, "b"),
      ("chr1", 20L, 22L, "c")).toDF("chrom", "start", "end", "name")
    // a..c are 20 apart with b intervening; maxIntervening=0 kills (a,c)
    val all = Extras.pairByDistance(df, 5L, 25L, suffixes = ("_1", "_2"),
      binSize = 16)
    assert(all.count() == 3)
    val strict = Extras.pairByDistance(df, 5L, 25L,
      maxIntervening = Some(0L), suffixes = ("_1", "_2"), binSize = 16)
    assertFrame(strict.select($"name_1", $"name_2"),
      Seq(Seq("a", "b"), Seq("b", "c")), "name_1", "name_2")
  }

  test("markRuns / mergeRuns on a bedGraph-like frame (extras.py:546-735)") {
    val df = Seq(
      ("chr1", 0L, 100L, 1L), ("chr1", 100L, 200L, 1L), ("chr1", 200L, 300L, 1L),
      ("chr1", 300L, 400L, 2L), ("chr1", 400L, 500L, 2L), ("chr1", 500L, 600L, 2L))
      .toDF("chrom", "start", "end", "value")
    val marked = Extras.markRuns(df, "value")
    assertFrame(marked.select($"start", $"run"),
      Seq(Seq(0L, 0L), Seq(100L, 0L), Seq(200L, 0L),
        Seq(300L, 1L), Seq(400L, 1L), Seq(500L, 1L)), "start", "run")
    val merged = Extras.mergeRuns(df, "value",
      agg = Map("vsum" -> sum(col("value"))))
    assertFrame(merged, Seq(
      Seq("chr1", 0L, 300L, 1L, 3L), Seq("chr1", 300L, 600L, 2L, 6L)),
      "chrom", "start", "end", "value", "vsum")
  }

  test("pileup: stepwise depth with overlaps, gaps, and points") {
    val df = Seq(("chr1", 0L, 10L), ("chr1", 5L, 15L), ("chr1", 20L, 25L),
      ("chr1", 7L, 7L)).toDF("chrom", "start", "end")
    val out = Extras.pileup(df)
    assertFrame(out, Seq(
      Seq("chr1", 0L, 5L, 1L), Seq("chr1", 5L, 7L, 2L),
      Seq("chr1", 7L, 10L, 2L), Seq("chr1", 10L, 15L, 1L),
      Seq("chr1", 15L, 20L, 0L), Seq("chr1", 20L, 25L, 1L)),
      "chrom", "start", "end", "depth")
  }

  test("markRuns breaks runs at spatial gaps even with equal values") {
    val df = Seq(("chr1", 0L, 100L, 1L), ("chr1", 150L, 250L, 1L))
      .toDF("chrom", "start", "end", "value")
    assert(Extras.markRuns(df, "value").select("run").distinct().count() == 2)
  }

  test("markRuns with overlapping input: overlapping same-value rows " +
    "continue the run (reference test_extras.py:353-386, " +
    "allow_overlaps=True; this engine's validation is opt-in so no " +
    "eager refusal)") {
    val df = Seq(
      ("chr1", 85563L, 129897L, "c"), ("chr1", 129897L, 508340L, "c"),
      ("chr1", 508340L, 620903L, "c"),
      ("chr1", 620904L, 688020L, "c"),    // 1bp gap -> new run
      ("chr1", 688020L, 858415L, "b"),    // value change -> new run
      ("chr1", 700000L, 900000L, "b"),    // overlaps previous, same value
      ("chr2", 548402L, 639680L, "a"), ("chr2", 639680L, 1026586L, "b"),
      ("chr3", 260538L, 272930L, "c"), ("chr3", 272930L, 470969L, "c"),
      ("chr3", 470969L, 502336L, "c"))
      .toDF("chrom", "start", "end", "name")
    val runs = Extras.markRuns(df, "name")
      .orderBy($"chrom", $"start", $"end")
      .select($"chrom", $"start", $"run")
    assertFrame(runs, Seq(
      Seq("chr1", 85563L, 0L), Seq("chr1", 129897L, 0L),
      Seq("chr1", 508340L, 0L), Seq("chr1", 620904L, 1L),
      Seq("chr1", 688020L, 2L), Seq("chr1", 700000L, 2L),
      Seq("chr2", 548402L, 0L), Seq("chr2", 639680L, 1L),
      Seq("chr3", 260538L, 0L), Seq("chr3", 272930L, 0L),
      Seq("chr3", 470969L, 0L)), "chrom", "start", "run")
  }

  test("stackIntervals assigns greedy first-fit levels per chrom " +
    "(reference arrops.py:773-798)") {
    val df = Seq(
      ("chr1", 0L, 5L, "a"), ("chr1", 2L, 3L, "b"), ("chr1", 3L, 8L, "c"),
      ("chr1", 8L, 10L, "d"), ("chr2", 0L, 4L, "e"), ("chr1", 4L, 4L, "pt"))
      .toDF("chrom", "start", "end", "name")
    val out = Extras.stackIntervals(df)
    val levels = out.collect()
      .map(r => r.getAs[String]("name") -> r.getAs[Int]("level")).toMap
    // sweep: a@0 -> L0; b@2 -> L1; b ends @3 (before c starts) -> c@3 -> L1;
    // point pt@[4,5) -> L2 (a,c live); a ends @5; c ends @8; d@8 -> L0;
    // chr2 resets: e -> L0
    assert(levels == Map("a" -> 0, "b" -> 1, "c" -> 1, "pt" -> 2,
      "d" -> 0, "e" -> 0))
  }
}

class TextDedupSpec extends SparkSpec {
  import graft.dedup.Dedup
  import graft.text.TextOps
  import spark.implicits._

  test("token/quality/langid expressions") {
    val df = Seq(
      (1L, "The cat and the dog sat on the mat, happily."),
      (2L, "Der Hund und die Katze sind nicht da."),
      (3L, ""),
      (4L, "xyzzy qwerty 12345"))
      .toDF("doc_id", "text")
    val out = df.select($"doc_id",
      TextOps.tokenCount($"text").as("n"),
      TextOps.langId($"text").as("lang"))
    assertFrame(out, Seq(
      Seq(1L, 10, "en"), Seq(2L, 8, "de"), Seq(3L, 0, "und"), Seq(4L, 3, "und")),
      "doc_id", "n", "lang")
  }

  test("fused langId equals the 12-regexp reference on adversarial text") {
    // exercises: \b subtleties (underscore and digits are word chars,
    // so the_le / le5 must NOT count their embedded markers), shared
    // markers counting for two languages (das: de+pt, una/con: es+it),
    // declaration-order tie resolution, Unicode neighbors as
    // boundaries, uppercase folding, null, empty, punctuation glue
    val texts = Seq(
      "The cat and the dog sat on the mat.",
      "Der Hund und die Katze sind nicht da.",
      "the_le le5 5le _the the_ no markers here",
      "das das das uma dos como mais",       // shared de/pt markers
      "una con una con",                      // es/it tie -> es
      "le la et THE AND OF to is that with",  // case folding + mixed
      "é le é la é et é est",                 // non-ASCII boundaries
      "the,and;of:to!is?that(with)for",       // punctuation boundaries
      "yang dan ini itu dengan",
      "", null, "12345 _ __ 999",
      "le||la||et||est, det som inte jag")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val both = df.select($"id",
      TextOps.langId($"text").as("fused"),
      TextOps.langIdRegex($"text").as("ref"))
      .collect()
    both.foreach(r => assert(r.getString(1) == r.getString(2),
      s"row ${r.getLong(0)}: fused=${r.getString(1)} ref=${r.getString(2)}"))
  }

  test("shingles builds distinct word 3-grams") {
    val df = Seq((1L, "a b c d b c d")).toDF("id", "t")
    val sh = df.select(explode(TextOps.shingles($"t", 3)).as("s"))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(sh == Seq("a b c", "b c d", "c d b", "d b c"))
  }

  test("exact dedup finds identical texts") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(df, "doc_id", "text")
    assertFrame(out.select($"doc_id", $"canonical_id", $"is_dup"),
      Seq(Seq(1L, 1L, false), Seq(2L, 1L, true), Seq(3L, 3L, false)),
      "doc_id", "canonical_id", "is_dup")
  }

  test("minhash LSH finds the near-dup pair that exact jaccard finds") {
    val base = (0 until 60).map(i => s"tok$i").mkString(" ")
    val near = (0 until 60).map(i => if (i == 30) "CHANGED" else s"tok$i").mkString(" ")
    val other = (100 until 160).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, base), (2L, near), (3L, other)).toDF("doc_id", "text")
    val exact = rowsOf(Dedup.ngramJaccardPairs(df, "doc_id", "text",
      threshold = 0.5).select($"id_1", $"id_2"))
    val lsh = rowsOf(Dedup.minhashLshPairs(df, "doc_id", "text",
      threshold = 0.5).select($"id_1", $"id_2"))
    assert(exact == Seq(Seq(1L, 2L)))
    assert(lsh == exact)
  }

  test("hot-shingle cap drops boilerplate without a forced broadcast") {
    // MANY hot shingles (every doc shares an 8-token boilerplate header
    // -> 6 distinct 3-grams each at df=30, over the cap of 10), plus two
    // docs sharing a rare 3-token tail. The anti-join must remove all
    // boilerplate shingles (VERDICT r13 #6: this path previously FORCED
    // a driver broadcast of the hot relation, unbounded on
    // boilerplate-heavy corpora; now AQE picks the join side by runtime
    // size) and the surviving pair must score on residual shingles only.
    val boiler = "hh0 hh1 hh2 hh3 hh4 hh5 hh6 hh7"
    val rows = (0 until 30).map { i =>
      val tail = if (i == 3 || i == 7) "rare x yz" else s"u$i v$i w$i"
      (i.toLong, s"$boiler $tail")
    }
    val df = rows.toDF("doc_id", "text")
    val out = Dedup.ngramJaccardPairs(df, "doc_id", "text", n = 3,
        maxShingleDf = Some(10L), maxCandidatePairs = Some(10000L))
      .select($"id_1", $"id_2", $"n_common", $"n_1", $"n_2")
    // 11 tokens -> 9 grams/doc: 6 pure-boilerplate (dropped at df=30)
    // + 3 tail-involving survivors; docs 3 and 7 share exactly those 3
    assertFrame(out, Seq(Seq(3L, 7L, 3L, 3L, 3L)),
      "id_1", "id_2", "n_common", "n_1", "n_2")
    // and the plan must carry no forced-broadcast hint on the anti-join
    val plan = Dedup.ngramJaccardPairs(df, "doc_id", "text", n = 3,
      maxShingleDf = Some(10L), maxCandidatePairs = None)
      .queryExecution.logical.toString
    assert(!plan.contains("UnresolvedHint"))
  }

  test("ngram candidate-pair budget fails fast on a stop-shingle corpus") {
    // every doc shares the same 3 tokens -> one shingle with df=40 ->
    // 40*39/2 = 780 candidate pairs; budget 100 must trip, and the
    // error must point at the audit path
    val df = (0 until 40).map(i => (i.toLong, "the same text"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.ngramJaccardPairs(df, "doc_id", "text",
        maxCandidatePairs = Some(100L)).count()
    }
    assert(e.getMessage.contains("780 candidate pairs"))
    assert(e.getMessage.contains("hotShingles"))
    // the same corpus under the default budget (or with the hot shingle
    // capped away) still works
    assert(Dedup.ngramJaccardPairs(df, "doc_id", "text",
      maxShingleDf = Some(10L), maxCandidatePairs = Some(100L)).count() == 0L)
  }

  test("incremental minhash equals the full recompute restricted to " +
    "batch-touching pairs, probing the index via a bucketed scan") {
    // near-dup pairs planted across the corpus/batch split (1,2), inside
    // the batch (4,6), and inside the corpus (3,5) — the last must NOT
    // appear in the incremental output
    val mk = (salt: Int, changed: Int) => (0 until 60)
      .map(i => if (i == changed) s"CH$salt" else s"tok${salt}_$i").mkString(" ")
    val df = Seq(
      (1L, mk(0, -1)), (2L, mk(0, 30)),       // corpus x batch near-dups
      (3L, mk(1, -1)), (5L, mk(1, 25)),       // corpus-internal near-dups
      (4L, mk(2, -1)), (6L, mk(2, 20)),       // batch-internal near-dups
      (7L, (0 until 60).map(i => s"uniq$i").mkString(" "))).toDF("doc_id", "text")
    val corpus = df.filter($"doc_id" % 2 === 1)
    val batch = df.filter($"doc_id" % 2 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_mhidx").toString
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", "mhidx_spec",
      s"$dir/idx", numBuckets = 4)
    val incr = Dedup.incrementalMinhashPairs(batch, df, "mhidx_spec",
      "doc_id", "text", threshold = 0.5)
    val got = rowsOf(incr.select($"id_1", $"id_2"))
    val full = rowsOf(Dedup.minhashLshPairs(df, "doc_id", "text",
        threshold = 0.5)
      .filter($"id_1" % 2 === 0 || $"id_2" % 2 === 0)
      .select($"id_1", $"id_2"))
    assert(got == Seq(Seq(1L, 2L), Seq(4L, 6L)))
    assert(got == full)
    // the candidate relation is lineage-cut (localCheckpoint) before
    // verification, so the bucketed index scan no longer appears in the
    // OUTPUT plan — assert the contract on the PRODUCTION candidate
    // relation (the exact function the probe checkpoints)
    val banded = Dedup.bandedRel(
      Dedup.minhashSigRel(batch, "doc_id", "text", 3, 48), 16, 3)
    val p = Dedup.candidateRel(banded, spark.table("mhidx_spec"))
      .queryExecution.executedPlan.toString
    assert(p.contains("Bucketed: true"),
      s"index probe did not use the bucketed scan:\n$p")
  }

  test("property: incremental minhash equals the full recompute " +
    "restricted to batch-touching pairs on random corpora") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // few salts -> families of near-dups (<= 2 changed tokens of 50,
    // jaccard well above threshold); change == -1 -> exact copies
    val genDocs: Gen[List[(Long, String)]] =
      Gen.choose(4, 12).flatMap { n =>
        Gen.listOfN(n, for {
          salt <- Gen.choose(0, 3)
          change <- Gen.choose(-1, 48)
        } yield (salt, change))
      }.map(_.zipWithIndex.map { case ((salt, ch), i) =>
        (i.toLong, (0 until 50).map(j =>
          if (j == ch) s"CH${salt}_$i" else s"tok${salt}_$j").mkString(" "))
      })
    val dir = java.nio.file.Files.createTempDirectory("graft_mhprop").toString
    var it = 0
    val prop = Prop.forAll(genDocs) { docs =>
      it += 1
      val df = docs.toDF("doc_id", "text")
      val corpus = df.filter($"doc_id" % 2 === 1)
      val batch = df.filter($"doc_id" % 2 === 0)
      Dedup.writeMinhashIndex(corpus, "doc_id", "text", s"mhprop_$it",
        s"$dir/idx$it", numBuckets = 2)
      val incr = rowsOf(Dedup.incrementalMinhashPairs(batch, df,
        s"mhprop_$it", "doc_id", "text", threshold = 0.5)
        .select($"id_1", $"id_2"))
      val full = rowsOf(Dedup.minhashLshPairs(df, "doc_id", "text",
          threshold = 0.5)
        .filter($"id_1" % 2 === 0 || $"id_2" % 2 === 0)
        .select($"id_1", $"id_2"))
      incr == full
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }

  test("simhash: near-identical docs within small hamming distance") {
    val base = (0 until 80).map(i => s"tok$i").mkString(" ")
    val near = base + " extraword"
    val far = (0 until 80).map(i => s"zzz$i").mkString(" ")
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val pairs = rowsOf(Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 3)
      .select($"id_1", $"id_2"))
    assert(pairs == Seq(Seq(1L, 2L)))
  }
}

class AnnSpec extends SparkSpec {
  import graft.ann.Ann
  import spark.implicits._

  private def vecs = {
    val rnd = new scala.util.Random(3)
    (0 until 50).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")
  }

  test("brute-force topk: ranks are ordered by cosine within each query") {
    val out = Ann.bruteForceTopK(vecs, vecs.filter($"vec_id" < 3), k = 5)
    assert(out.count() == 15)
    val byQuery = out.select("query_id", "rank", "cosine").collect()
      .groupBy(_.getLong(0))
    byQuery.values.foreach { rows =>
      val ordered = rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      assert(ordered == ordered.sorted.reverse)
    }
  }

  test("lsh topk cosines agree with brute force on shared pairs") {
    val bf = Ann.bruteForceTopK(vecs, vecs.filter($"vec_id" < 5), k = 50)
      .select($"query_id", $"neighbor_id", $"cosine".as("bf_cos"))
    val lsh = Ann.lshTopK(vecs, vecs.filter($"vec_id" < 5), k = 5, numPlanes = 4)
    val joined = lsh.join(bf, Seq("query_id", "neighbor_id"), "left")
    assert(joined.filter($"bf_cos".isNull).count() == 0)
    assert(joined.filter(abs($"cosine" - $"bf_cos") > 1e-12).count() == 0)
  }

  test("ivf centroids are deterministic across recomputation") {
    val c1 = Ann.ivfCentroids(vecs, k = 4)
    val c2 = Ann.ivfCentroids(vecs, k = 4)
    assert(c1.length == 4)
    assert(c1.map(_._1).toSeq == c2.map(_._1).toSeq)
    c1.zip(c2).foreach { case ((_, a), (_, b)) => assert(a.sameElements(b)) }
  }

  test("ivf assignment is total and picks the nearest centroid") {
    val cs = Ann.ivfCentroids(vecs, k = 4)
    val asg = Ann.ivfAssign(vecs, cs).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(asg.size == 50)
    val raw = vecs.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    raw.foreach { case (id, v) =>
      val best = cs.map { case (cid, cv) => (d2(v, cv), cid) }.min._2
      assert(asg(id) == best, s"vec $id")
    }
  }

  test("centroid and PQ-book model artifacts round-trip bit-exactly and " +
    "drive identical queries") {
    val d = java.nio.file.Files.createTempDirectory("graft_model").toString
    val cs = Ann.ivfCentroids(vecs, k = 4)
    Ann.saveCentroids(spark, cs, s"$d/cents")
    val cs2 = Ann.loadCentroids(spark, s"$d/cents")
    assert(cs.map(_._1).sameElements(cs2.map(_._1)))
    cs.zip(cs2).foreach { case ((_, a), (_, b)) => assert(a.sameElements(b)) }
    val fresh = Ann.ivfTopK(vecs, vecs.filter($"vec_id" < 3), k = 3,
      kCentroids = 4, cents = Some(cs))
    val loaded = Ann.ivfTopK(vecs, vecs.filter($"vec_id" < 3), k = 3,
      kCentroids = 4, cents = Some(cs2))
    assert(fresh.exceptAll(loaded).isEmpty && loaded.exceptAll(fresh).isEmpty)
    val books = Ann.pqCodebooks(vecs, m = 4, k = 4)
    Ann.savePqBooks(spark, books, s"$d/books")
    val books2 = Ann.loadPqBooks(spark, s"$d/books")
    assert(books.length == books2.length)
    books.zip(books2).foreach { case ((s1, c1, a), (s2, c2, b)) =>
      assert(s1 == s2 && c1 == c2 && a.sameElements(b))
    }
  }

  test("ivf topk with full probing equals brute force") {
    // nProbe = kCentroids probes every inverted list -> the candidate set
    // is the whole corpus and IVF degenerates to exact top-k
    val bf = Ann.bruteForceTopK(vecs, vecs.filter($"vec_id" < 5), k = 3)
      .select("query_id", "neighbor_id", "rank")
    val ivf = Ann.ivfTopK(vecs, vecs.filter($"vec_id" < 5), k = 3,
        kCentroids = 4, nProbe = 4)
      .select("query_id", "neighbor_id", "rank")
    assert(ivf.exceptAll(bf).count() == 0)
    assert(bf.exceptAll(ivf).count() == 0)
  }

  test("hardNegatives: only other-label neighbors, ranked by cosine") {
    val labeled = vecs.withColumn("label",
      (col("vec_id") % 3).cast("int"))
    val out = Ann.hardNegatives(labeled, labeled.filter($"vec_id" < 3), k = 4)
      .collect()
    assert(out.length == 12)
    out.foreach { r =>
      val (q, n) = (r.getLong(0), r.getLong(1))
      assert(r.getInt(2) == (n % 3).toInt)       // neighbor's true label
      assert((q % 3) != (n % 3), s"same-label pair $q,$n")
    }
    // rank 1 is the global other-label argmax by exact cosine
    val raw = labeled.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val ab = a.zip(b).map { case (x, y) => x * y }.sum
      ab / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    for (q <- 0L until 3L) {
      val best = raw.keys.filter(n => n % 3 != q % 3)
        .maxBy(n => (cos(raw(q), raw(n)), -n))
      val got = out.filter(r => r.getLong(0) == q && r.getInt(3) == 1)
      assert(got.length == 1 && got.head.getLong(1) == best,
        s"query $q: expected $best got ${got.head.getLong(1)}")
    }
  }

  test("hardNegativesIvf with full probing equals brute-force hardNegatives") {
    // nProbe = kCentroids -> every inverted list probed -> recall-complete,
    // so the IVF composition must reproduce the broadcast-contract miner
    val labeled = vecs.withColumn("label", (col("vec_id") % 3).cast("int"))
    val bf = Ann.hardNegatives(labeled, labeled.filter($"vec_id" < 5), k = 3)
    val ivf = Ann.hardNegativesIvf(labeled, labeled.filter($"vec_id" < 5),
      k = 3, kCentroids = 4, nProbe = 4)
    assert(ivf.exceptAll(bf).count() == 0)
    assert(bf.exceptAll(ivf).count() == 0)
    // restricted probing only narrows the candidate set: never a
    // same-label pair, never a better-than-brute-force rank-1
    val narrow = Ann.hardNegativesIvf(labeled, labeled.filter($"vec_id" < 5),
      k = 3, kCentroids = 4, nProbe = 1).collect()
    narrow.foreach { r =>
      assert((r.getLong(0) % 3).toInt != r.getInt(2))
    }
  }

  test("semDedup: scaled clones co-cluster with their originals and are " +
    "dropped; every input row appears exactly once") {
    // 0.5-scaled copies are direction-identical -> same spherical cluster,
    // cosine 1 with the original -> component root (min id) survives
    val clones = vecs.filter($"vec_id" % 10 === 0 && $"vec_id" < 30)
      .select(($"vec_id" + 100L).as("vec_id"),
        transform($"embedding", x => x * lit(0.5f)).as("embedding"))
    val out = Ann.semDedup(vecs.unionByName(clones), threshold = 0.95,
      kCentroids = 4).collect()
    assert(out.length == 53)
    val keep = out.map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val asg = out.map(r => r.getLong(0) -> r.getInt(1)).toMap
    Seq(0L, 10L, 20L).foreach { id =>
      assert(asg(id) == asg(id + 100L), s"clone of $id landed elsewhere")
      assert(!keep(id + 100L), s"clone of $id kept")
      assert(keep(id), s"original $id dropped")
    }
  }

  test("semDedup with one cluster equals brute-force cosine components") {
    // kCentroids=1 makes the cluster structure vacuous, so keep must
    // equal the O(n^2) ground truth: connected components of the
    // cosine>=t graph, min id kept per component
    val rnd = new scala.util.Random(11)
    val data = (0L until 40L).map { i =>
      // a few colinear families (j*base scaled) force multi-node comps
      val fam = (i % 5).toInt
      val base = Array.tabulate(8)(d =>
        math.sin(fam * 8 + d).toFloat)
      if (i < 20) (i, base.map(x => x * (1.0f + i * 0.1f)))
      else (i, Array.fill(8)(rnd.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")
    val t = 0.999
    val out = Ann.semDedup(data, threshold = t, kCentroids = 1)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // driver brute force
    val vecs = data.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val ab = a.zip(b).map { case (x, y) => x * y }.sum
      ab / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val ids = vecs.keys.toSeq.sorted
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for (a <- ids; b <- ids if a < b && cos(vecs(a), vecs(b)) >= t) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = ids.map(i => i -> (find(i) == i)).toMap
    assert(out == expect,
      ids.filter(i => out(i) != expect(i)).mkString("mismatch at ", ",", ""))
  }

  test("semDedup cluster-occupancy cap removes hot clusters from the " +
    "candidate universe (members all kept)") {
    val clones = vecs.filter($"vec_id" < 5)
      .select(($"vec_id" + 100L).as("vec_id"),
        transform($"embedding", x => x * lit(0.5f)).as("embedding"))
    val out = Ann.semDedup(vecs.unionByName(clones), threshold = 0.95,
      kCentroids = 1, maxClusterSize = Some(10L)).collect()
    // one cluster holding all 55 rows > cap 10 -> no pairs anywhere
    assert(out.length == 55 && out.forall(_.getBoolean(2)))
  }

  test("pca recovers a planted dominant direction; basis orthonormal, " +
    "eigenvalues descending; projection via fused dots") {
    // data = t * dir (dominant axis) + small noise in 8 dims
    val rnd = new scala.util.Random(7)
    val dir0 = Array.fill(8)(rnd.nextGaussian())
    val nrm = math.sqrt(dir0.map(x => x * x).sum)
    val dir = dir0.map(_ / nrm)
    val data = (0 until 300).map { i =>
      val t = rnd.nextGaussian() * 3.0
      (i.toLong, Array.tabulate(8)(d =>
        (t * dir(d) + rnd.nextGaussian() * 0.05).toFloat))
    }.toDF("vec_id", "embedding")
    val basis = Ann.pca(data, k = 3, scale = 65536.0)
    val evs = basis.map(_._1)
    assert(evs.zip(evs.tail).forall { case (a, b) => a >= b },
      s"eigenvalues not descending: ${evs.mkString(",")}")
    val top = basis(0)._2
    val align = math.abs(top.zip(dir).map { case (a, b) => a * b }.sum)
    assert(align > 0.99, s"top component misaligned: $align")
    for (a <- basis.map(_._2); b <- basis.map(_._2)) {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val expected = if (a eq b) 1.0 else 0.0
      assert(math.abs(d - expected) < 1e-6, s"basis not orthonormal: $d")
    }
    // dominant eigenvalue ~ var(t) = 9; noise axes ~ 0.0025
    assert(basis(0)._1 > 5.0 && basis(1)._1 < 0.1)
    val proj = Ann.pcaProject(data, basis.map(_._2))
    val row = proj.select($"pca").head().getSeq[Double](0)
    assert(row.length == 3)
  }

  test("covarianceMoments matches brute-force quantized moments exactly " +
    "(r9 join-free VecCovTerms path)") {
    val rnd = new scala.util.Random(11)
    val data = (0 until 20).map(i =>
      (i.toLong, Array.fill(5)((rnd.nextGaussian() * 1.7).toFloat)))
    val df = data.toDF("vec_id", "embedding")
    val scale = 1024.0
    // expected: the exact Spark round(x*scale) chain — HALF_UP over
    // BigDecimal.valueOf of the float->double product
    def q(x: Float): Long = java.math.BigDecimal
      .valueOf(x.toDouble * scale)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
    val qs = data.map { case (_, v) => v.map(q) }
    val expected = scala.collection.mutable.Map[(Long, Long), Long]()
    for (v <- qs; i <- 0 until 5) {
      for (j <- i until 5)
        expected((i.toLong, j.toLong)) =
          expected.getOrElse((i.toLong, j.toLong), 0L) + v(i) * v(j)
      expected((i.toLong, -1L)) = expected.getOrElse((i.toLong, -1L), 0L) + v(i)
    }
    expected((-1L, -1L)) = 20L
    val got = Ann.covarianceMoments(df, scale = scale).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected.toMap,
      s"moment mismatch: ${(got.toSet diff expected.toSet).take(5)}")
  }

  test("covarianceMoments contracts: empty input -> count row only; " +
    "null vector counts in n but contributes no terms; ragged fails loudly") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))))
    import org.apache.spark.sql.Row
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)
    val em = Ann.covarianceMoments(empty).collect()
    assert(em.toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      == Seq((-1L, -1L, 0L)))

    val withNull = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, Seq(1.0f, 2.0f)), Row(2L, null))), schema)
    val m = Ann.covarianceMoments(withNull).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m((-1L, -1L)) == 2L, "null vector must still count in n")
    assert(m((0L, 0L)) == 1024L * 1024L && m((1L, -1L)) == 2048L)

    val ragged = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, Seq(1.0f, 2.0f)), Row(2L, Seq(1.0f)))), schema)
    val ex = intercept[Throwable] {
      Ann.covarianceMoments(ragged).collect()
    }
    def causes(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: causes(t.getCause)
    assert(causes(ex).exists(c =>
      Option(c.getMessage).exists(_.contains("vec_cov_terms"))),
      s"ragged input must fail with the kernel's message, got: $ex")
  }

  test("pq: codebooks cover every subspace, identical vectors share " +
    "codes, and ADC ranks an exact clone first") {
    // four well-separated cluster prototypes in 8 dims; vectors 0..39 are
    // exact copies of their cluster prototype, so per-subspace Lloyd with
    // k=4 can place a centroid on each prototype and quantization error
    // for clone queries is exactly 0
    val protos = Array(
      Array(10f, 10f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 10f, 10f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 0f, 0f, 10f, 10f, 0f, 0f),
      Array(0f, 0f, 0f, 0f, 0f, 0f, 10f, 10f))
    val data = (0 until 40).map(i => (i.toLong, protos(i % 4)))
      .toDF("vec_id", "embedding")
    val m = 4
    val books = Ann.pqCodebooks(data, m = m, k = 4, iters = 3)
    assert(books.map(_._1).distinct.sorted.toSeq == (0 until m),
      "every subspace needs a codebook")
    assert(books.forall(_._3.length == 2), "subvector dim = d/m")
    val codes = Ann.pqEncode(data, books)
    assert(codes.count() == 40L * m)
    // identical vectors -> identical code words
    val distinctPerCluster = codes
      .withColumn("cl", $"vec_id" % 4)
      .groupBy($"cl", $"sub").agg(countDistinct($"code").as("n"))
      .agg(max($"n")).head().getLong(0)
    assert(distinctPerCluster == 1L, "clones must share codes")
    // a query that IS corpus vector 0 must rank another clone of
    // prototype 0 first, at distance 0 (self excluded)
    val top = Ann.pqAdcTopK(codes, books, data.filter($"vec_id" === 0L), 3)
      .orderBy($"rank").collect()
    assert(top.length == 3)
    assert(top(0).getAs[Long]("neighbor_id") % 4 == 0L &&
      top(0).getAs[Long]("dist") == 0L,
      s"rank-1 must be a clone at ADC distance 0: ${top.mkString(";")}")
  }
}

class ComponentsSpec extends SparkSpec {
  import graft.dedup.Dedup
  import spark.implicits._

  test("resolveComponents labels a path, a star, and singleton pairs — " +
    "identically via union-find and the distributed loop") {
    // path 1-2-3-4-5 (multi-hop propagation), star 10-{11,12,13}, pair 20-21
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L),
      (10L, 11L), (10L, 12L), (13L, 10L), (20L, 21L))
      .toDF("id_1", "id_2")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 20L -> 20L, 21L -> 20L)
    // default: driver union-find; threshold 0 forces the distributed loop
    for (threshold <- Seq(10000000L, 0L)) {
      val got = Dedup.resolveComponents(pairs,
          smallGraphThreshold = threshold).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"threshold=$threshold")
    }
  }

  test("distributed label propagation handles a bench-scale pair graph " +
    "(200k edges over 100k nodes) and matches the driver union-find") {
    // 10k ring communities of 10 nodes each (node = c*10+j, ring edge to
    // c*10+(j+1)%10) plus a chord per ring — 2x the default 1M threshold
    // would be slow in a unit test, but 200k edges is the same regime the
    // sf0.1 bench pair graphs live in and well above toy sizes
    val ring = spark.range(100000L).select(
      col("id").as("id_1"),
      ((col("id") - col("id") % 10) + (col("id") + 1) % 10).as("id_2"))
    val chords = spark.range(10000L).select(
      (col("id") * 10).as("id_1"), (col("id") * 10 + 5).as("id_2"))
    val pairs = ring.unionByName(chords)
    val dist = Dedup.resolveComponents(pairs, smallGraphThreshold = 0L)
    // every node labelled by its ring's minimum (c*10), none missing
    assert(dist.count() == 100000L)
    assert(dist.filter(col("component_id") =!=
      (col("id") - col("id") % 10)).count() == 0)
    // spot-parity with the driver union-find on the same graph
    val drv = Dedup.resolveComponents(pairs, smallGraphThreshold = Long.MaxValue)
    assert(dist.exceptAll(drv).count() == 0 && drv.exceptAll(dist).count() == 0)
  }

  test("resolveComponents converges on a long chain within the iteration " +
    "cap (pointer jumping: 20-node path in O(log n) rounds)") {
    val pairs = (0L until 19L).map(i => (i, i + 1)).toDF("id_1", "id_2")
    val got = Dedup.resolveComponents(pairs, smallGraphThreshold = 0L).collect()
    assert(got.length == 20)
    assert(got.forall(_.getLong(1) == 0L))
  }

  test("collect-path guard: an edge count the driver cannot hold fails " +
    "fast with guidance instead of dying mid-collect") {
    // pure-logic check of the budget the collect path asserts: 1e7 edges
    // x 96 bytes > a 256 MB maxResultSize
    val e = intercept[IllegalArgumentException] {
      Dedup.collectGuard(10000000L, 256L * 1024 * 1024, 20000000L)
    }
    assert(e.getMessage.contains("smallGraphThreshold"))
    assert(e.getMessage.contains("label-propagation"))
    Dedup.collectGuard(1000000L, 1024L * 1024 * 1024, 20000000L) // fits
    Dedup.collectGuard(10000000L, 0L, 20000000L) // unlimited
  }

  test("propagation path refuses to return unconverged labels at " +
    "maxIters") {
    // 20-node chain needs ~log2(20) pointer-jump rounds; maxIters=1
    // cannot converge and must throw, not hand back wrong components
    val pairs = (0L until 19L).map(i => (i, i + 1)).toDF("id_1", "id_2")
    val e = intercept[IllegalArgumentException] {
      Dedup.resolveComponents(pairs, smallGraphThreshold = 0L,
        maxIters = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("keepBestPerComponent: best score wins, ties break low-id, " +
    "singletons keep themselves") {
    // cluster {1,2,3}: scores 5,9,9 -> doc 2 kept (tie 2 vs 3 -> low id)
    // cluster {10,11}: scores 4,7 -> doc 11 kept
    // docs 20, 21: no edges -> singletons, both kept
    val docs = Seq((1L, 5L), (2L, 9L), (3L, 9L), (10L, 4L), (11L, 7L),
      (20L, 1L), (21L, 2L)).toDF("doc_id", "score")
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_1", "id_2")
    val comps = Dedup.resolveComponents(edges)
    val out = Dedup.keepBestPerComponent(docs, comps, "doc_id", "score")
      .select($"doc_id", $"component_id", $"is_kept")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(out == Set(
      (1L, 1L, false), (2L, 1L, true), (3L, 1L, false),
      (10L, 10L, false), (11L, 10L, true),
      (20L, 20L, true), (21L, 21L, true)))
    // exactly one kept doc per component, every doc present
    val kept = out.filter(_._3).map(_._2)
    assert(kept.size == out.map(_._2).size && out.size == 7)
  }
}
