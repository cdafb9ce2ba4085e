package graft

import org.apache.spark.sql.functions._

import graft.text.Cms

/** Count-Min Sketch: never-under-count guarantee, exact small-case
  * cells, merge associativity, bounded sketch size. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    "aa aa aa bb", "bb cc", "aa dd dd", "ee").toDF("text")

  test("estimates never under-count; exact when width is collision-free") {
    val sk = Cms.buildSketch(docs, "text", depth = 4, width = 1 << 16)
    val probes = Seq("aa", "bb", "cc", "dd", "ee", "zz").toDF("term")
    val est = Cms.estimate(sk, probes, "term", depth = 4, width = 1 << 16)
      .as[(String, Long)].collect().toMap
    val truth = Map("aa" -> 4L, "bb" -> 2L, "cc" -> 1L, "dd" -> 2L,
      "ee" -> 1L, "zz" -> 0L)
    truth.foreach { case (t, n) =>
      assert(est(t) >= n, s"$t under-counted")
      // 64k buckets vs 6 terms: collisions are ~impossible, est exact
      assert(est(t) == n, s"$t inexact at collision-free width")
    }
  }

  test("tight width still never under-counts") {
    val sk = Cms.buildSketch(docs, "text", depth = 3, width = 4)
    val est = Cms.estimate(sk, Seq("aa", "bb", "dd").toDF("term"),
      "term", depth = 3, width = 4).as[(String, Long)].collect().toMap
    assert(est("aa") >= 4L && est("bb") >= 2L && est("dd") >= 2L)
  }

  test("merge of batch sketches equals the one-shot sketch, any order") {
    val (a, b) = (docs.limit(2), docs.orderBy(desc("text")).limit(2))
    val one = Cms.buildSketch(a.unionByName(b), "text", 4, 64)
      .orderBy("row", "bucket").as[(Int, Long, Long)].collect().toSeq
    val sa = Cms.buildSketch(a, "text", 4, 64)
    val sb = Cms.buildSketch(b, "text", 4, 64)
    val m1 = Cms.merge(sa, sb).orderBy("row", "bucket")
      .as[(Int, Long, Long)].collect().toSeq
    val m2 = Cms.merge(sb, sa).orderBy("row", "bucket")
      .as[(Int, Long, Long)].collect().toSeq
    assert(m1 == one && m2 == one)
  }

  test("sketch relation is bounded by depth x width") {
    val sk = Cms.buildSketch(docs, "text", depth = 2, width = 8)
    assert(sk.count() <= 16)
  }

  test("heavy hitters: threshold filter over estimates") {
    val sk = Cms.buildSketch(docs, "text", depth = 4, width = 1 << 16)
    val hh = Cms.heavyHitters(sk, Seq("aa", "bb", "cc").toDF("term"),
      "term", threshold = 2L, depth = 4, width = 1 << 16)
      .as[(String, Long)].collect().toMap
    assert(hh.keySet == Set("aa", "bb"))
  }

  // ------------------------------------------------------------- Hdr

  import graft.text.Hdr

  test("hdr bucket bounds: lo <= v < lo+width, monotone, 2^-b error") {
    val b = 4
    val rnd = new scala.util.Random(13)
    val vals = (Seq.fill(300)(math.abs(rnd.nextLong()) % (1L << 40)) ++
      Seq(0L, 1L, 15L, 16L, 17L, 31L, 32L, (1L << 40) - 1)).distinct
    val got = vals.toDF("v")
      .select(col("v"), Hdr.bucketize(col("v"), b).as("k"))
      .select(col("v"), col("k"), Hdr.bucketLo(col("k"), b).as("lo"),
        Hdr.bucketWidth(col("k"), b).as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    got.foreach { case (v, k, lo, w) =>
      assert(lo <= v && v < lo + w, s"v=$v k=$k lo=$lo w=$w")
      if (k >= (1L << b)) assert(w << b <= lo, s"rel err v=$v")
      else assert(w == 1L && lo == v)
    }
    // monotone: sort by v => sort by k
    val byV = got.sortBy(_._1).map(_._2)
    assert(byV.sameElements(byV.sorted))
    // bucket bounds are tight: both endpoints map back to k
    val back = got.map { case (_, k, lo, w) => (k, lo, lo + w - 1) }
      .toSeq.toDF("k", "lo", "hi")
      .select(col("k"), Hdr.bucketize(col("lo"), b).as("k1"),
        Hdr.bucketize(col("hi"), b).as("k2")).collect()
    back.foreach(r => assert(r.getLong(0) == r.getLong(1) &&
      r.getLong(0) == r.getLong(2)))
  }

  test("hdr merge of shard partials equals the one-shot histogram") {
    val rnd = new scala.util.Random(17)
    val xs = Seq.fill(2000)(("s" + rnd.nextInt(3),
      math.abs(rnd.nextLong()) % 100000L))
    val df = xs.toDF("g", "v")
    val one = Hdr.buildHistogram(df, "v", Seq("g"), sbBits = 5)
    val (a, bs) = xs.splitAt(900)
    val merged = Hdr.merge(Seq("g"),
      Hdr.buildHistogram(a.toDF("g", "v"), "v", Seq("g"), 5),
      Hdr.buildHistogram(bs.toDF("g", "v"), "v", Seq("g"), 5))
    assert(rowsOf(merged.orderBy("g", "bucket")) ==
      rowsOf(one.orderBy("g", "bucket")))
  }

  test("hdr quantiles bracket the exact order statistic") {
    val b = 6
    val rnd = new scala.util.Random(23)
    val xs = Seq.fill(5000)(math.abs(rnd.nextLong()) % 1000000L)
    val hist = Hdr.buildHistogram(xs.toDF("v"), "v", Nil, b)
    val qs = Seq(100, 250, 500, 900, 990, 1000)
    val got = Hdr.quantiles(hist, Nil, qs, b)
      .select("q_permille", "lo", "width").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.map(_._1).sorted == qs.map(_.toLong))
    val sorted = xs.sorted
    got.foreach { case (q, lo, w) =>
      // exact q-quantile = smallest x with rank*1000 >= n*q
      val idx = sorted.indices.find(i =>
        (i + 1L) * 1000 >= sorted.length.toLong * q).get
      val exact = sorted(idx)
      assert(lo <= exact && exact < lo + w, s"q=$q exact=$exact lo=$lo w=$w")
    }
  }
}
