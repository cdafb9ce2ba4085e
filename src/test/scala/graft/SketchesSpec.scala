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
}
