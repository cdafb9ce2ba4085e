package graft

import org.apache.spark.sql.functions._
import graft.ops.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private def skewed() = {
    // 'hot' carries 300 of 320 rows; v1/v2/unmatched are light
    val left = ((0 until 300).map(i => (i.toLong, "hot")) ++
      Seq((300L, "v1"), (301L, "v2"), (302L, "v2"), (303L, "miss")))
      .toDF("id", "k")
    // multi-row build side: 2 rows per key so fan-out is exercised
    val right = Seq(("hot", 1L), ("hot", 2L), ("v1", 10L), ("v2", 20L),
      ("v2", 21L), ("extra", 99L)).toDF("k", "payload")
    (left, right)
  }

  private def sorted(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq

  test("salted inner join equals the plain join") {
    val (left, right) = skewed()
    val got = SkewJoin.saltedJoin(left, right, Seq("k"),
      saltFactor = 4, minSharePpm = 100000L)
    assert(sorted(got) == sorted(left.join(right, Seq("k"), "inner")))
  }

  test("salted left join equals the plain join incl. unmatched rows") {
    val (left, right) = skewed()
    val got = SkewJoin.saltedJoin(left, right, Seq("k"),
      saltFactor = 4, minSharePpm = 100000L, joinType = "left")
    assert(sorted(got) == sorted(left.join(right, Seq("k"), "left")))
    assert(got.filter(col("k") === "miss" && col("payload").isNull)
      .count() == 1L)
  }

  test("only heavy keys are salted; the salted branch joins on __salt") {
    val (left, right) = skewed()
    assert(SkewJoin.heavyKeys(left, Seq("k"), 64, 100000L)
      .select("k").as[String].collect().toSeq == Seq("hot"))
    val plan = SkewJoin.saltedJoin(left, right, Seq("k"),
        saltFactor = 4, minSharePpm = 100000L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"no salted branch in:\n$plan")
  }

  test("no heavy keys -> falls back to the plain single join") {
    val left = (0 until 100).map(i => (i.toLong, s"k$i")).toDF("id", "k")
    val right = Seq(("k1", 1L), ("k2", 2L)).toDF("k", "payload")
    val out = SkewJoin.saltedJoin(left, right, Seq("k"),
      minSharePpm = 100000L)
    assert(!out.queryExecution.executedPlan.toString.contains("__salt"))
    assert(sorted(out) == sorted(left.join(right, Seq("k"), "inner")))
  }

  test("salting is deterministic under repartition") {
    val (left, right) = skewed()
    val a = SkewJoin.saltedJoin(left.repartition(7), right, Seq("k"),
      saltFactor = 4, minSharePpm = 100000L)
    val b = SkewJoin.saltedJoin(left.repartition(3), right, Seq("k"),
      saltFactor = 4, minSharePpm = 100000L)
    assert(sorted(a) == sorted(b))
  }

  test("composite keys salt and join correctly") {
    val left = ((0 until 200).map(i => (i.toLong, "a", 1L)) ++
      Seq((200L, "a", 2L), (201L, "b", 1L))).toDF("id", "k1", "k2")
    val right = Seq(("a", 1L, "x"), ("a", 2L, "y"), ("b", 1L, "z"))
      .toDF("k1", "k2", "tag")
    val got = SkewJoin.saltedJoin(left, right, Seq("k1", "k2"),
      saltFactor = 4, minSharePpm = 100000L)
    assert(sorted(got) == sorted(left.join(right, Seq("k1", "k2"), "inner")))
  }

  test("colliding composite tuples profile as distinct keys") {
    // ("ab","c") vs ("a","bc") concatenate identically; (null) vs ("")
    // merge under concat_ws. All four must stay distinct tuples.
    val left = ((0 until 50).map(i => (i.toLong, "ab", "c")) ++
      (50 until 80).map(i => (i.toLong, "a", "bc")) ++
      (80 until 90).map(i => (i.toLong, null: String, "c")) ++
      (90 until 95).map(i => (i.toLong, "", "c"))).toDF("id", "k1", "k2")
    val hk = SkewJoin.heavyKeys(left, Seq("k1", "k2"), 64, 1L)
      .collect().map(r => (Option(r.getString(0)), r.getString(1),
        r.getLong(2))).toSeq
    assert(hk == Seq((Some("ab"), "c", 50L), (Some("a"), "bc", 30L),
      (None, "c", 10L), (Some(""), "c", 5L)))
  }

  test("a heavy NULL key salts and still left-joins to nothing") {
    val left = ((0 until 200).map(i => (i.toLong, null: String)) ++
      Seq((200L, "v1"), (201L, "v2"))).toDF("id", "k")
    val right = Seq(("v1", 10L), ("v2", 20L)).toDF("k", "payload")
    val got = SkewJoin.saltedJoin(left, right, Seq("k"),
      saltFactor = 4, minSharePpm = 100000L, joinType = "left")
    assert(sorted(got) == sorted(left.join(right, Seq("k"), "left")))
    assert(got.filter(col("k").isNull && col("payload").isNull)
      .count() == 200L)
  }

  test("empty left input: empty profile, empty join, no NPE") {
    val (left, right) = skewed()
    val empty = left.filter(col("k") === "no-such-key")
    assert(SkewJoin.heavyKeys(empty, Seq("k"), 8, 1L).count() == 0L)
    assert(SkewJoin.saltedJoin(empty, right, Seq("k")).count() == 0L)
  }

  test("inputs already carrying __salt are rejected") {
    val (left, right) = skewed()
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(left.withColumn("__salt", lit(0)), right,
        Seq("k"))
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(left, right.withColumn("__salt", lit(0)),
        Seq("k"))
    }
  }
}
