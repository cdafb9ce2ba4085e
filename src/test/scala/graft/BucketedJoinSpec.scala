package graft

import graft.core.ColSpec
import graft.ops.{BucketedJoin, IntervalJoin}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Contract for the bucketed bin-index layout: two tables written by
  * `BucketedJoin.writeBinIndex` with the same bucket count join with
  * ZERO Exchange operators in the executed plan (the 100 TB amortized
  * layout — one bucketed write per ingest, shuffle-free joins after),
  * and the result is identical to the shuffled Binned strategy.
  */
class BucketedJoinSpec extends SparkSpec {

  private def synth(n: Int, salt: Long): DataFrame =
    spark.range(n).select(
      (col("id") + salt * 1000000L).as("id"),
      concat(lit("chr"), (col("id") % 5).cast("string")).as("chrom"),
      ((col("id") * 37 + salt) % 1000).cast("long").as("start"),
      ((col("id") * 37 + salt) % 1000 + col("id") % 9).cast("long").as("end"))

  test("co-bucketed bin indexes join exchange-free and match the " +
    "shuffled Binned strategy") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    val bin = 64L
    val a = synth(3000, 1)
    val b = ColSpec.suffixAll(synth(2000, 2), "_2")
    val c1 = ColSpec.default
    val c2 = ColSpec.default.withSuffix("_2")
    BucketedJoin.writeBinIndex(a, "bj_a", s"$dir/a", c1,
      binSize = bin, numBuckets = 4)
    BucketedJoin.writeBinIndex(b, "bj_b", s"$dir/b", c2,
      binSize = bin, numBuckets = 4, binColName = "__bin_2")

    val pairs = BucketedJoin.pairsFromBinIndex(
      spark.table("bj_a"), spark.table("bj_b"), c1, c2,
      rightBin = "__bin_2", binSize = bin)
      .select(col("id"), col("id_2"))
    val got = rowsOf(pairs)
    val exp = rowsOf(IntervalJoin.pairs(a, b, c1, c2,
      strategy = IntervalJoin.Binned, binSize = bin)
      .select(col("id"), col("id_2")))
    assert(got.nonEmpty, "bucketed join produced no pairs")
    assert(got == exp, s"bucketed pairs differ from Binned strategy " +
      s"(${got.size} vs ${exp.size})")

    val p = pairs.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"co-bucketed join plan contains an exchange:\n$p")
  }

  test("bucketed bin-index join equals brute force on random inputs " +
    "(points, bin-straddlers, empty sides)") {
    import spark.implicits._
    val genIvs: Gen[List[(Long, String, Long, Long)]] =
      Gen.choose(0, 30).flatMap { n =>
        Gen.listOfN(n, for {
          g <- Gen.oneOf("a", "b")
          s <- Gen.choose(0L, 300L)
          span <- Gen.choose(0L, 80L) // incl. points and multi-bin spans
        } yield (g, s, s + span))
      }.map(_.zipWithIndex.map { case ((g, s, e), i) => (i.toLong, g, s, e) })
    val dir = java.nio.file.Files.createTempDirectory("graft_bprop").toString
    var it = 0
    val c1 = ColSpec.default
    val c2 = ColSpec.default.withSuffix("_2")
    val prop = Prop.forAll(genIvs, genIvs) { (l, r) =>
      it += 1
      val df1 = l.toDF("id", "chrom", "start", "end")
      val df2 = ColSpec.suffixAll(r.map { case (i, g, s, e) =>
        (i + 1000L, g, s, e) }.toDF("id", "chrom", "start", "end"), "_2")
      BucketedJoin.writeBinIndex(df1, s"bp_a_$it", s"$dir/a$it", c1,
        binSize = 16, numBuckets = 2)
      BucketedJoin.writeBinIndex(df2, s"bp_b_$it", s"$dir/b$it", c2,
        binSize = 16, numBuckets = 2, binColName = "__bin_2")
      val got = BucketedJoin.pairsFromBinIndex(
        spark.table(s"bp_a_$it"), spark.table(s"bp_b_$it"), c1, c2,
        rightBin = "__bin_2", binSize = 16)
        .select(col("id"), col("id_2"))
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
      def pe(s: Long, e: Long) = if (s == e) s + 1 else e
      val brute = (for {
        (i1, g1, s1, e1) <- l
        (i2, g2, s2, e2) <- r
        if g1 == g2 && s1 < pe(s2, e2) && s2 < pe(s1, e1)
      } yield (i1, i2 + 1000L)).sorted
      got == brute
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("a bucketed side joining an unbucketed side shuffles only the " +
    "unbucketed side") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed1").toString
    val bin = 64L
    val a = synth(3000, 3)
    val c1 = ColSpec.default
    val c2 = ColSpec.default.withSuffix("_2")
    BucketedJoin.writeBinIndex(a, "bj_one", s"$dir/a", c1,
      binSize = bin, numBuckets = 4)
    val probe = BucketedJoin.binIndex(
      ColSpec.suffixAll(synth(500, 4), "_2"), c2, bin)
      .withColumnRenamed(BucketedJoin.BinCol, "__bin_2")
    val pairs = BucketedJoin.pairsFromBinIndex(
      spark.table("bj_one"), probe, c1, c2,
      rightBin = "__bin_2", binSize = bin)
    pairs.count()
    val p = pairs.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1,
      s"expected at most one exchange (probe side only), got $exchanges:\n$p")
  }
}
