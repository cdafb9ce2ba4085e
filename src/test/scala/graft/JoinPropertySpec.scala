package graft

import graft.ops.{IntervalJoin, Ops}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Physical-strategy equivalence for the interval join: Binned,
  * BroadcastRight, and BinnedTwoLevel must produce the SAME pair multiset
  * as a driver-side brute force on random inputs — points (start == end,
  * promoted in the predicate), a heavy span tail (crosses the two-level
  * long cut at 8*binSize), coordinates straddling bin boundaries, and
  * empty sides. */
class JoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private val genIvs: Gen[List[(Long, String, Long, Long)]] =
    Gen.choose(0, 40).flatMap { n =>
      Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b")
        s <- Gen.choose(0L, 500L)
        span <- Gen.frequency(
          3 -> Gen.choose(0L, 30L),   // incl. points
          1 -> Gen.choose(100L, 300L) // long tail: >> 8 * binSize 4
        )
      } yield (g, s, s + span))
    }.map(_.zipWithIndex.map { case ((g, s, e), i) => (i.toLong, g, s, e) })

  test("Binned / BroadcastRight / BinnedTwoLevel emit identical pair " +
    "multisets, equal to brute force") {
    val prop = Prop.forAll(genIvs, genIvs) { (l, r) =>
      val df1 = l.toDF("id", "chrom", "start", "end")
      val df2 = r.map { case (i, g, s, e) => (i + 1000L, g, s, e) }
        .toDF("id", "chrom", "start", "end")
      def run(st: IntervalJoin.Strategy): Seq[(Long, Long)] =
        Ops.overlap(df1, df2, how = "inner", suffixes = ("_1", "_2"),
            strategy = st, binSize = 4)
          .select(col("id_1"), col("id_2"))
          .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
      def pe(s: Long, e: Long) = if (s == e) s + 1 else e
      val brute = (for {
        (i1, g1, s1, e1) <- l
        (i2, g2, s2, e2) <- r
        if g1 == g2 && s1 < pe(s2, e2) && s2 < pe(s1, e1)
      } yield (i1, i2 + 1000L)).sorted
      val binned = run(IntervalJoin.Binned)
      binned == brute &&
        run(IntervalJoin.BroadcastRight) == brute &&
        run(IntervalJoin.BinnedTwoLevel) == brute
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
