package graft

import graft.core.ColSpec
import graft.ops.{Closest, IntervalJoin, Ops}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden-frame tests transcribed from the reference suite
  * (`tests/test_ops.py`), plus brute-force cross-checks on random data. */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  private def df1 = Seq(
    ("chr1", 1L, 5L), ("chr1", 3L, 8L), ("chr1", 8L, 10L), ("chr1", 12L, 14L))
    .toDF("chrom", "start", "end")

  // ---- cluster (tests/test_ops.py:869-925) ----
  test("cluster spans: min_dist=0 merges overlapping+touching") {
    val out = Ops.cluster(df1, minDist = Some(0))
    assertFrame(out, Seq(
      Seq("chr1", 1L, 5L, 1L, 10L), Seq("chr1", 3L, 8L, 1L, 10L),
      Seq("chr1", 8L, 10L, 1L, 10L), Seq("chr1", 12L, 14L, 12L, 14L)),
      "chrom", "start", "end", "cluster_start", "cluster_end")
  }

  test("cluster: min_dist=2 joins across small gaps") {
    val out = Ops.cluster(df1, minDist = Some(2))
    assert(out.select("cluster_start").distinct().count() == 1)
  }

  test("cluster: min_dist=None keeps touching intervals apart") {
    val out = Ops.cluster(df1, minDist = None)
    assertFrame(out.select($"start", $"cluster_start", $"cluster_end"), Seq(
      Seq(1L, 1L, 8L), Seq(3L, 1L, 8L), Seq(8L, 8L, 10L), Seq(12L, 12L, 14L)),
      "start", "cluster_start", "cluster_end")
  }

  test("cluster with on=[animal] groups separately (test_ops.py:905-915)") {
    val df = Seq(
      ("chr1", 3L, 8L, "+", "cat"), ("chr1", 3L, 8L, "-", "dog"),
      ("chr1", 6L, 10L, "-", "cat"), ("chrX", 6L, 10L, "-", "cat"))
      .toDF("chrom", "start", "end", "strand", "animal")
    val out = Ops.cluster(df, on = Seq("animal"))
    assertFrame(out.select($"animal", $"start", $"cluster_start", $"cluster_end"),
      Seq(Seq("cat", 3L, 3L, 10L), Seq("dog", 3L, 3L, 8L),
        Seq("cat", 6L, 3L, 10L), Seq("cat", 6L, 6L, 10L)),
      "animal", "start", "cluster_start", "cluster_end")
  }

  test("cluster return flags select columns, one row per input " +
    "(reference ops.py:694-705)") {
    val ids = Ops.cluster(df1, returnInput = false,
      returnClusterIntervals = false)
    assert(ids.columns.toSeq == Seq("cluster") && ids.count() == 4)
    val noIds = Ops.cluster(df1, returnClusterIds = false)
    assert(!noIds.columns.contains("cluster") &&
      noIds.columns.contains("cluster_start"))
  }

  // ---- merge (tests/test_ops.py:953-1000) ----
  test("merge n_intervals for the three min_dist regimes") {
    def counts(md: Option[Long]) =
      Ops.merge(df1, minDist = md).select("n_intervals")
        .collect().map(_.getLong(0)).sorted.toSeq
    assert(counts(Some(0)) == Seq(1L, 3L))
    assert(counts(None) == Seq(1L, 1L, 2L))
    assert(counts(Some(2)) == Seq(4L))
  }

  test("merge window-sweep and range-partitioned strategies agree") {
    val a = rowsOf(Ops.merge(df1, Some(0),
      mergeStrategy = Ops.WindowSweep))
    val b = rowsOf(Ops.merge(df1, Some(0),
      mergeStrategy = Ops.RangePartitioned))
    assert(a == b)
  }

  // ---- overlap (tests/test_ops.py:301+) ----
  private def ivA = Seq(("chr1", 1L, 5L, "a1"), ("chr1", 7L, 10L, "a2"),
    ("chr2", 3L, 5L, "a3")).toDF("chrom", "start", "end", "name")
  private def ivB = Seq(("chr1", 4L, 8L, "b1"), ("chr1", 10L, 11L, "b2"),
    ("chr3", 0L, 2L, "b3")).toDF("chrom", "start", "end", "name")

  test("overlap inner returns matching pairs with intersection coords") {
    val out = Ops.overlap(ivA, ivB, how = "inner", suffixes = ("_1", "_2"),
      returnOverlap = true, binSize = 4)
    assertFrame(out.select($"name_1", $"name_2", $"overlap_start", $"overlap_end"),
      Seq(Seq("a1", "b1", 4L, 5L), Seq("a2", "b1", 7L, 8L)),
      "name_1", "name_2", "overlap_start", "overlap_end")
  }

  test("overlap left keeps unmatched df1 rows with nulls") {
    val out = Ops.overlap(ivA, ivB, how = "left", suffixes = ("_1", "_2"),
      binSize = 4)
    assertFrame(out.select($"name_1", $"name_2"),
      Seq(Seq("a1", "b1"), Seq("a2", "b1"), Seq("a3", null)),
      "name_1", "name_2")
  }

  test("region select pushes filters into a stored bedframe's parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-push").toString
    Seq(("chr1", 100L, 200L, "a"), ("chr2", 50L, 80L, "b"))
      .toDF("chrom", "start", "end", "name")
      .write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val plan = Ops.select(stored, "chr1:120-180").select($"chrom", $"start")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("IsNotNull(chrom)") && plan.contains("EqualTo(chrom,chr1)"),
      s"expected chrom/start pushdown in:\n$plan")
    // column pruning: name not read
    assert(plan.contains("ReadSchema") && !plan.contains("name:string"),
      "projection should prune unused columns")
  }

  test("selectIndices/selectLabels (reference ops.py:69-113)") {
    val df = Seq(("chr1", 1L, 5L, "a"), ("chr1", 3L, 8L, "b"),
      ("chr2", 0L, 2L, "c")).toDF("chrom", "start", "end", "name")
    assertFrame(Ops.selectIndices(df, Seq(0L, 2L)).select($"name"),
      Seq(Seq("a"), Seq("c")), "name")
    assertFrame(Ops.selectLabels(df, "name", Seq("b")).select($"name"),
      Seq(Seq("b")), "name")
  }

  test("overlap keepOrder restores df1 input order " +
    "(reference ops.py:408-413,549-550)") {
    // deliberately un-sorted df1 with an explicit input ordinal
    val a = Seq((0L, "chr1", 7L, 10L, "a2"), (1L, "chr2", 3L, 5L, "a3"),
      (2L, "chr1", 1L, 5L, "a1"))
      .toDF("idx", "chrom", "start", "end", "name")
    val out = Ops.overlap(a, ivB, how = "left", suffixes = ("_1", "_2"),
      keepOrder = true, orderCol1 = Some("idx"), binSize = 4)
    assert(out.select("name_1").collect().map(_.getString(0)).toSeq ==
      Seq("a2", "a3", "a1"))
  }

  test("closest returnOverlap adds have_overlap/overlap coords " +
    "(reference ops.py:1117-1121,1176-1235)") {
    val a = Seq(("chr1", 4L, 9L)).toDF("chrom", "start", "end")
    val b = Seq(("chr1", 6L, 8L, "near"), ("chr1", 20L, 25L, "far"),
      ("chr2", 0L, 1L, "other")).toDF("chrom", "start", "end", "name")
    val out = Closest.closest(a, Some(b), k = 2, suffixes = ("_1", "_2"),
      returnOverlap = true, binSize = 4)
    assertFrame(out.select($"name_2", $"have_overlap", $"overlap_start",
      $"overlap_end", $"distance"),
      Seq(Seq("near", true, 6L, 8L, 0L), Seq("far", false, null, null, 11L)),
      "name_2", "have_overlap", "overlap_start", "overlap_end", "distance")
  }

  test("overlap outer adds unmatched rows from both sides") {
    val out = Ops.overlap(ivA, ivB, how = "outer", suffixes = ("_1", "_2"),
      binSize = 4)
    assert(out.count() == 5) // 2 pairs + a3 + b2 + b3
  }

  test("point intervals join (promotion): point at query start is selected") {
    // reference ops.py:62-65 / arrops.py:271-287
    // p1 inside b1; p2 at b1's exclusive end (no match); p3 exactly at
    // b2's start (matches via promotion, ops.py:62-65)
    val points = Seq(("chr1", 4L, 4L, "p1"), ("chr1", 8L, 8L, "p2"),
      ("chr1", 10L, 10L, "p3")).toDF("chrom", "start", "end", "name")
    val out = Ops.overlap(points, ivB, how = "inner", suffixes = ("_1", "_2"),
      binSize = 4)
    assertFrame(out.select($"name_1", $"name_2"),
      Seq(Seq("p1", "b1"), Seq("p3", "b2")), "name_1", "name_2")
  }

  test("overlap with on=[strand] adds the equi-key") {
    val a = Seq(("chr1", 1L, 5L, "+"), ("chr1", 1L, 5L, "-"))
      .toDF("chrom", "start", "end", "strand")
    val b = Seq(("chr1", 4L, 8L, "+")).toDF("chrom", "start", "end", "strand")
    val out = Ops.overlap(a, b, how = "inner", suffixes = ("_1", "_2"),
      on = Seq("strand"), binSize = 4)
    assertFrame(out.select($"strand_1"), Seq(Seq("+")), "strand_1")
  }

  // ---- countOverlaps / setdiff ----
  test("countOverlaps keeps zeros; duplicates counted per copy") {
    val a = Seq(("chr1", 1L, 5L), ("chr1", 1L, 5L), ("chr2", 0L, 2L))
      .toDF("chrom", "start", "end")
    val out = Ops.countOverlaps(a, ivB, countCol = "n", binSize = 4)
    assertFrame(out.select($"chrom", $"n"),
      Seq(Seq("chr1", 1L), Seq("chr1", 1L), Seq("chr2", 0L)), "chrom", "n")
  }

  test("setdiff removes any-overlap rows (tests/test_ops.py:1863+)") {
    val out = Ops.setdiff(ivA, ivB, binSize = 4)
    assertFrame(out.select($"name"), Seq(Seq("a3")), "name")
  }

  test("merged-anti promotion: abutting point in df2 still matches " +
    "(reference arrops.py:271-287)") {
    // df2's point [7,7) abuts [0,7): merge(0) absorbs it into the run
    // [0,7), but the point's promoted reach [7,8) must still match df1's
    // [7,9) — no spurious null-extended row, and setdiff drops the row.
    val a = Seq(("chr1", 7L, 9L, "a1")).toDF("chrom", "start", "end", "name")
    val b = Seq(("chr1", 0L, 7L, "b1"), ("chr1", 7L, 7L, "b2"))
      .toDF("chrom", "start", "end", "name")
    val left = Ops.overlap(a, b, how = "left", suffixes = ("_1", "_2"),
      binSize = 4)
    assertFrame(left.select($"name_1", $"name_2"),
      Seq(Seq("a1", "b2")), "name_1", "name_2")
    val outer = Ops.overlap(a, b, how = "outer", suffixes = ("_1", "_2"),
      binSize = 4)
    assertFrame(outer.select($"name_1", $"name_2"),
      Seq(Seq("a1", "b2"), Seq(null, "b1")), "name_1", "name_2")
    assert(Ops.setdiff(a, b, binSize = 4).count() == 0)
  }

  test("trim without a view clips at zero, nulls stay null " +
    "(reference ops.py:1495-1506, tests/test_ops.py trim cases)") {
    val df = Seq(
      (Some("chr1"), Some(-5L), Some(3L)),
      (Some("chr1"), Some(2L), Some(4L)),
      (None: Option[String], None: Option[Long], None: Option[Long]))
      .toDF("chrom", "start", "end")
    assertFrame(Ops.trim(df), Seq(
      Seq("chr1", 0L, 3L), Seq("chr1", 2L, 4L), Seq(null, null, null)),
      "chrom", "start", "end")
  }

  // ---- coverage (tests/test_ops.py:1494+) ----
  test("coverage merges df2 first so overlaps don't double-count") {
    val a = Seq(("chr1", 0L, 10L)).toDF("chrom", "start", "end")
    val b = Seq(("chr1", 2L, 6L), ("chr1", 4L, 8L), ("chr1", 20L, 30L))
      .toDF("chrom", "start", "end")
    val out = Ops.coverage(a, b, binSize = 4)
    assertFrame(out.select($"coverage"), Seq(Seq(6L)), "coverage")
  }

  // ---- subtract (tests/test_ops.py:1570+) ----
  test("subtract emits fragments, drops covered rows, keeps uncovered points") {
    val a = Seq(("chr1", 0L, 10L, "x"), ("chr1", 12L, 14L, "y"),
      ("chr1", 4L, 5L, "z"), ("chr1", 20L, 20L, "pt"))
      .toDF("chrom", "start", "end", "name")
    val b = Seq(("chr1", 3L, 6L), ("chr1", 8L, 13L)).toDF("chrom", "start", "end")
    val out = Ops.subtract(a, b, binSize = 4)
    assertFrame(out.select($"name", $"start", $"end"), Seq(
      Seq("x", 0L, 3L), Seq("x", 6L, 8L), Seq("y", 13L, 14L),
      Seq("pt", 20L, 20L)), "name", "start", "end")
  }

  test("expand one side only (reference ops.py:150-225 side=)") {
    val df = Seq(("chr1", 10L, 20L)).toDF("chrom", "start", "end")
    assertFrame(Ops.expand(df, pad = Some(5L), side = "left"),
      Seq(Seq("chr1", 5L, 20L)), "chrom", "start", "end")
    assertFrame(Ops.expand(df, pad = Some(5L), side = "right"),
      Seq(Seq("chr1", 10L, 25L)), "chrom", "start", "end")
  }

  test("subtract returnIndex numbers fragments per parent (ops.py:1323-1329)") {
    val a = Seq(("chr1", 0L, 20L)).toDF("chrom", "start", "end")
    val b = Seq(("chr1", 5L, 8L), ("chr1", 12L, 14L)).toDF("chrom", "start", "end")
    val out = Ops.subtract(a, b, returnIndex = true)
    assertFrame(out.select($"start", $"end", $"sub_index_"),
      Seq(Seq(0L, 5L, 0), Seq(8L, 12L, 1), Seq(14L, 20L, 2)),
      "start", "end", "sub_index_")
  }

  test("complement with no view clips to [0, int64max) per chrom " +
    "(reference ops.py:1603-1604)") {
    val df = Seq(("chr1", 1L, 5L), ("chr1", 10L, 14L))
      .toDF("chrom", "start", "end")
    assertFrame(Ops.complement(df).select($"start", $"end", $"view_region"),
      Seq(Seq(0L, 1L, "chr1"), Seq(5L, 10L, "chr1"),
        Seq(14L, Long.MaxValue, "chr1")),
      "start", "end", "view_region")
  }

  // ---- complement (tests/test_ops.py:1055+) ----
  test("complement returns gaps per region; empty regions whole") {
    val df = Seq(("chr1", 2L, 4L), ("chr1", 6L, 8L)).toDF("chrom", "start", "end")
    val view = Seq(("chr1", 0L, 10L, "r1"), ("chr2", 0L, 5L, "r2"))
      .toDF("chrom", "start", "end", "name")
    val out = Ops.complement(df, view)
    assertFrame(out, Seq(
      Seq("chr1", 0L, 2L, "r1"), Seq("chr1", 4L, 6L, "r1"),
      Seq("chr1", 8L, 10L, "r1"), Seq("chr2", 0L, 5L, "r2")),
      "chrom", "start", "end", "view_region")
  }

  // ---- expand (tests/test_ops.py:217+) ----
  test("expand pad, negative pad clamps at midpoint, scale rounds half-even") {
    val df = Seq(("chr1", 10L, 20L), ("chr1", 5L, 6L)).toDF("chrom", "start", "end")
    assertFrame(Ops.expand(df, pad = Some(3L)),
      Seq(Seq("chr1", 7L, 23L), Seq("chr1", 2L, 9L)), "chrom", "start", "end")
    assertFrame(Ops.expand(df, pad = Some(-4L)),
      Seq(Seq("chr1", 14L, 16L), Seq("chr1", 5L, 5L)), "chrom", "start", "end")
    assertFrame(Ops.expand(df, scale = Some(2.0)),
      Seq(Seq("chr1", 5L, 25L), Seq("chr1", 4L, 6L)), "chrom", "start", "end")
  }

  // ---- select ----
  test("select by region string includes point at query start") {
    val df = Seq(("chr1", 1L, 3L), ("chr1", 5L, 5L), ("chr1", 9L, 12L),
      ("chr2", 5L, 6L)).toDF("chrom", "start", "end")
    assertFrame(Ops.select(df, "chr1:5-9"),
      Seq(Seq("chr1", 5L, 5L)), "chrom", "start", "end")
    assertFrame(Ops.select(df, "chr1:2-10"),
      Seq(Seq("chr1", 1L, 3L), Seq("chr1", 5L, 5L), Seq("chr1", 9L, 12L)),
      "chrom", "start", "end")
  }

  // ---- trim / assign_view ----
  test("assign_view picks region of largest overlap; trim clips to it") {
    val view = Seq(("chr1", 0L, 10L, "p"), ("chr1", 10L, 20L, "q"))
      .toDF("chrom", "start", "end", "name")
    val df = Seq(("chr1", 2L, 5L), ("chr1", 8L, 17L), ("chr1", 9L, 11L))
      .toDF("chrom", "start", "end")
    val av = Ops.assignView(df, view)
    assertFrame(av.select($"start", $"view_region"),
      Seq(Seq(2L, "p"), Seq(8L, "q"), Seq(9L, "p")), "start", "view_region")
    val tr = Ops.trim(df, view)
    assertFrame(tr.select($"start", $"end"),
      Seq(Seq(2L, 5L), Seq(10L, 17L), Seq(9L, 10L)), "start", "end")
  }

  // ---- closest (tests/test_ops.py:1168+) ----
  test("closest k=1: overlap outranks touching; distance computed correctly") {
    val a = Seq(("chr1", 10L, 15L)).toDF("chrom", "start", "end")
    val b = Seq(("chr1", 0L, 5L, "far_left"), ("chr1", 8L, 10L, "touch_left"),
      ("chr1", 12L, 13L, "inside"), ("chr1", 18L, 22L, "right"))
      .toDF("chrom", "start", "end", "name")
    val out = Closest.closest(a, Some(b), k = 1, suffixes = ("_1", "_2"))
    assertFrame(out.select($"name_2", $"distance"),
      Seq(Seq("inside", 0L)), "name_2", "distance")
  }

  test("closest k=3 ranks by distance after overlaps") {
    val a = Seq(("chr1", 10L, 15L)).toDF("chrom", "start", "end")
    val b = Seq(("chr1", 0L, 5L, "L5"), ("chr1", 8L, 10L, "L0"),
      ("chr1", 12L, 13L, "in"), ("chr1", 18L, 22L, "R3"))
      .toDF("chrom", "start", "end", "name")
    val out = Closest.closest(a, Some(b), k = 3, suffixes = ("_1", "_2"))
    assertFrame(out.select($"name_2", $"distance"),
      Seq(Seq("in", 0L), Seq("L0", 0L), Seq("R3", 3L)), "name_2", "distance")
  }

  test("closest ignoreDownstream keeps only upstream + overlaps") {
    val a = Seq(("chr1", 10L, 15L), ("chr1", 0L, 2L)).toDF("chrom", "start", "end")
    val b = Seq(("chr1", 4L, 6L, "left"), ("chr1", 20L, 25L, "right"))
      .toDF("chrom", "start", "end", "name")
    val out = Closest.closest(a, Some(b), k = 1, ignoreDownstream = true,
      suffixes = ("_1", "_2"))
    assertFrame(out.select($"start_1", $"name_2", $"distance"),
      Seq(Seq(10L, "left", 4L), Seq(0L, null, null)),
      "start_1", "name_2", "distance")
  }

  test("closest with direction col flips upstream for minus strand") {
    val a = Seq(("chr1", 10L, 15L, "-")).toDF("chrom", "start", "end", "strand")
    val b = Seq(("chr1", 4L, 6L, "gleft"), ("chr1", 20L, 25L, "gright"))
      .toDF("chrom", "start", "end", "name")
    // upstream of a "-" feature = genomic right; ignoring downstream
    // (= genomic left here) leaves only gright
    val out = Closest.closest(a, Some(b), k = 1, ignoreDownstream = true,
      directionCol = Some("strand"), suffixes = ("_1", "_2"))
    assertFrame(out.select($"name_2", $"distance"),
      Seq(Seq("gright", 5L)), "name_2", "distance")
  }

  test("closest tieBreakingExpr: arbitrary df2 expression, lower wins") {
    val a = Seq(("chr1", 10L, 15L)).toDF("chrom", "start", "end")
    // two equidistant upstream neighbors (both end at 8 -> distance 2)
    val b = Seq(("chr1", 2L, 8L, "lo", 1L), ("chr1", 4L, 8L, "hi", 9L))
      .toDF("chrom", "start", "end", "name", "score")
    def pick(tie: org.apache.spark.sql.Column) =
      Closest.closest(a, Some(b), k = 1, tieBreakingExpr = Some(tie),
        suffixes = ("_1", "_2")).select($"name_2").collect()(0).getString(0)
    assert(pick(col("score")) == "lo")        // lower score wins
    assert(pick(-col("score")) == "hi")       // negate -> higher score wins
    assert(pick(col("score") * -2 + 1) == "hi") // compound expression
    // parity with tieBreakingCol on the same column
    val byCol = Closest.closest(a, Some(b), k = 1,
      tieBreakingCol = Some("score"), suffixes = ("_1", "_2"))
      .select($"name_2").collect()(0).getString(0)
    assert(byCol == pick(col("score")))
    // mutual exclusion
    intercept[IllegalArgumentException] {
      Closest.closest(a, Some(b), k = 1, tieBreakingCol = Some("score"),
        tieBreakingExpr = Some(col("score")), suffixes = ("_1", "_2"))
    }
  }

  test("closest self-join excludes identical rows") {
    val a = Seq(("chr1", 0L, 5L, "x"), ("chr1", 7L, 9L, "y"),
      ("chr1", 20L, 22L, "z")).toDF("chrom", "start", "end", "name")
    val out = Closest.closest(a, None, k = 1, suffixes = ("_1", "_2"))
    assertFrame(out.select($"name_1", $"name_2", $"distance"),
      Seq(Seq("x", "y", 2L), Seq("y", "x", 2L), Seq("z", "y", 11L)),
      "name_1", "name_2", "distance")
  }

  test("BinnedTwoLevel matches Binned on heavy-tailed lengths " +
    "(incl. megabase-analog spans and points)") {
    val rnd = new scala.util.Random(7)
    val mk = (n: Int) => (0 until n).map { i =>
      val chrom = "chr" + (rnd.nextInt(3) + 1)
      val s = rnd.nextInt(5000).toLong
      // heavy tail: mostly short, some spanning most of the axis
      val len = rnd.nextInt(4) match {
        case 0 => 0L // points
        case 1 => rnd.nextInt(10).toLong
        case 2 => rnd.nextInt(100).toLong
        case _ => 1000L + rnd.nextInt(4000).toLong
      }
      (chrom, s, s + len, i.toLong)
    }.toDF("chrom", "start", "end", "id")
    val a = ColSpec.suffixAll(mk(150), "_1")
    val b = ColSpec.suffixAll(mk(120), "_2")
    val (c1, c2) = (ColSpec.default.withSuffix("_1"), ColSpec.default.withSuffix("_2"))
    def pairsOf(st: IntervalJoin.Strategy) = rowsOf(
      IntervalJoin.pairs(a, b, c1, c2, Nil, st, binSize = 16)
        .select($"id_1", $"id_2"))
    assert(pairsOf(IntervalJoin.BinnedTwoLevel) ==
      pairsOf(IntervalJoin.Binned))
    // r16: the adaptive coarse width (any value the clamp can produce)
    // must leave the pair multiset invariant — the closed-form
    // overlap-start-bin dedup holds at every width, so exercise the
    // Auto path (probe-derived width) against the fixed-width strategies
    val prev = spark.conf.getOption(IntervalJoin.ProbeThresholdKey)
    spark.conf.set(IntervalJoin.ProbeThresholdKey, "1")
    try assert(pairsOf(IntervalJoin.Auto) == pairsOf(IntervalJoin.Binned))
    finally prev match {
      case Some(v) => spark.conf.set(IntervalJoin.ProbeThresholdKey, v)
      case None => spark.conf.unset(IntervalJoin.ProbeThresholdKey)
    }
  }

  test("adaptiveCoarse: clamped to [longCap/4, 64*binSize], rounded up " +
    "to a power of two, and tracks sqrt(p99*p50)") {
    import IntervalJoin.adaptiveCoarse
    // ivLong-shaped probe at the gates' B=64: sqrt(723*15)=104 -> 128
    assert(adaptiveCoarse(64, 15.0, 723.0) == 128L)
    // huge tail clamps at the legacy 64*binSize ceiling
    assert(adaptiveCoarse(64, 15.0, 1e9) == 64L * 64)
    // tiny spans clamp at the longCap/4 floor (short x long stays <= 5
    // bins per short row)
    assert(adaptiveCoarse(64, 1.0, 1.0) == 128L)
    // genomic-scale defaults: p99 5e7, p50 1e4 -> sqrt = 7.07e5 -> pow2
    // 2^20, floored at longCap/4 = 2e6
    assert(adaptiveCoarse(1000000L, 1e4, 5e7) == 2000000L)
    // exact power of two stays (no over-rounding)
    assert(adaptiveCoarse(64, 256.0, 256.0) == 256L)
  }

  // ---- brute-force cross-check on random intervals ----
  test("overlap inner matches O(n^2) brute force on random data") {
    val rnd = new scala.util.Random(42)
    val mk = (n: Int) => (0 until n).map { i =>
      val chrom = "chr" + (rnd.nextInt(3) + 1)
      val s = rnd.nextInt(60).toLong
      val len = rnd.nextInt(8).toLong // includes zero-length points
      (chrom, s, s + len, i.toLong)
    }
    val xs = mk(80); val ys = mk(60)
    val a = xs.toDF("chrom", "start", "end", "id")
    val b = ys.toDF("chrom", "start", "end", "id")
    val got = rowsOf(Ops.overlap(a, b, how = "inner", suffixes = ("_1", "_2"),
      strategy = IntervalJoin.Binned, binSize = 16)
      .select($"id_1", $"id_2"))
    val exp = (for {
      (c1, s1, e1, i1) <- xs
      (c2, s2, e2, i2) <- ys
      e1p = if (e1 == s1) s1 + 1 else e1
      e2p = if (e2 == s2) s2 + 1 else e2
      if c1 == c2 && s1 < e2p && s2 < e1p
    } yield Seq[Any](i1, i2)).sortBy(_.mkString(" "))
    assert(got == exp)
  }

  test("closest k=2 matches brute force on random data") {
    val rnd = new scala.util.Random(7)
    val mk = (n: Int, tag: String) => (0 until n).map { i =>
      val chrom = "chr" + (rnd.nextInt(2) + 1)
      val s = rnd.nextInt(100).toLong
      (chrom, s, s + rnd.nextInt(6).toLong + 1, i.toLong)
    }
    val xs = mk(40, "a"); val ys = mk(30, "b")
    val a = xs.toDF("chrom", "start", "end", "id")
    val b = ys.toDF("chrom", "start", "end", "id")
    val got = rowsOf(
      Closest.closest(a, Some(b), k = 2, tieBreakingCol = Some("id"),
        suffixes = ("_1", "_2"), binSize = 16)
        .filter($"id_2".isNotNull)
        .select($"id_1", $"id_2", $"distance"))
    val exp = xs.flatMap { case (c1, s1, e1, i1) =>
      ys.filter(_._1 == c1).map { case (_, s2, e2, i2) =>
        val dist = math.max(0L, math.max(s1 - e2, s2 - e1))
        val ovl = s1 < (if (e2 == s2) s2 + 1 else e2) &&
          s2 < (if (e1 == s1) s1 + 1 else e1)
        (i1, i2, dist, if (ovl) 0L else dist + 1L)
      }.sortBy(t => (t._4, t._2)).take(2).map(t => Seq[Any](i1, t._2, t._3))
    }.sortBy(_.mkString(" "))
    assert(got == exp)
  }

  test("withOrd refuses a fact-sized input instead of single-partitioning it") {
    val big = spark.range(Ops.MaxOrdViewRows + 2).toDF("id")
    val e = intercept[IllegalArgumentException](Ops.withOrd(big))
    assert(e.getMessage.contains("single partition"))
    // dimension-sized views still work and keep their order contract
    val small = Seq(("chr2", 0L, 10L), ("chr1", 0L, 10L)).toDF("chrom", "start", "end")
    assert(Ops.withOrd(small).select("chrom", "ord").collect().toSeq
      .map(r => (r.getString(0), r.getInt(1))) == Seq(("chr2", 0), ("chr1", 1)))
  }
}
