package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._

/** Z-order layout: interleave correctness against a driver-side
  * reference, saturating clamp, bounded prefix-cell extents, two-axis
  * skipping vs lexicographic, and the range-partitioned write path. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference interleave: bit i of value j at i*n+j. */
  private def refZ(vals: Seq[Long], bits: Int): Long = {
    var z = 0L
    val n = vals.size
    for (i <- 0 until bits; j <- 0 until n)
      z |= ((vals(j) >>> i) & 1L) << (i * n + j)
    z
  }

  test("2-col magic-mask spread matches the per-bit reference") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(1 << 21).toLong,
      rnd.nextInt(1 << 21).toLong)) :+ ((0L, 0L)) :+
      (((1L << 21) - 1, (1L << 21) - 1))
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"),
        Layout.zValue(Seq(col("a"), col("b")), 21).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, z) =>
      assert(z == refZ(Seq(a, b), 21), s"($a,$b)")
      assert(z >= 0)
    }
  }

  test("3-col per-bit fold matches the reference") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(100)((rnd.nextInt(1 << 10).toLong,
      rnd.nextInt(1 << 10).toLong, rnd.nextInt(1 << 10).toLong))
    val got = rows.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        Layout.zValue(Seq(col("a"), col("b"), col("c")), 10).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(3) ==
        refZ(Seq(r.getLong(0), r.getLong(1), r.getLong(2)), 10))
    }
  }

  test("clamped z saturates, never wraps") {
    val df = Seq((-5L, 99L), ((1L << 30), 99L)).toDF("a", "b")
      .select(Layout.zValueClamped(Seq(col("a"), col("b")), 21).as("z"))
      .collect().map(_.getLong(0))
    assert(df(0) == refZ(Seq(0L, 99L), 21))
    assert(df(1) == refZ(Seq((1L << 21) - 1, 99L), 21))
    // monotone at the edge: the saturated code is >= any in-domain code
    assert(df(1) >= refZ(Seq((1L << 21) - 2, 99L), 21))
  }

  test("prefix cells are bounded axis-aligned boxes") {
    val rnd = new scala.util.Random(3)
    val df = Seq.fill(5000)((rnd.nextInt(1 << 21).toLong,
      rnd.nextInt(1 << 21).toLong)).toDF("a", "b")
    val stats = Layout.zLayoutStats(df, Seq("a", "b"), 21, 6).collect()
    // 6 file bits over a 42-bit z = top 3 bits of each axis: every
    // cell's extent per axis is at most 2^18
    stats.foreach { r =>
      val (fid, n) = (r.getLong(0), r.getLong(1))
      assert(fid >= 0 && fid < 64 && n > 0)
      assert(r.getLong(3) - r.getLong(2) < (1L << 18), "a-extent")
      assert(r.getLong(5) - r.getLong(4) < (1L << 18), "b-extent")
    }
  }

  test("z-order skips on BOTH axes; lexicographic only on the leading") {
    val rnd = new scala.util.Random(5)
    val df = Seq.fill(20000)((rnd.nextInt(1 << 21).toLong,
      rnd.nextInt(1 << 21).toLong)).toDF("a", "b")
    val zStats = Layout.zLayoutStats(df, Seq("a", "b"), 21, 6)
    // a narrow band at mid-domain (an edge band would dodge even the
    // lexicographic layout's file minima and understate its admission)
    val box = ((1L << 20), (1L << 20) + 1000L)
    val onA = Layout.admittedFileFraction(zStats, Seq("a", "b"),
      Seq((Some(box._1), Some(box._2)), (None, None)))
    val onB = Layout.admittedFileFraction(zStats, Seq("a", "b"),
      Seq((None, None), (Some(box._1), Some(box._2))))
    // 8x8 grid: a narrow band on either axis admits ~1 of 8 columns
    assert(onA <= 0.25, s"onA=$onA")
    assert(onB <= 0.25, s"onB=$onB")
    // lexicographic (a, b) layout: same file count by a-rank buckets
    val lex = df.withColumn("file_id",
        ntile(64).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("a"), col("b"))).cast("long") - 1)
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min(col("a")).as("min_a"), max(col("a")).as("max_a"),
        min(col("b")).as("min_b"), max(col("b")).as("max_b"))
    val lexOnB = Layout.admittedFileFraction(lex, Seq("a", "b"),
      Seq((None, None), (Some(box._1), Some(box._2))))
    assert(lexOnB > 0.95, s"lexOnB=$lexOnB — trailing axis never skips")
  }

  test("scaled stats spread a tiny domain across the grid") {
    val rnd = new scala.util.Random(21)
    // domain [1, 200] x [1, 10] — raw 21-bit lanes would put every row
    // in cell 0; scaling must fan them across many cells
    val df = Seq.fill(5000)((rnd.nextInt(200).toLong + 1,
      rnd.nextInt(10).toLong + 1)).toDF("a", "b")
    val stats = Layout.zLayoutStatsScaled(df, Seq("a", "b"), 21, 6)
      .collect()
    assert(stats.length > 30, s"cells=${stats.length}")
    assert(stats.map(_.getLong(1)).sum == 5000)
    // extents stay in original units
    stats.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(3) <= 200)
      assert(r.getLong(4) >= 1 && r.getLong(5) <= 10)
    }
    val raw = Layout.zLayoutStats(df, Seq("a", "b"), 21, 6).collect()
    assert(raw.length == 1, "raw lanes collapse — the motivation")
  }

  test("zOrderWrite round-trips and clusters within files") {
    val rnd = new scala.util.Random(9)
    val df = Seq.fill(4000)((rnd.nextInt(1 << 21).toLong,
      rnd.nextInt(1 << 21).toLong)).toDF("a", "b")
    val path = java.nio.file.Files
      .createTempDirectory("zorder").toString + "/t"
    Layout.zOrderWrite(df, path, Seq("a", "b"), numFiles = 8)
    val back = spark.read.parquet(path)
    assert(back.count() == 4000)
    assert(back.columns.toSet == Set("a", "b"))
    // per written file the z extent is a narrow slice of the curve
    val z = Layout.zValueClamped(Seq(col("a"), col("b")), 21)
    val spans = back
      .select(input_file_name().as("f"), z.as("z"))
      .groupBy("f").agg((max("z") - min("z")).as("span"))
      .collect()
    assert(spans.length >= 4) // range partitioner may coalesce a bit
    val full = (1L << 42) - 1
    spans.foreach(r => assert(r.getLong(1) < full / 2))
  }

  test("planCompaction: groups hit the target, partition-local, " +
    "oversized files isolate, order-deterministic") {
    import spark.implicits._
    // partition p0: 6 files of 300 bytes; target 1000 -> groups of
    // sizes 1200/600 (cumulative cut at each multiple of 1000)
    val p0 = (0 until 6).map(i => ("p0", f"f$i%03d", 300L))
    // partition p1: one 5000-byte monster + two 100-byte files
    val p1 = Seq(("p1", "a", 5000L), ("p1", "b", 100L), ("p1", "c", 100L))
    val stats = (p0 ++ p1).toDF("part", "file", "bytes")
    val out = Layout.planCompaction(stats, Seq("part"), "file", "bytes",
      targetBytes = 1000L).collect()
    val byFile = out.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(3), r.getLong(4))).toMap
    // p0: f0..f3 have before 0,300,600,900 -> group 0 (1200 bytes);
    // f4,f5 before 1200,1500 -> group 1 (600 bytes)
    (0 until 4).foreach(i => assert(byFile(("p0", f"f$i%03d")) == (0L, 1200L)))
    (4 until 6).foreach(i => assert(byFile(("p0", f"f$i%03d")) == (1L, 600L)))
    // p1: the monster is alone in group 0; b lands at before=5000 ->
    // group 5; c at 5100 -> group 5 too
    assert(byFile(("p1", "a")) == (0L, 5000L))
    assert(byFile(("p1", "b"))._1 == 5L && byFile(("p1", "c"))._1 == 5L)
    assert(byFile(("p1", "b"))._2 == 200L)
    // every group's bytes < target + max file size (no unbounded group)
    out.groupBy(r => (r.getString(0), r.getLong(3))).foreach {
      case (_, rows) => assert(rows.head.getLong(4) < 1000L + 5000L)
    }
    // deterministic under repartitioning
    val re = Layout.planCompaction(stats.repartition(5), Seq("part"),
      "file", "bytes", 1000L).collect()
    assert(re.map(r => (r.getString(0), r.getString(1), r.getLong(3)))
      .toSet == out.map(r => (r.getString(0), r.getString(1), r.getLong(3)))
      .toSet)
  }
}
