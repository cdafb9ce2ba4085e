package graft

import graft.ops.Ops
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-operator algebraic invariants on seeded random interval frames
  * (points, touching intervals, duplicates, multi-chrom). These are the
  * identities a user of the engine implicitly relies on; each is checked
  * through INDEPENDENT operator paths so a bug must corrupt both sides
  * identically to slip through. Complements the per-operator golden
  * frames, which pin small exact outputs. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def mk(seed: Int, n: Int, maxCoord: Int = 400): DataFrame = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val chrom = s"chr${rnd.nextInt(3)}"
      val s = rnd.nextInt(maxCoord).toLong
      val len = if (rnd.nextInt(5) == 0) 0L else rnd.nextInt(60).toLong
      (chrom, s, s + len, i.toLong)
    }.toDF("chrom", "start", "end", "id")
  }

  test("merge invariants: counts conserved, runs separated, every input " +
    "contained, both strategies identical") {
    for (seed <- Seq(1, 2, 3)) {
      val a = mk(seed, 250)
      val m = Ops.merge(a, Some(0)).cache()
      // interval count conservation
      assert(m.agg(sum($"n_intervals")).head().getLong(0) == 250L)
      // strictly separated runs per chrom (touching would have merged)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"chrom").orderBy($"start")
      assert(m.withColumn("__pe", lag($"end", 1).over(w))
        .filter($"__pe".isNotNull && $"start" <= $"__pe").count() == 0)
      // every input interval sits inside exactly one run
      val cover = a.join(m.select($"chrom", $"start".as("ms"), $"end".as("me")),
        Seq("chrom"), "inner")
        .filter($"start" >= $"ms" && $"end" <= $"me")
      assert(cover.select($"id").distinct().count() == 250L)
      assert(cover.count() == 250L, "an input matched two runs")
      // the two physical strategies are the same relation
      val viaWindow = Ops.merge(a, Some(0), mergeStrategy = Ops.WindowSweep)
      assert(m.exceptAll(viaWindow).count() == 0 &&
        viaWindow.exceptAll(m).count() == 0)
      m.unpersist()
    }
  }

  test("subtract conserves bp: fragments of each parent = parent length " +
    "minus covered bp (independent coverage path)") {
    for (seed <- Seq(4, 5)) {
      val a = mk(seed, 200)
      val b = mk(seed + 100, 150)
      val frags = Ops.subtract(a, b, binSize = 32)
        .groupBy($"id").agg(sum($"end" - $"start").as("frag_bp"))
      val cov = Ops.coverage(a, b, binSize = 32)
        .select($"id", ($"end" - $"start" - $"coverage").as("expect_bp"))
      val j = cov.join(frags, Seq("id"), "left")
        .withColumn("frag_bp", coalesce($"frag_bp", lit(0L)))
      assert(j.filter($"frag_bp" =!= $"expect_bp").count() == 0)
    }
  }

  test("merge + complement tile the view: bp sums to the view size and " +
    "the two relations never overlap") {
    val view = Seq(("chr0", 0L, 500L, "r0"), ("chr1", 0L, 500L, "r1"),
      ("chr2", 0L, 500L, "r2")).toDF("chrom", "start", "end", "name")
    for (seed <- Seq(6, 7)) {
      val a = mk(seed, 200) // coords lie inside [0, 460] ⊂ view by construction
      val m = Ops.merge(a, Some(0)).select($"chrom", $"start", $"end")
      val c = Ops.complement(a, view).select($"chrom", $"start", $"end")
      val bp = (df: DataFrame) =>
        df.agg(coalesce(sum($"end" - $"start"), lit(0L))).head().getLong(0)
      assert(bp(m) + bp(c) == 1500L,
        s"merge ${bp(m)} + complement ${bp(c)} != view 1500")
      // zero-length runs (lone points) occupy no bp and legitimately sit
      // inside a complement gap under point promotion — exclude them
      assert(Ops.overlap(m.filter($"end" > $"start"), c, how = "inner",
        suffixes = ("_1", "_2"), binSize = 32).count() == 0)
    }
  }
}
