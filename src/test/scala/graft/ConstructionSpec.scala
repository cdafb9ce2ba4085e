package graft

import graft.core.{Checks, Construction}
import graft.syntax._
import org.apache.spark.sql.functions._

class ConstructionSpec extends SparkSpec {
  import spark.implicits._

  test("fromChromsizes / fromUcscStrings build bedframes") {
    val cs = Construction.fromChromsizes(spark, Map("chr1" -> 100L, "chr2" -> 50L))
    assertFrame(cs, Seq(Seq("chr1", 0L, 100L), Seq("chr2", 0L, 50L)),
      "chrom", "start", "end")
    val u = Construction.fromUcscStrings(spark,
      Seq("chr1:10-20", "chr2:0-1k"), Map("chr1" -> 100L, "chr2" -> 2000L))
    assertFrame(u, Seq(Seq("chr1", 10L, 20L), Seq("chr2", 0L, 1000L)),
      "chrom", "start", "end")
    // missing end filled from chromsizes
    val f = Construction.fromUcscStrings(spark, Seq("chr1"), Map("chr1" -> 77L))
    assertFrame(f, Seq(Seq("chr1", 0L, 77L)), "chrom", "start", "end")
  }

  test("addUcscNameColumn round-trips through fromUcscStrings " +
    "(test_core_construction.py:11-46)") {
    import graft.core.Construction
    val df = Construction.fromTuples(spark,
      Seq(("chr0", 1L, 4L), ("chr1", 2L, 5L), ("chr2", 3L, 6L)))
    val named = Construction.addUcscNameColumn(df)
    val names = named.orderBy("chrom").select("name")
      .collect().map(_.getString(0)).toSeq
    assert(names == Seq("chr0:1-4", "chr1:2-5", "chr2:3-6"))
    val back = Construction.fromUcscStrings(spark, names)
    assert(rowsOf(back) == rowsOf(df))
  }

  test("makeViewframe auto-names and validates") {
    val v = Construction.makeViewframe(
      Construction.fromChromsizes(spark, Map("chr1" -> 10L)))
    assertFrame(v.select($"name"), Seq(Seq("chr1:0-10")), "name")
    val overlapping = Seq(("chr1", 0L, 5L), ("chr1", 3L, 8L))
      .toDF("chrom", "start", "end")
    intercept[IllegalArgumentException] {
      Construction.makeViewframe(overlapping)
    }
  }

  test("sanitizeBedframe: null-triple completion + start/end flip") {
    val dirty = Seq(
      (Some("chr1"), Some(9L), Some(3L)),
      (Some("chr1"), None, Some(5L)),
      (Some("chr2"), Some(1L), Some(2L)))
      .toDF("chrom", "start", "end")
    val out = Construction.sanitizeBedframe(dirty)
    assertFrame(out, Seq(
      Seq("chr1", 3L, 9L), Seq(null, null, null), Seq("chr2", 1L, 2L)),
      "chrom", "start", "end")
    assert(Checks.isBedframe(out))
  }

  test("sanitizeBedframe dropNull removes incomplete rows " +
    "(test_core_construction.py:96-116)") {
    val dirty = Seq(
      (Some("chr1"), Some(10L), Some(20L)),
      (Some("chr1"), Some(10L), Some(20L)),
      (Some("chr1"), Some(15L), None),
      (Some("chr1"), None, Some(25L)))
      .toDF("chrom", "start", "end")
    val out = Construction.sanitizeBedframe(dirty, dropNull = true)
    assertFrame(out, Seq(Seq("chr1", 10L, 20L), Seq("chr1", 10L, 20L)),
      "chrom", "start", "end")
  }

  test("sanitizeBedframe flip+dropNull keeps the flipped row only; " +
    "drop+dropNull empties it (test_core_construction.py:137-169)") {
    val dirty = Seq(
      (Some("chr1"), Some(20L), Some(10L)),
      (Some("chr1"), None, Some(25L)))
      .toDF("chrom", "start", "end")
    val flipped = Construction.sanitizeBedframe(dirty, dropNull = true,
      startExceedEnd = "flip")
    assertFrame(flipped, Seq(Seq("chr1", 10L, 20L)), "chrom", "start", "end")
    val dropped = Construction.sanitizeBedframe(dirty, dropNull = true,
      startExceedEnd = "drop")
    assert(dropped.count() == 0)
  }

  test("makeViewframe nameStyle=None names by chromosome; caller-provided " +
    "unique names pass unchanged (test_core_construction.py:171-227)") {
    val plain = Construction.makeViewframe(
      Construction.fromChromsizes(spark, Map("chrTESTXq" -> 5L, "chrTEST_2p" -> 8L)),
      nameStyle = None)
    assertFrame(plain.select($"chrom", $"name"),
      Seq(Seq("chrTESTXq", "chrTESTXq"), Seq("chrTEST_2p", "chrTEST_2p")),
      "chrom", "name")
    val named = Seq(("chrTESTX", 0L, 10L, "chrTEST_1"),
      ("chrTESTY", 0L, 12L, "chrTEST_2")).toDF("chrom", "start", "end", "name")
    assert(rowsOf(Construction.makeViewframe(named)) == rowsOf(named))
    intercept[IllegalArgumentException] {
      Construction.makeViewframe(named, nameStyle = Some("banana"))
    }
  }

  test("is_covering / is_tiling on a complete tiling") {
    val view = Seq(("chr1", 0L, 10L, "r1")).toDF("chrom", "start", "end", "name")
    val tiles = Seq(("chr1", 0L, 4L), ("chr1", 4L, 10L)).toDF("chrom", "start", "end")
    assert(Checks.isCovering(tiles, view))
    assert(Checks.isTiling(tiles, view))
    val gappy = Seq(("chr1", 0L, 4L), ("chr1", 6L, 10L)).toDF("chrom", "start", "end")
    assert(!Checks.isCovering(gappy, view))
  }

  test("fromAny routes every RegionsLike shape to its builder " +
    "(reference construction.py:119-171)") {
    import Construction.RegionsLike._
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("chrom", "start").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val want = Seq(("chr1", 0L, 100L), ("chr2", 5L, 50L))
    // explicit constructors
    assert(rows(Construction.fromAny(spark,
      Tuples(Seq(("chr1", 0L, 100L), ("chr2", 5L, 50L))))) == want)
    assert(rows(Construction.fromAny(spark,
      UcscStrings(Seq("chr1:0-100", "chr2:5-50")))) == want)
    assert(rows(Construction.fromAny(spark,
      Chromsizes(Map("chr1" -> 100L, "chr2" -> 200L)))) ==
      Seq(("chr1", 0L, 100L), ("chr2", 0L, 200L)))
    // single UCSC string; open end resolved from chromsizes
    assert(rows(Construction.fromAny(spark, Ucsc("chr1:10-"),
      chromsizes = Map("chr1" -> 90L))) == Seq(("chr1", 10L, 90L)))
    // named tuples carry the fourth column
    val named = Construction.fromAny(spark,
      NamedTuples(Seq(("chr1", 0L, 10L, "a"))))
    assert(named.columns.toSeq == Seq("chrom", "start", "end", "name"))
    // a frame passes through untouched (same plan, not a copy)
    val df = Seq(("chr1", 1L, 2L)).toDF("chrom", "start", "end")
    assert(Construction.fromAny(spark, Frame(df)) eq df)
    // implicit conversions: call sites read like the reference's
    // duck-typed from_any
    assert(rows(Construction.fromAny(spark, "chr2:5-50")) ==
      Seq(("chr2", 5L, 50L)))
    assert(rows(Construction.fromAny(spark,
      Map("chrX" -> 10L))) == Seq(("chrX", 0L, 10L)))
    assert(Construction.fromAny(spark, df) eq df)
  }

  test("fluent syntax delegates to Ops") {
    val a = Seq(("chr1", 0L, 5L), ("chr1", 20L, 30L)).toDF("chrom", "start", "end")
    val b = Seq(("chr1", 3L, 8L)).toDF("chrom", "start", "end")
    assert(a.bf.overlap(b, how = "inner").count() == 1)
    assert(a.bf.countOverlaps(b).filter($"count" === 0).count() == 1)
    assert(a.bf.merge().count() == 2)
    assert(a.bf.closestTo(b).count() == 2)
  }
}
