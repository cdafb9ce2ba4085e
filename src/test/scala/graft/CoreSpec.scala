package graft

import graft.core.{Checks, ColSpec, NatOrder, Region}
import org.apache.spark.sql.functions._

class RegionSpec extends org.scalatest.funsuite.AnyFunSuite {
  // grammar cases from reference stringops tests
  test("parse plain and humanized region strings") {
    assert(Region.parseString("chr5:10,100,000-30,000,000") ==
      Region("chr5", Some(10100000L), Some(30000000L)))
    assert(Region.parseString("chr1:1K-2M") ==
      Region("chr1", Some(1000L), Some(2000000L)))
    assert(Region.parseString("chr1:1.5kb-2Gb") ==
      Region("chr1", Some(1500L), Some(2000000000L)))
    assert(Region.parseString("chrX") == Region("chrX", None, None))
    assert(Region.parseString("chrX:100-") == Region("chrX", Some(100L), None))
    assert(Region.parseString(" chr2 : 10 - 20 ") ==
      Region("chr2", Some(10L), Some(20L)))
  }

  test("resolve fills bounds from chromsizes and checks them") {
    val r = Region.parseString("chr1:100-").resolve(Map("chr1" -> 1000L))
    assert(r == Region("chr1", Some(100L), Some(1000L)))
    intercept[IllegalArgumentException] {
      Region.parseString("chr1:100-2000").resolve(Map("chr1" -> 1000L))
    }
    intercept[IllegalArgumentException] { Region.parseString(":10-20") }
    intercept[IllegalArgumentException] {
      Region.parseString("chr1:20-10").resolve()
    }
  }

  test("ucsc round trip") {
    assert(Region.isCompleteUcscString("chr1:0-100"))
    assert(!Region.isCompleteUcscString("chr1"))
    assert(Region("chr1", Some(5L), Some(10L)).toUcscString == "chr1:5-10")
  }

  test("is_complete_ucsc_string: humanized units complete, bare range or " +
    "name alone incomplete (test_core_stringops.py:63-69)") {
    assert(Region.isCompleteUcscString("chrX:1M-2M"))
    assert(!Region.isCompleteUcscString("1M-2M"))
    assert(!Region.isCompleteUcscString("chrX"))
  }

  test("parse Ensembl, FASTA-pipe, dotted, and hyphenated sequence names " +
    "(test_core_stringops.py:12-55)") {
    assert(Region.parseString("6:1000-2000") ==
      Region("6", Some(1000L), Some(2000L)))
    assert(Region.parseString("gb|accession|locus:1,000-2,000") ==
      Region("gb|accession|locus", Some(1000L), Some(2000L)))
    assert(Region.parseString("GL000207.1:1000-2000") ==
      Region("GL000207.1", Some(1000L), Some(2000L)))
    assert(Region.parseString("name-with-hyphens-") ==
      Region("name-with-hyphens-", None, None))
    intercept[IllegalArgumentException] {
      Region.parseString("chr1::1000-2000")
    }
  }
}

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  test("is_bedframe: schema + null-discipline + start<=end") {
    val ok = Seq(("chr1", 1L, 5L)).toDF("chrom", "start", "end")
    assert(Checks.isBedframe(ok))
    val bad = Seq(("chr1", 7L, 5L)).toDF("chrom", "start", "end")
    assert(!Checks.isBedframe(bad))
    val partialNull = Seq(("chr1", Some(1L), Option.empty[Long]))
      .toDF("chrom", "start", "end")
    assert(!Checks.isBedframe(partialNull))
  }

  test("is_overlapping detects internal overlaps via window sweep") {
    val no = Seq(("chr1", 1L, 5L), ("chr1", 5L, 8L), ("chr2", 0L, 9L))
      .toDF("chrom", "start", "end")
    assert(!Checks.isOverlapping(no))
    val yes = Seq(("chr1", 1L, 5L), ("chr1", 4L, 8L)).toDF("chrom", "start", "end")
    assert(Checks.isOverlapping(yes))
  }

  test("is_viewframe requires unique names and no overlap") {
    val v = Seq(("chr1", 0L, 10L, "a"), ("chr1", 10L, 20L, "b"))
      .toDF("chrom", "start", "end", "name")
    assert(Checks.isViewframe(v))
    val dup = Seq(("chr1", 0L, 10L, "a"), ("chr1", 10L, 20L, "a"))
      .toDF("chrom", "start", "end", "name")
    assert(!Checks.isViewframe(dup))
  }

  test("is_chrom_dtype: string-ish dtypes pass, numerics fail " +
    "(reference core/specs.py:142-152)") {
    import org.apache.spark.sql.types._
    import graft.core.Checks
    assert(Checks.isChromDtype(StringType))
    assert(Checks.isChromDtype(VarcharType(10)))
    assert(Checks.isChromDtype(CharType(5)))
    assert(!Checks.isChromDtype(IntegerType))
    assert(!Checks.isChromDtype(LongType))
    assert(!Checks.isChromDtype(BinaryType))
    val df = spark.range(1).selectExpr("'chr1' AS chrom", "id AS start")
    assert(Checks.isChromDtype(df, "chrom"))
    assert(!Checks.isChromDtype(df, "start"))
    assert(!Checks.isChromDtype(df, "missing"))
  }

  test("natural sort orders chr2 before chr10, letters last") {
    val names = Seq("chr10", "chr2", "chrX", "chr1").toDF("name")
    val sorted = names.orderBy(NatOrder.sortKeys(col("name")): _*)
      .collect().map(_.getString(0)).toSeq
    assert(sorted == Seq("chr1", "chr2", "chr10", "chrX"))
  }
}
