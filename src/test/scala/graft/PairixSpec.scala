package graft

import graft.io.Pairix
import org.apache.spark.sql.functions._

/** Pairix-style 2D queries over bgzip'd .pairs files. */
class PairixSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_px").toString
    s"$d/$name"
  }

  private def pairs = Seq(
    ("p1", "chr1", 100L, "chr2", 5000L, "+", "-"),
    ("p2", "chr1", 200L, "chr2", 9000L, "+", "+"),
    ("p3", "chr1", 300L, "chr3", 100L, "-", "+"),
    ("p4", "chr2", 50L, "chr2", 60L, "+", "+"),
    ("p5", "chr1", 150L, "chr2", 5050L, "-", "-"))
    .toDF("read_id", "chrom1", "pos1", "chrom2", "pos2", "strand1", "strand2")

  test("query2D returns pairs matching BOTH ranges, named from the " +
    "#columns header") {
    val p = tmp("t.pairs.gz")
    Pairix.write(pairs, p)
    assert(Pairix.headerColumns(p).get ==
      Seq("read_id", "chrom1", "pos1", "chrom2", "pos2", "strand1", "strand2"))
    // chr1 x chr2, pos1-1 in [99, 250), pos2-1 in [4500, 5500)
    val got = Pairix.read(spark, p, "chr1", 99L, 250L,
      Some("chr2"), Some(4500L), Some(5500L))
    assert(got.columns.head == "read_id")
    assert(got.select("read_id").as[String].collect().toSet == Set("p1", "p5"))
    // widening dim 2 picks up p2
    assert(Pairix.read(spark, p, "chr1", 99L, 250L,
        Some("chr2"), Some(0L), Some(100000L))
      .select("read_id").as[String].collect().toSet == Set("p1", "p2", "p5"))
    // different block: chr1|chr3
    assert(Pairix.read(spark, p, "chr1", 0L, 1000L,
        Some("chr3"), Some(0L), Some(1000L))
      .select("read_id").as[String].collect().toSeq == Seq("p3"))
    // absent block key
    assert(Pairix.read(spark, p, "chr3", 0L, 1000L, Some("chr1")).isEmpty)
  }

  test("region2 defaults to region1 (reference read_pairix behavior)") {
    val p = tmp("d.pairs.gz")
    Pairix.write(pairs, p)
    // chr2 x chr2 cis pair: both coordinates inside [40, 70)
    val got = Pairix.read(spark, p, "chr2", 40L, 70L)
    assert(got.select("read_id").as[String].collect().toSeq == Seq("p4"))
  }
}
