package graft

import graft.io.Tabix
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the DataSource V2 tabix scan: for RANDOM regions
  * (including empty regions, whole-chromosome queries, bounds past the
  * data, and unknown chromosomes) the pushed-down filter path must equal
  * a brute-force filter of the full relation. This is the adversarial
  * surface of the pushdown translation — bin-boundary regions, the
  * linear-index cutoff, and the exactness claim for accepted filters
  * (Spark does NOT re-check them). */
class SourcePropertySpec extends SparkSpec {
  import spark.implicits._

  private lazy val path: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_srcprop").toString
    val p = s"$d/prop.bed.gz"
    // spans crossing 16 kb linear-index boundaries and three chroms
    val df = spark.range(4000).select(
      concat(lit("chr"), (col("id") % 3).cast("string")).as("chrom"),
      ((col("id") * 937) % 120000).as("start"),
      (((col("id") * 937) % 120000) + 1 + (col("id") % 300)).as("end"),
      col("id").as("name"))
    Tabix.write(df.withColumn("name", col("name").cast("string")), p)
    p
  }

  private lazy val full = spark.read.format("tabix")
    .option("preset", "bed4").load(path)
    .select("chrom", "start", "end", "name").cache()

  private val genRegion: Gen[(String, Long, Long)] = for {
    c <- Gen.oneOf("chr0", "chr1", "chr2", "chrNOPE")
    a <- Gen.choose(-100L, 130000L)
    w <- Gen.oneOf(Gen.const(0L), Gen.choose(1L, 40000L),
      Gen.const(1000000L)).flatMap(identity[Long] _)
  } yield (c, a, a + w)

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("random regions through the DSv2 filter equal a brute-force " +
    "filter of the full read") {
    val all = full.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    check(Prop.forAll(genRegion) { case (c, qs, qe) =>
      val got = spark.read.format("tabix").option("preset", "bed4")
        .load(path)
        .filter(col("chrom") === c && col("start") < qe && col("end") > qs)
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      val want = all.filter { case (cc, s, e, _) =>
        cc == c && s < qe && e > qs }
      got == want
    })
  }
}
