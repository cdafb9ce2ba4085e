package graft

import graft.io.{Bbi, BigBed, BigWig}
import graft.sources.{BbiPartition, BbiScan, BbiScanBuilder}
import org.apache.spark.sql.functions._

/** BBI (bigWig/bigBed) container round-trips and index semantics. The
  * sandbox has no external bigWig tooling, so cross-implementation bytes
  * can't be checked here; these specs pin the published container layout
  * (header/chrom-B+tree/R-tree offsets, both byte orders, zlib sections)
  * via structural asserts plus full read-back equality. */
class BigWigSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_bbi").toString
    s"$d/$name"
  }

  private def sampleWig = Seq(
    ("chr1", 0L, 100L, 1.5), ("chr1", 100L, 250L, -2.0),
    ("chr1", 400L, 401L, 0.25), ("chr10", 5L, 50L, 3.0),
    ("chr2", 10L, 20L, 7.5), ("chr2", 20L, 40L, 0.0))
    .toDF("chrom", "start", "end", "value")

  test("bigWig round-trips losslessly: compressed/uncompressed, LE/BE") {
    for ((compress, be) <- Seq((true, false), (false, false), (true, true))) {
      val p = tmp(s"rt_${compress}_$be.bw")
      BigWig.write(sampleWig, p, compress = compress, bigEndian = be)
      assertFrame(BigWig.read(spark, p),
        sampleWig.collect().toSeq.map(_.toSeq),
        "chrom", "start", "end", "value")
    }
  }

  test("bigWig header/meta carries the documented fields and the R-tree " +
    "prunes a region fetch to overlapping sections") {
    val p = tmp("meta.bw")
    BigWig.write(sampleWig, p, itemsPerSection = 2)
    val meta = Bbi.readMeta(p, Bbi.BigWigMagic)
    assert(meta.header.version == 4 && meta.header.zoomLevels == 0)
    assert(meta.header.uncompressBufSize > 0)
    assert(meta.chroms.map(_._2).sorted == Seq("chr1", "chr10", "chr2"))
    // byte-sorted chrom ids: chr10 sorts before chr2
    assert(meta.chroms.sortBy(_._1).map(_._2) == Seq("chr1", "chr10", "chr2"))
    assert(meta.blocks.size >= 3) // >= one section per chrom at 2/section
    val chr1Ix = meta.chroms.find(_._2 == "chr1").get._1
    val pruned = Bbi.pruneBlocks(meta.blocks, chr1Ix, 380L, 500L)
    assert(pruned.size < meta.blocks.size && pruned.nonEmpty)
    // unclipped overlap fetch — same shape as Tables.readBedGraph region
    assertFrame(
      BigWig.read(spark, p, chrom = Some("chr1"), start = Some(50L),
        end = Some(120L)),
      Seq(Seq("chr1", 0L, 100L, 1.5), Seq("chr1", 100L, 250L, -2.0)),
      "chrom", "start", "end", "value")
    assert(BigWig.read(spark, p, chrom = Some("nope")).isEmpty)
  }

  test("nested-extent regression: a section's R-tree bound is its max " +
    "end, so a long run is still found via a late-coordinate query") {
    val p = tmp("nested.bw")
    val df = Seq(("chr1", 0L, 1000L, 1.0), ("chr1", 10L, 20L, 2.0),
      ("chr1", 2000L, 2010L, 3.0)).toDF("chrom", "start", "end", "value")
    BigWig.write(df, p, itemsPerSection = 2)
    assertFrame(
      BigWig.read(spark, p, chrom = Some("chr1"), start = Some(500L),
        end = Some(600L)),
      Seq(Seq("chr1", 0L, 1000L, 1.0)), "chrom", "start", "end", "value")
  }

  test("multi-level R-tree: >256 sections round-trip and region-fetch") {
    val p = tmp("big.bw")
    val df = spark.range(300).select(
      lit("chr1").as("chrom"), (col("id") * 10).as("start"),
      (col("id") * 10 + 10).as("end"), col("id").cast("double").as("value"))
    BigWig.write(df, p, itemsPerSection = 1)
    val meta = Bbi.readMeta(p, Bbi.BigWigMagic)
    assert(meta.blocks.size == 300)
    assert(BigWig.read(spark, p).count() == 300)
    assertFrame(
      BigWig.read(spark, p, chrom = Some("chr1"), start = Some(1500L),
        end = Some(1520L)),
      Seq(Seq("chr1", 1500L, 1510L, 150.0), Seq("chr1", 1510L, 1520L, 151.0)),
      "chrom", "start", "end", "value")
  }

  test("varStep and fixedStep section encodings decode (read-side parity " +
    "with files other tools write)") {
    val bb = java.nio.ByteBuffer.allocate(24 + 8 + 24 + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // varStep: span 5, items (100, 1.5)
    bb.putInt(0).putInt(100).putInt(105).putInt(0).putInt(5)
      .put(2.toByte).put(0.toByte).putShort(1.toShort)
    bb.putInt(100).putFloat(1.5f)
    // fixedStep: start 200, step 10, span 4, values (7.0, 8.0)
    bb.putInt(0).putInt(200).putInt(214).putInt(10).putInt(4)
      .put(3.toByte).put(0.toByte).putShort(2.toShort)
    bb.putFloat(7.0f).putFloat(8.0f)
    val got = BigWig.decodeSections(bb.array(), bigEndian = false)
    assert(got == Seq((0, 100L, 105L, 1.5), (0, 200L, 204L, 7.0),
      (0, 210L, 214L, 8.0)))
  }

  test("zoom levels: summary bins match a hand aggregation, region-fetch " +
    "through the level's own R-tree, browser pick rule") {
    val p = tmp("zoom.bw")
    BigWig.write(sampleWig, p, zoomReductions = Seq(100L, 400L))
    val meta = Bbi.readMeta(p, Bbi.BigWigMagic)
    assert(meta.header.zoomLevels == 2 &&
      meta.zooms.map(_.reduction) == Seq(100L, 400L))
    // zoom headers shift every downstream offset: base read must survive
    assertFrame(BigWig.read(spark, p), sampleWig.collect().toSeq.map(_.toSeq),
      "chrom", "start", "end", "value")
    // chr1 runs: [0,100)@1.5  [100,250)@-2.0  [400,401)@0.25
    // bin [0,100): n=100 sum=150; [100,200): n=100 sum=-200;
    // [200,300): n=50 sum=-100; [400,500): n=1 sum=0.25
    val z = BigWig.readZoom(spark, p, 100L, chrom = Some("chr1"))
      .select("start", "end", "valid_count", "min", "max", "sum")
    assertFrame(z, Seq(
      Seq(0L, 100L, 100L, 1.5, 1.5, 150.0),
      Seq(100L, 200L, 100L, -2.0, -2.0, -200.0),
      Seq(200L, 300L, 50L, -2.0, -2.0, -100.0),
      Seq(400L, 500L, 1L, 0.25, 0.25, 0.25)),
      "start", "end", "valid_count", "min", "max", "sum")
    // asking for a coarser reduction picks the largest level <= it
    assert(BigWig.readZoom(spark, p, 10000L).head().getLong(2) > 0)
    // region prune: only the bin overlapping [150, 160)
    assertFrame(
      BigWig.readZoom(spark, p, 100L, Some("chr1"), Some(150L), Some(160L))
        .select("start", "sum"),
      Seq(Seq(100L, -200.0)), "start", "sum")
  }

  test("empty relation round-trips to an empty, well-formed file") {
    val p = tmp("empty.bw")
    BigWig.write(sampleWig.filter(lit(false)), p)
    assert(Bbi.readMeta(p, Bbi.BigWigMagic).blocks.isEmpty)
    assert(BigWig.read(spark, p).isEmpty)
  }

  test("writer guard refuses unbounded relations") {
    val e = intercept[IllegalArgumentException](
      BigWig.write(sampleWig, tmp("guard.bw"), maxRows = 3))
    assert(e.getMessage.contains("single-writer"))
  }

  test("bigBed round-trips bed3+rest columns and region-fetches") {
    val p = tmp("rt.bb")
    val df = Seq(("chr1", 0L, 100L, "alpha", 960L),
      ("chr1", 150L, 170L, "beta", 5L), ("chr2", 10L, 20L, "gamma", 0L))
      .toDF("chrom", "start", "end", "name", "score")
    BigBed.write(df, p)
    val back = BigBed.read(spark, p)
      .select(col("chrom"), col("start"), col("end"),
        split(col("rest"), "\t")(0).as("name"),
        split(col("rest"), "\t")(1).cast("long").as("score"))
    assertFrame(back, df.collect().toSeq.map(_.toSeq),
      "chrom", "start", "end", "name", "score")
    val meta = Bbi.readMeta(p, Bbi.BigBedMagic)
    assert(meta.header.fieldCount == 5)
    assertFrame(
      BigBed.read(spark, p, chrom = Some("chr1"), start = Some(160L),
        end = Some(165L)).select(col("chrom"), col("start"), col("end")),
      Seq(Seq("chr1", 150L, 170L)), "chrom", "start", "end")
  }

  test("DSv2 bigwig region load option equals the Catalyst-predicate path") {
    val p = tmp("opt.bw")
    BigWig.write(sampleWig, p)
    val viaOpt = spark.read.format("bigwig")
      .option("region", "chr1:50-200").load(p)
    val viaFilter = spark.read.format("bigwig").load(p)
      .filter(col("chrom") === "chr1" &&
        col("start") < 200L && col("end") > 50L)
    assertFrame(viaOpt, rowsOf(viaFilter), "chrom", "start", "end", "value")
    assert(viaOpt.count() == 2) // [0,100) and [100,250) overlap [50,200)
  }

  test("DSv2 bigwig/bigbed formats: region predicates prune R-tree " +
    "blocks, columns prune, rows match the function readers") {
    val pw = tmp("dsv2.bw")
    // enough sections that region pruning is observable (one section per
    // 256 items by default — use many rows across chroms)
    val big = spark.range(3000).select(
      concat(lit("chr"), (col("id") % 3).cast("string")).as("chrom"),
      (col("id") * 10).as("start"), (col("id") * 10 + 8).as("end"),
      (col("id") % 7).cast("double").as("value"))
    BigWig.write(big.orderBy("chrom", "start"), pw)
    val t = spark.read.format("bigwig").load(pw)
    assert(t.count() == 3000)
    val q = t.filter(col("chrom") === "chr1" &&
      col("start") < 9000L && col("end") > 8000L)
    val exp = BigWig.read(spark, pw, Some("chr1"), Some(8000L), Some(9000L))
    assertFrame(q, rowsOf(exp), "chrom", "start", "end", "value")
    assert(q.queryExecution.executedPlan.toString.contains("region=chr1"),
      q.queryExecution.executedPlan.toString)
    // partition pruning: the region plans strictly fewer block bytes
    val sbN = new BbiScanBuilder(pw, Bbi.BigWigMagic, t.schema, "bigwig")
    sbN.pushFilters(Array(
      org.apache.spark.sql.sources.EqualTo("chrom", "chr1"),
      org.apache.spark.sql.sources.LessThan("start", 9000L),
      org.apache.spark.sql.sources.GreaterThan("end", 8000L)))
    def bytes(s: BbiScanBuilder) =
      s.build().asInstanceOf[BbiScan].planInputPartitions()
        .flatMap(_.asInstanceOf[BbiPartition].extents).map(_._2).sum
    val narrow = bytes(sbN)
    val full = bytes(new BbiScanBuilder(pw, Bbi.BigWigMagic, t.schema, "bigwig"))
    assert(narrow > 0 && narrow < full, s"narrow=$narrow full=$full")
    // column pruning: a value-only projection scans one-column rows
    assert(q.select("value").queryExecution.executedPlan.collectLeaves()
      .exists(_.schema.fieldNames.sameElements(Array("value"))))
    // bigbed through the same machinery
    val pb = tmp("dsv2.bb")
    BigBed.write(sampleWig.withColumnRenamed("value", "score"), pb)
    val tb = spark.read.format("bigbed").load(pb)
      .filter(col("chrom") === "chr2" && col("start") < 30L && col("end") > 15L)
    val expB = BigBed.read(spark, pb, Some("chr2"), Some(15L), Some(30L))
    assertFrame(tb, rowsOf(expB), "chrom", "start", "end", "rest")
    // unknown chromosome plans zero partitions
    assert(spark.read.format("bigwig").load(pw)
      .filter(col("chrom") === "nope").count() == 0)
  }
}
