package graft

import graft.io.{Bgzf, Tabix}
import org.apache.spark.sql.functions._

/** BGZF + tabix round-trips and binning-index semantics. As with the BBI
  * specs, no external tabix tooling exists in the sandbox, so the
  * published layout is pinned structurally plus by full read-back
  * equality (raw BGZF bytes, .tbi codec, reg2bin identities, chunk
  * pruning, and both coordinate conventions). */
class TabixSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_tbx").toString
    s"$d/$name"
  }

  test("BGZF blocks round-trip bytes and honor virtual-offset ranges") {
    val p = tmp("t.gz")
    val w = new Bgzf.Writer(p)
    val payload = (0 until 200000).map(i => s"line$i").mkString("\n")
      .getBytes("US-ASCII") // > 1 MiB: forces many 64 KiB blocks
    val v0 = w.tell
    w.write(payload.take(10))
    val v1 = w.tell
    w.write(payload.drop(10))
    w.close()
    assert(Bgzf.vCoffset(v0) == 0 && Bgzf.vUoffset(v0) == 0)
    assert(Bgzf.vUoffset(v1) == 10)
    val raf = new java.io.RandomAccessFile(p, "r")
    try {
      val all = Bgzf.readAll(p)
      assert(java.util.Arrays.equals(all, payload))
      val mid = Bgzf.readRange(raf, v1, Bgzf.virtualOffset(Bgzf.vCoffset(v1), 20))
      assert(new String(mid, "US-ASCII") == new String(payload.slice(10, 20), "US-ASCII"))
    } finally raf.close()
  }

  test("reg2bin/reg2bins match the published scheme's identities") {
    assert(Tabix.reg2bin(0, 16384) == 4681)
    assert(Tabix.reg2bin(0, 16385) == 585)
    assert(Tabix.reg2bin(16384, 32768) == 4682)
    assert(Tabix.reg2bin(0, 1L << 29) == 0)
    // the containing bin is always among the query's overlap set
    for ((b, e) <- Seq((0L, 100L), (16000L, 17000L), (100000L, 5000000L)))
      assert(Tabix.reg2bins(b, e).contains(Tabix.reg2bin(b, e)))
  }

  test("tabix BED round-trips, region-queries via the index, and prunes " +
    "chunks") {
    val p = tmp("iv.bed.gz")
    val df = spark.range(5000).select(
      concat(lit("chr"), (col("id") % 3).cast("string")).as("chrom"),
      (col("id") * 100).as("start"), (col("id") * 100 + 150).as("end"),
      concat(lit("n"), col("id").cast("string")).as("name"))
    Tabix.write(df, p)
    // full read equals input
    val full = Tabix.read(spark, p)
      .select(col("_c0").as("chrom"), col("_c1").cast("long").as("start"),
        col("_c2").cast("long").as("end"), col("_c3").as("name"))
    assert(full.count() == 5000)
    assertFrame(full.filter(col("start") === 100L),
      rowsOf(df.filter(col("start") === 100L)),
      "chrom", "start", "end", "name")
    // region fetch: overlap semantics on 0-based half-open coords
    val got = Tabix.read(spark, p, Some("chr1"), Some(250000L), Some(250200L))
      .select(col("_c1").cast("long").as("start"))
    val exp = df.filter(col("chrom") === "chr1" &&
      col("start") < 250200L && col("end") > 250000L)
    assert(rowsOf(got) == rowsOf(exp.select("start")))
    // the index actually prunes: a narrow query decompresses fewer chunks
    val idx = Tabix.readIndex(p + ".tbi")
    assert(idx.names == Vector("chr0", "chr1", "chr2"))
    val ref1 = idx.names.indexOf("chr1")
    val narrow = Tabix.queryChunks(idx, ref1, 250000L, 250200L)
    val wide = Tabix.queryChunks(idx, ref1, 0L, Long.MaxValue >> 40)
    assert(narrow.map(c => c.end - c.beg).sum <
      wide.map(c => c.end - c.beg).sum)
    assert(Tabix.read(spark, p, Some("nope")).isEmpty)
  }

  test("typed preset schema applies to tabix reads") {
    val p = tmp("typed.bed.gz")
    val df = Seq(("chr1", 10L, 20L, "a"), ("chr1", 30L, 45L, "b"))
      .toDF("chrom", "start", "end", "name")
    Tabix.write(df, p)
    val back = Tabix.read(spark, p, schema = Some("bed4"))
    assert(back.schema.fieldNames.toSeq == Seq("chrom", "start", "end", "name"))
    assertFrame(back, rowsOf(df), "chrom", "start", "end", "name")
  }

  test("1-based GFF coordinate convention queries correctly") {
    val p = tmp("g.gff.gz")
    // GFF: start 1-based inclusive; [101, 200] covers 0-based [100, 200)
    val df = Seq(("chr1", "src", "gene", 101L, 200L),
      ("chr1", "src", "gene", 501L, 600L))
      .toDF("chrom", "source", "feature", "start", "end")
    Tabix.write(df, p, config = Tabix.Gff,
      headerLines = Seq("##gff-version 3", "#note header lines are skipped"))
    val hit = Tabix.read(spark, p, Some("chr1"), Some(150L), Some(160L))
    assert(hit.count() == 1)
    assert(hit.head().getString(3) == "101")
    // 0-based query [200, 210) must NOT hit the [100, 200) feature
    assert(Tabix.read(spark, p, Some("chr1"), Some(200L), Some(210L)).isEmpty)
  }

  test("VCF convention (1-based, no end column) treats each record as " +
    "one base for overlap") {
    val p = tmp("v.vcf.gz")
    // VCF POS 1-based: POS 100 is 0-based [99, 100)
    val df = Seq(("chr1", 100L, "rs1", "A", "T"),
      ("chr1", 300L, "rs2", "G", "C"))
      .toDF("chrom", "pos", "id", "ref", "alt")
    Tabix.write(df, p, config = Tabix.Vcf)
    val hit = Tabix.read(spark, p, Some("chr1"), Some(99L), Some(100L))
    assert(hit.count() == 1 && hit.head().getString(2) == "rs1")
    assert(Tabix.read(spark, p, Some("chr1"), Some(100L), Some(299L)).isEmpty)
  }

  test(".tbi codec round-trips the index structure") {
    val p = tmp("x.bed.gz")
    val df = Seq(("chrA", 5L, 9L, "z")).toDF("chrom", "start", "end", "name")
    Tabix.write(df, p)
    val idx = Tabix.readIndex(p + ".tbi")
    Tabix.writeIndex(p + ".tbi2", idx)
    assert(Tabix.readIndex(p + ".tbi2") == idx)
    assert(idx.config == Tabix.Bed && idx.names == Vector("chrA"))
  }

  test("DSv2 tabix format: region predicates push into the index, " +
    "partitions prune, columns prune, rows match the function reader") {
    import graft.sources.{TabixScan, TabixScanBuilder}
    import org.apache.spark.sql.sources.{EqualTo, GreaterThan, LessThan}
    val p = tmp("dsv2.bed.gz")
    val df = spark.range(5000).select(
      concat(lit("chr"), (col("id") % 3).cast("string")).as("chrom"),
      (col("id") * 100).as("start"), (col("id") * 100 + 150).as("end"),
      concat(lit("n"), col("id").cast("string")).as("name"))
    Tabix.write(df, p)
    val t = spark.read.format("tabix").option("preset", "bed4").load(p)
    // full scan equals the input relation
    assert(t.count() == 5000)
    // region query through Catalyst predicates == overlap semantics
    val q = t.filter(col("chrom") === "chr1" &&
      col("start") < 250200L && col("end") > 250000L)
    val exp = df.filter(col("chrom") === "chr1" &&
      col("start") < 250200L && col("end") > 250000L)
    assertFrame(q, rowsOf(exp), "chrom", "start", "end", "name")
    // the pushed predicates are visible in the scan description and the
    // plan carries no separate Filter over them (exact enforcement)
    val planStr = q.queryExecution.executedPlan.toString
    assert(planStr.contains("tabix " + p), planStr)
    // column pruning narrows ReadSchema to the projection
    val names = q.select("name")
    assert(names.queryExecution.executedPlan.toString.contains("name"))
    assert(names.count() == exp.count())
    // driver-side proof of partition pruning: the region scan plans
    // strictly fewer decompressed bytes than the full scan
    val sb = new TabixScanBuilder(p, None, graft.io.Schemas("bed4"))
    sb.pushFilters(Array(EqualTo("chrom", "chr1"),
      LessThan("start", 250200L), GreaterThan("end", 250000L)))
    assert(sb.pushedFilters().length == 3)
    val narrow = sb.build().asInstanceOf[TabixScan].planInputPartitions()
    val full = new TabixScanBuilder(p, None, graft.io.Schemas("bed4"))
      .build().asInstanceOf[TabixScan].planInputPartitions()
    def bytes(ps: Array[org.apache.spark.sql.connector.read.InputPartition]) =
      ps.map { ip =>
        val tp = ip.asInstanceOf[graft.sources.TabixPartition]
        (tp.vEnd >>> 16) - (tp.vBeg >>> 16)
      }.sum
    assert(narrow.length >= 1 && bytes(narrow) < bytes(full),
      s"narrow=${bytes(narrow)} full=${bytes(full)}")
    // an unknown chromosome plans zero partitions (driver-side no-op)
    assert(t.filter(col("chrom") === "nope").count() == 0)
  }

  test("DSv2 region load option seeds the scan via the UCSC grammar " +
    "and composes with Catalyst predicates") {
    val p = tmp("dsv2opt.bed.gz")
    val df = spark.range(2000).select(
      concat(lit("chr"), (col("id") % 2).cast("string")).as("chrom"),
      (col("id") * 100).as("start"), (col("id") * 100 + 150).as("end"),
      concat(lit("n"), col("id").cast("string")).as("name"))
    Tabix.write(df, p)
    val viaOpt = spark.read.format("tabix").option("preset", "bed4")
      .option("region", "chr1:50,000-80000").load(p)
    val viaFilter = spark.read.format("tabix").option("preset", "bed4")
      .load(p).filter(col("chrom") === "chr1" &&
        col("start") < 80000L && col("end") > 50000L)
    assertFrame(viaOpt, rowsOf(viaFilter), "chrom", "start", "end", "name")
    assert(viaOpt.count() > 0)
    // intersection with a further Catalyst bound narrows the result
    val both = viaOpt.filter(col("start") < 60000L)
    assert(both.count() < viaOpt.count() && both.count() > 0)
  }

  test("DSv2 tabix format: 1-based GFF begin bound shifts into the " +
    "0-based query space") {
    import org.apache.spark.sql.functions.{col, lit}
    val p = tmp("dsv2.gff.gz")
    val df = Seq(("chr1", "src", "gene", 101L, 200L),
      ("chr1", "src", "gene", 501L, 600L))
      .toDF("chrom", "source", "feature", "start", "end")
    Tabix.write(df, p, config = Tabix.Gff)
    val t = spark.read.format("tabix")
      .option("ddl", "chrom string, source string, feature string, " +
        "start long, end long").load(p)
    // overlap with 0-based [150, 250): only the first gene
    val got = t.filter(col("chrom") === "chr1" &&
      col("start") < lit(251L) && col("end") > lit(150L))
    assertFrame(got.select("start", "end"), Seq(Seq(101L, 200L)),
      "start", "end")
  }
}
