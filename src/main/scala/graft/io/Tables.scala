package graft.io

import graft.core.NatOrder
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sources/sinks for genomic tabular text (reference `io/fileops.py`,
  * `io/bed.py`, `sandbox/gtf_io.py`). All readers produce plain DataFrames
  * (gzip handled natively by Spark's text source); binary genomics formats
  * (bigWig/bigBed/BAM/tabix/FASTA) are declared out of scope for v1, as in
  * SURVEY §2.5 — parity lives at the bedGraph/BED text level.
  */
object Tables {

  /** Headerless TSV with a named schema preset (reference
    * `io/fileops.py:42-83`). `.`-placeholders in numeric columns parse to
    * null (reference parse leniency, FIXTURES §4). A file narrower than
    * the schema fills the missing tail columns with null — the reference's
    * `schema_is_strict=False` default; with `schemaIsStrict = true` an
    * all-null schema column raises instead (`tests/test_fileops.py:13-36`;
    * the check is one extra codegen'd aggregate pass over the file). */
  def readTable(spark: SparkSession, path: String, schema: String = "bed3",
                comment: String = "#",
                schemaIsStrict: Boolean = false): DataFrame = {
    val df = spark.read
      .option("sep", "\t")
      .option("comment", comment)
      .option("nullValue", ".")
      .schema(Schemas(schema))
      .csv(path)
    if (schemaIsStrict) {
      val counts = df.select(df.columns.map(c =>
        count(col(c)).as(c)).toIndexedSeq: _*).head
      val empty = df.columns.filter(c => counts.getAs[Long](c) == 0L)
      require(empty.isEmpty,
        s"schema_is_strict: columns ${empty.mkString(", ")} of preset " +
          s"'$schema' are entirely null in $path")
    }
    df
  }

  /** UCSC chrom.sizes (2-col TSV) -> naturally-ordered DataFrame + map
    * (reference `io/fileops.py:86-160`). `filterChroms` regexes keep only
    * matching names (default mirrors the reference's canonical-chrom
    * filter). */
  def readChromsizes(spark: SparkSession, path: String,
                     filterChroms: Seq[String] =
                       Seq("^chr[0-9]+$", "^chr[XY]$", "^chrM$"),
                     natsort: Boolean = true): DataFrame = {
    var df = spark.read
      .option("sep", "\t")
      .schema("chrom STRING, length LONG")
      .csv(path)
      .filter(col("chrom").isNotNull && trim(col("chrom")) =!= "")
    // a file without the 2-column (name, length) shape is an error, not a
    // null-length frame (reference raises, tests/test_fileops.py:40-43;
    // whitespace-only lines, as in its fixture, are tolerated above)
    require(df.filter(col("length").isNull).isEmpty,
      s"$path is not a chrom.sizes file: rows without a numeric length")
    if (filterChroms.nonEmpty) {
      val keep = filterChroms.map(p => col("chrom").rlike(p)).reduce(_ || _)
      df = df.filter(keep)
    }
    if (natsort) df.orderBy(NatOrder.sortKeys(col("chrom")): _*) else df
  }

  def chromsizesAsMap(df: DataFrame): Map[String, Long] =
    df.select("chrom", "length").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  // ------------------------------------------------------------------ BED

  /** Per-column BED validators (subset of reference `io/bed.py:127-475`):
    * each returns a violation predicate. */
  /** Comma list "1,2,3[,]" parsed to array<long> (BED's stringly-encoded
    * lists, io/bed.py:360-382) — a pure codegen'd expression. */
  private def commaList(c: Column): Column =
    // per-element digit guard: a malformed element must yield null, not an
    // ANSI cast error — the format-violation disjunct reports it; CaseWhen
    // branches evaluate lazily per row, so the cast never sees bad input
    transform(split(regexp_replace(c, ",$", ""), ","),
      x => when(x.rlike("^\\d+$"), x.cast("long")))

  /** Per-column violation predicates mirroring the reference validator
    * set (io/bed.py:127-475), incl. the bed12 block-structure rules:
    * count agreement, in-range, first-at-start, last-at-end, sorted,
    * non-overlapping. All higher-order Column expressions — one codegen'd
    * pass, no UDFs. */
  def bedViolations(schema: String): Seq[(String, Column)] = {
    val fields = Schemas(schema).fieldNames.toSet
    val starts = commaList(col("blockStarts"))
    val sizes = commaList(col("blockSizes"))
    val len = col("end") - col("start")
    val n = size(starts)
    val checks = Seq(
      "chrom" -> (col("chrom").isNull || !col("chrom").rlike("^[!-~]{1,255}$")),
      "start" -> (col("start").isNull || col("start") < 0),
      "end" -> (col("end").isNull || col("end") < col("start")),
      "name" -> (col("name").isNotNull &&
        (length(col("name")) < 1 || length(col("name")) > 255)),
      "score" -> (col("score").isNotNull && col("score").cast("long").isNotNull &&
        (col("score").cast("long") < 0 || col("score").cast("long") > 1000)),
      "strand" -> (col("strand").isNotNull &&
        !col("strand").isin("+", "-", ".", "?")),
      "thickStart" -> (col("thickStart").isNotNull &&
        (col("thickStart") < col("start") || col("thickStart") > col("end"))),
      "thickEnd" -> (col("thickEnd").isNotNull &&
        (col("thickEnd") < col("start") || col("thickEnd") > col("end"))),
      "itemRgb" -> (col("itemRgb").isNotNull &&
        (!col("itemRgb").rlike("^(\\d{1,3},\\d{1,3},\\d{1,3}|\\d{1,3})$") ||
          // the shape regex admits 3-digit components up to 999; each
          // must be a byte (reference io/bed.py itemRgb rule,
          // tests/test_bed.py:110-118)
          exists(transform(split(col("itemRgb"), ","),
            x => x.cast("int")), x => x > 255))),
      "blockCount" -> (col("blockCount").isNotNull && col("blockCount") <= 0),
      "blockSizes" -> (col("blockSizes").isNotNull &&
        (!col("blockSizes").rlike("^(\\d+,)*\\d+,?$") ||
          (col("blockCount").isNotNull && size(sizes) =!= col("blockCount")))),
      "blockStarts" -> (col("blockStarts").isNotNull &&
        (!col("blockStarts").rlike("^(\\d+,)*\\d+,?$") ||
          (col("blockCount").isNotNull && n =!= col("blockCount")) ||
          exists(starts, x => x < 0 || x > len) ||
          element_at(starts, 1) =!= lit(0L) ||
          // sizes-dependent rules: blockStarts without a present,
          // well-formed, same-length blockSizes is itself a violation —
          // and the explicit guard keeps the disjuncts below from
          // evaluating to SQL NULL (which would silently pass the check)
          // when sizes is null or malformed.
          col("blockSizes").isNull ||
          !col("blockSizes").rlike("^(\\d+,)*\\d+,?$") ||
          size(sizes) =!= n ||
          element_at(starts, -1) + element_at(sizes, -1) =!= len ||
          // sorted + non-overlapping: start[i] + size[i] <= start[i+1]
          exists(
            zip_with(
              zip_with(starts, sizes, (s, z) => s + z),
              concat(slice(starts, 2, 2147483646),
                array(lit(null).cast(LongType))),
              (blockEnd, nxt) => nxt.isNotNull && blockEnd > nxt),
            x => x))))
    checks.filter { case (name, _) => fields.contains(name) }
  }

  /** Validate a BED-flavored frame; returns offending (column, count)
    * pairs. One aggregate pass — no per-validator scans. */
  def validateBed(df: DataFrame, schema: String): Seq[(String, Long)] = {
    val checks = bedViolations(schema)
    if (checks.isEmpty) return Nil
    // "__v<i>" aliases: an agg alias equal to an input column name would
    // be picked up as a lateral column alias by later agg expressions
    val aggs = checks.zipWithIndex.map { case ((_, c), i) =>
      sum(when(c, 1L).otherwise(0L)).as(s"__v$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    checks.map(_._1).zipWithIndex
      .map { case (n, i) => n -> row.getLong(i) }
      .filter(_._2 > 0)
  }

  /** BED writer (reference `io/bed.py:602-738`): validates, orders columns
    * per the schema, fills nulls with `.`, writes headerless TSV. Sorted
    * by (chrom, start) to satisfy the BED sortedness convention
    * (`io/bed.py:546-578`). `singleFile` coalesces for small parity
    * outputs; leave false for scale. */
  def toBed(df: DataFrame, path: String, schema: String = "bed6",
            validate: Boolean = true, singleFile: Boolean = false): Unit = {
    if (validate) {
      val bad = validateBed(df, schema)
      require(bad.isEmpty, s"BED validation failed: $bad")
    }
    val ordered = Schemas(schema).fieldNames.toSeq
    var out = df
      .select(ordered.map(c => col(c).cast("string")): _*)
      .na.fill(".")
      .orderBy(col(ordered.head), col(ordered(1)).cast("long"))
    if (singleFile) out = out.coalesce(1)
    out.write
      .option("sep", "\t")
      .option("emptyValue", ".")
      .mode("overwrite")
      .csv(path)
  }

  // ------------------------------------------------------------- bedGraph

  /** bedGraph reader — the executable half of the declared bigWig
    * delegation contract (README: binary bigWig/bigBed are out of scope;
    * parity lives at the bedGraph text level). Mirrors the query shape of
    * reference `read_bigwig` (`io/fileops.py:379-431`): an optional
    * (chrom, start, end) region returns the intervals overlapping it,
    * unclipped, defaulting start to 0 and end to unbounded. Track/browser
    * header lines parse to a null `start` (they are not tab-delimited
    * numeric records) and are dropped by the same filter that drops
    * malformed rows; `#` comments are dropped by the csv reader. The
    * region predicate is a plain Column filter, so at scale it pushes
    * into the scan. */
  def readBedGraph(spark: SparkSession, path: String,
                   chrom: Option[String] = None,
                   start: Option[Long] = None,
                   end: Option[Long] = None): DataFrame = {
    var df = readTable(spark, path, schema = "bedGraph")
      .filter(col("start").isNotNull && col("end").isNotNull)
    chrom.foreach(c => df = df.filter(col("chrom") === c))
    // half-open overlap with [start, end): same intervals a bigWig
    // range fetch returns
    start.foreach(s => df = df.filter(col("end") > s))
    end.foreach(e => df = df.filter(col("start") < e))
    df
  }

  /** bedGraph writer — the sink half of the bigWig delegation contract
    * (reference `to_bigwig`, `io/fileops.py:515-591`, validates 4 columns
    * chrom/start/end/value and sorts by (chrom, start) before encoding;
    * this emits the same relation as headerless TSV). `singleFile`
    * coalesces for small parity outputs; leave false for scale. */
  def toBedGraph(df: DataFrame, path: String,
                 cols: graft.core.ColSpec = graft.core.ColSpec.default,
                 valueCol: String = "value",
                 singleFile: Boolean = false): Unit = {
    var out = df
      .select(cols.chromCol.cast("string").as("chrom"),
        cols.startCol.cast("long").as("start"),
        cols.endCol.cast("long").as("end"),
        col(valueCol).cast("double").as("value"))
      .orderBy(col("chrom"), col("start"))
    if (singleFile) out = out.coalesce(1)
    out.write.option("sep", "\t").mode("overwrite").csv(path)
  }

  // ------------------------------------------------------------- bigWig

  /** Reference-parity entry points for the BBI binary formats
    * (`read_bigwig`/`to_bigwig`/`read_bigbed`/`to_bigbed`,
    * `io/fileops.py:379-486`, `515-669`) over the pure-JVM [[BigWig]] /
    * [[BigBed]] container implementation. */
  def readBigWig(spark: SparkSession, path: String,
                 chrom: Option[String] = None, start: Option[Long] = None,
                 end: Option[Long] = None): DataFrame =
    BigWig.read(spark, path, chrom, start, end)

  def toBigWig(df: DataFrame, path: String,
               chromSizes: Map[String, Long] = Map.empty): Unit =
    BigWig.write(df, path, chromSizes)

  def readBigBed(spark: SparkSession, path: String,
                 chrom: Option[String] = None, start: Option[Long] = None,
                 end: Option[Long] = None): DataFrame =
    BigBed.read(spark, path, chrom, start, end)

  def toBigBed(df: DataFrame, path: String,
               chromSizes: Map[String, Long] = Map.empty): Unit =
    BigBed.write(df, path, chromSizes)

  /** Reference-parity tabix entry point (`read_tabix`,
    * `io/fileops.py:163-217`) over the pure-JVM [[Tabix]] reader. */
  def readTabix(spark: SparkSession, path: String,
                chrom: Option[String] = None, start: Option[Long] = None,
                end: Option[Long] = None,
                schema: Option[String] = None): DataFrame =
    Tabix.read(spark, path, chrom, start, end, schema)

  def toTabix(df: DataFrame, path: String,
              config: Tabix.Config = Tabix.Bed): Unit =
    Tabix.write(df, path, config)

  /** Reference-parity 2D pairs reader (`read_pairix`,
    * `io/fileops.py:183-235`) over the engine's [[Pairix]] layer. */
  def readPairix(spark: SparkSession, path: String,
                 chrom1: String, start1: Long, end1: Long,
                 chrom2: Option[String] = None, start2: Option[Long] = None,
                 end2: Option[Long] = None): DataFrame =
    Pairix.read(spark, path, chrom1, start1, end1, chrom2, start2, end2)

  def toPairix(df: DataFrame, path: String): Unit = Pairix.write(df, path)

  /** Reference-parity alignment reader (`read_alignments`,
    * `io/fileops.py:237-283`) over the pure-JVM [[Bam]] codec. SAM text
    * input still goes through `readTable(schema = "sam")`; CRAM is
    * unsupported (htslib codec). */
  def readAlignments(spark: SparkSession, path: String,
                     chrom: Option[String] = None, start: Option[Long] = None,
                     end: Option[Long] = None): DataFrame = {
    require(path.endsWith(".bam"),
      s"$path: only .bam is supported (SAM via readTable, CRAM unsupported)")
    Bam.read(spark, path, chrom, start, end)
  }

  def toBam(df: DataFrame, path: String,
            chromSizes: Map[String, Long] = Map.empty): Unit =
    Bam.write(df, path, chromSizes)

  // ------------------------------------------------------------------ GTF

  /** Expand a GTF `attributes` column (`key "value"; ...`) into a map
    * column (reference `sandbox/gtf_io.py:4-16`), no UDF: normalize the
    * `key "value";` syntax to `key=value;` then `str_to_map`. */
  def gtfAttributes(attr: Column): Column =
    str_to_map(
      regexp_replace(
        regexp_replace(attr, "\\s*([A-Za-z0-9_]+)\\s+\"([^\"]*)\";?", "$1=$2;"),
        ";$", ""),
      lit(";"), lit("="))

  /** Star-expand selected GTF attribute keys into columns. */
  def parseGtfAttributes(df: DataFrame, attrCol: String = "attributes",
                         keys: Seq[String]): DataFrame = {
    val m = gtfAttributes(col(attrCol))
    keys.foldLeft(df)((d, k) => d.withColumn(k, element_at(m, k)))
  }

  // ------------------------------------------------------------- layout

  /** Write an interval relation as chromosome-partitioned parquet
    * (hive-style `chrom=.../` directories), sorted by start within each
    * partition. The layout every downstream op benefits from at cluster
    * scale:
    *  - a region [[graft.ops.Ops.select]] prunes to ONE partition
    *    directory at planning time (`PartitionFilters` in the scan —
    *    asserted by PlanContractSpec);
    *  - the within-partition sort gives min/max row-group statistics on
    *    `start`, so coordinate predicates skip row groups too;
    *  - per-chrom files co-locate the join key's first component for
    *    every downstream binned join.
    * `partitionsPerChrom` caps file count per chromosome (repartition by
    * range on start inside each chrom keeps the sort useful). */
  def writeChromPartitioned(df: DataFrame, path: String,
                            cols: graft.core.ColSpec = graft.core.ColSpec.default,
                            partitionsPerChrom: Int = 1): Unit = {
    val prepared =
      if (partitionsPerChrom <= 1)
        df.repartition(cols.chromCol).sortWithinPartitions(cols.startCol)
      else
        df.repartitionByRange(
            partitionsPerChrom * df.select(cols.chromCol).distinct.count().toInt,
            cols.chromCol, cols.startCol)
          .sortWithinPartitions(cols.chromCol, cols.startCol)
    prepared.write.mode("overwrite").partitionBy(cols.chrom).parquet(path)
  }
}
