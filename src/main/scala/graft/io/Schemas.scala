package graft.io

import org.apache.spark.sql.types._

/** Named TSV schema presets for genomic tabular files, mirroring the
  * reference registry (`io/schemas.py:11-198`). Coordinate columns are
  * LongType, scores/stats typed where the format pins them, everything
  * stringly-typed where BED keeps list-ish string payloads (`blockSizes`
  * etc., `io/bed.py:360-382`).
  */
object Schemas {

  private def f(name: String, dt: DataType): StructField =
    StructField(name, dt, nullable = true)

  private val S = StringType
  private val L = LongType
  private val D = DoubleType

  private val bed12: Seq[StructField] = Seq(
    f("chrom", S), f("start", L), f("end", L), f("name", S), f("score", S),
    f("strand", S), f("thickStart", L), f("thickEnd", L), f("itemRgb", S),
    f("blockCount", L), f("blockSizes", S), f("blockStarts", S))

  val all: Map[String, StructType] = Map(
    "bed3" -> StructType(bed12.take(3)),
    "bed4" -> StructType(bed12.take(4)),
    "bed5" -> StructType(bed12.take(5)),
    "bed" -> StructType(bed12.take(6)),
    "bed6" -> StructType(bed12.take(6)),
    "bed9" -> StructType(bed12.take(9)),
    "bed12" -> StructType(bed12),
    "bedGraph" -> StructType(Seq(
      f("chrom", S), f("start", L), f("end", L), f("value", D))),
    "bedpe" -> StructType(Seq(
      f("chrom1", S), f("start1", L), f("end1", L),
      f("chrom2", S), f("start2", L), f("end2", L),
      f("name", S), f("score", S), f("strand1", S), f("strand2", S))),
    "gff" -> StructType(Seq(
      f("chrom", S), f("source", S), f("feature", S), f("start", L),
      f("end", L), f("score", S), f("strand", S), f("frame", S),
      f("attributes", S))),
    "gtf" -> StructType(Seq(
      f("chrom", S), f("source", S), f("feature", S), f("start", L),
      f("end", L), f("score", S), f("strand", S), f("frame", S),
      f("attributes", S))),
    "narrowPeak" -> StructType(Seq(
      f("chrom", S), f("start", L), f("end", L), f("name", S), f("score", L),
      f("strand", S), f("fc", D), f("-log10p", D), f("-log10q", D),
      f("relSummit", L))),
    "broadPeak" -> StructType(Seq(
      f("chrom", S), f("start", L), f("end", L), f("name", S), f("score", L),
      f("strand", S), f("fc", D), f("-log10p", D), f("-log10q", D))),
    "gappedPeak" -> StructType(bed12 ++ Seq(
      f("fc", D), f("-log10p", D), f("-log10q", D))),
    "jaspar" -> StructType(Seq(
      f("chrom", S), f("start", L), f("end", L), f("name", S), f("score", L),
      f("pval", L), f("strand", S))),
    "gap" -> StructType(Seq(
      f("bin", L), f("chrom", S), f("start", L), f("end", L), f("ix", L),
      f("n", S), f("length", L), f("type", S), f("bridge", S))),
    "centromeres" -> StructType(Seq(
      f("bin", L), f("chrom", S), f("start", L), f("end", L), f("name", S))),
    "cytoband" -> StructType(Seq(
      f("chrom", S), f("start", L), f("end", L), f("name", S),
      f("gieStain", S))),
    "pgsnp" -> StructType(Seq(
      f("chrom", S), f("start", L), f("end", L), f("name", S),
      f("alleleCount", L), f("alleleFreq", S), f("alleleScores", S))),
    "bedRnaElements" -> StructType(Seq(
      f("chrom", S), f("start", L), f("end", L), f("name", S), f("score", L),
      f("strand", S), f("level", D), f("signif", D), f("score2", L))),
    "vcf" -> StructType(Seq(
      f("CHROM", S), f("POS", L), f("ID", S), f("REF", S), f("ALT", S),
      f("QUAL", S), f("FILTER", S), f("INFO", S))),
    "sam" -> StructType(Seq(
      f("QNAME", S), f("FLAG", L), f("RNAME", S), f("POS", L), f("MAPQ", L),
      f("CIGAR", S), f("RNEXT", S), f("PNEXT", L), f("TLEN", L), f("SEQ", S),
      f("QUAL", S), f("TAGs", S))))

  def apply(name: String): StructType =
    all.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown schema '$name'; known: ${all.keys.toSeq.sorted.mkString(", ")}"))
}
