package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Constructors / coercion into interval relations (reference
  * `core/construction.py:20-343`): the `from_any` family accepts
  * chromsizes maps, (chrom,start,end[,name]) tuples and UCSC strings;
  * `makeViewframe` validates + auto-names; `sanitizeBedframe` repairs
  * common defects.
  */
object Construction {

  /** Sum type over every region-input shape the reference's `from_any`
    * coerces (`construction.py:119-171`): an existing bedframe, a
    * chromsizes map, (chrom,start,end[,name]) tuples, UCSC strings
    * (one or many). Implicit conversions make call sites read like the
    * reference's duck typing — `Construction.fromAny(spark, "chr1:0-100")`
    * — while staying a closed, exhaustively-matched ADT. */
  sealed trait RegionsLike
  object RegionsLike {
    final case class Frame(df: DataFrame) extends RegionsLike
    final case class Chromsizes(sizes: Map[String, Long]) extends RegionsLike
    final case class Tuples(regions: Seq[(String, Long, Long)])
      extends RegionsLike
    final case class NamedTuples(regions: Seq[(String, Long, Long, String)])
      extends RegionsLike
    final case class Ucsc(str: String) extends RegionsLike
    final case class UcscStrings(strs: Seq[String]) extends RegionsLike

    import scala.language.implicitConversions
    implicit def ofFrame(df: DataFrame): RegionsLike = Frame(df)
    implicit def ofChromsizes(m: Map[String, Long]): RegionsLike =
      Chromsizes(m)
    implicit def ofTuples(s: Seq[(String, Long, Long)]): RegionsLike =
      Tuples(s)
    implicit def ofNamedTuples(
        s: Seq[(String, Long, Long, String)]): RegionsLike = NamedTuples(s)
    implicit def ofUcsc(s: String): RegionsLike = Ucsc(s)
    implicit def ofUcscStrings(s: Seq[String]): RegionsLike = UcscStrings(s)
  }

  /** Route any [[RegionsLike]] to its builder (reference `from_any`,
    * `construction.py:119-171`). `chromsizes` resolves open-ended UCSC
    * strings, as in the reference; an existing frame passes through
    * untouched (the reference copies — immutable DataFrames need not). */
  def fromAny(spark: SparkSession, regions: RegionsLike,
              chromsizes: Map[String, Long] = Map.empty,
              nameCol: String = "name",
              cols: ColSpec = ColSpec.default): DataFrame = regions match {
    case RegionsLike.Frame(df) => df
    case RegionsLike.Chromsizes(m) => fromChromsizes(spark, m, cols)
    case RegionsLike.Tuples(t) => fromTuples(spark, t, cols)
    case RegionsLike.NamedTuples(t) => fromNamedTuples(spark, t, nameCol, cols)
    case RegionsLike.Ucsc(s) => fromUcscStrings(spark, Seq(s), chromsizes, cols)
    case RegionsLike.UcscStrings(s) => fromUcscStrings(spark, s, chromsizes, cols)
  }

  /** `{chrom -> length}` means `[0, length)` per chrom (reference
    * `construction.py:20-61`). */
  def fromChromsizes(spark: SparkSession, sizes: Map[String, Long],
                     cols: ColSpec = ColSpec.default): DataFrame = {
    import spark.implicits._
    sizes.toSeq.sortBy(_._1).map { case (c, len) => (c, 0L, len) }
      .toDF(cols.chrom, cols.start, cols.end)
  }

  def fromTuples(spark: SparkSession, regions: Seq[(String, Long, Long)],
                 cols: ColSpec = ColSpec.default): DataFrame = {
    import spark.implicits._
    regions.toDF(cols.chrom, cols.start, cols.end)
  }

  def fromNamedTuples(spark: SparkSession,
                      regions: Seq[(String, Long, Long, String)],
                      nameCol: String = "name",
                      cols: ColSpec = ColSpec.default): DataFrame = {
    import spark.implicits._
    regions.toDF(cols.chrom, cols.start, cols.end, nameCol)
  }

  /** List of UCSC strings -> bedframe (reference
    * `construction.py:83-171`); missing ends require chromsizes. */
  def fromUcscStrings(spark: SparkSession, strs: Seq[String],
                      chromsizes: Map[String, Long] = Map.empty,
                      cols: ColSpec = ColSpec.default): DataFrame = {
    val rows = strs.map { s =>
      val r = Region.parseString(s).resolve(chromsizes, checkBounds = chromsizes.nonEmpty)
      (r.chrom, r.start.getOrElse(0L),
        r.end.getOrElse(throw new IllegalArgumentException(
          s"end unknown for '$s' and no chromsizes given")))
    }
    fromTuples(spark, rows, cols)
  }

  /** Append a UCSC-style `chrom:start-end` name column (reference
    * `construction.py:174-187`). Pure column expression — pushes through
    * whole-stage codegen. */
  def addUcscNameColumn(df: DataFrame, nameCol: String = "name",
                        cols: ColSpec = ColSpec.default): DataFrame =
    df.withColumn(nameCol, concat(cols.chromCol, lit(":"),
      cols.startCol.cast("string"), lit("-"), cols.endCol.cast("string")))

  /** Coerce + validate a view (reference `construction.py:189-262`):
    * auto-generates `name` when absent — `nameStyle="ucsc"` as
    * `chrom:start-end`, `nameStyle=None` as the bare chromosome name
    * (reference `name_style` arg, tests/test_core_construction.py:171-212)
    * — and checks the viewframe invariant. A caller-provided name column
    * is accepted unchanged in either style. */
  def makeViewframe(df: DataFrame, nameCol: String = "name",
                    cols: ColSpec = ColSpec.default,
                    check: Boolean = true,
                    nameStyle: Option[String] = Some("ucsc")): DataFrame = {
    val autoName = nameStyle.map(_.toLowerCase) match {
      case Some("ucsc") =>
        concat(cols.chromCol, lit(":"), cols.startCol, lit("-"), cols.endCol)
      case None => cols.chromCol
      case Some(other) =>
        throw new IllegalArgumentException(s"nameStyle must be ucsc/None: $other")
    }
    val named =
      if (df.columns.contains(nameCol)) df
      else df.withColumn(nameCol, autoName)
    if (check)
      require(Checks.isViewframe(named, nameCol, cols),
        "not a valid viewframe (need unique non-null names, no overlaps)")
    named
  }

  /** Repair pass (reference `construction.py:265-343`): complete partial
    * null triples to full nulls, optionally flip or drop start>end rows. */
  def sanitizeBedframe(df: DataFrame,
                       dropNull: Boolean = false,
                       startExceedEnd: String = "flip", // flip | drop | keep
                       cols: ColSpec = ColSpec.default): DataFrame = {
    val anyNull =
      cols.chromCol.isNull || cols.startCol.isNull || cols.endCol.isNull
    var out = df
      .withColumn(cols.chrom, when(anyNull, lit(null)).otherwise(cols.chromCol))
      .withColumn("__s", when(anyNull, lit(null)).otherwise(cols.startCol))
      .withColumn("__e", when(anyNull, lit(null)).otherwise(cols.endCol))
    val flipped = col("__s") > col("__e")
    out = startExceedEnd match {
      case "flip" => out
        .withColumn(cols.start, when(flipped, col("__e")).otherwise(col("__s")))
        .withColumn(cols.end, when(flipped, col("__s")).otherwise(col("__e")))
      case "drop" => out.filter(!coalesce(flipped, lit(false)))
        .withColumn(cols.start, col("__s")).withColumn(cols.end, col("__e"))
      case _ => out
        .withColumn(cols.start, col("__s")).withColumn(cols.end, col("__e"))
    }
    out = out.drop("__s", "__e")
    if (dropNull) out.filter(cols.chromCol.isNotNull) else out
  }
}
