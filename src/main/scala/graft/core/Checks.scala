package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relation-level invariant predicates over interval relations.
  *
  * Mirrors the reference's `core/checks.py` family. Split in two tiers:
  *  - schema checks: free, driver-side, on `df.schema`;
  *  - data checks: distributed aggregates (each forces a scan — opt-in,
  *    mirroring the reference's `raise_errors=` flags; reference runs
  *    `is_bedframe` eagerly at every operator entry, `ops.py:448-449`,
  *    which we deliberately do NOT do on the hot path).
  */
object Checks {

  private def isIntegral(dt: DataType): Boolean = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
    case _ => false
  }

  /** `is_chrom_dtype` (reference `core/specs.py:142-152`): is `dt` an
    * allowed chrom dtype? The reference admits string / object /
    * categorical pandas dtypes; the Spark analogues are `StringType`
    * (including collated variants, Spark's closest categorical-ish
    * string form) and `CharType`/`VarcharType`. Largely moot under this
    * engine's typed schemas — `hasBedSchema` already pins chrom to
    * string — but exported for API completeness. */
  def isChromDtype(dt: DataType): Boolean = dt match {
    case _: StringType | _: CharType | _: VarcharType => true
    case _ => false
  }

  /** [[isChromDtype]] over a named column of `df` (false when absent). */
  def isChromDtype(df: DataFrame, colName: String): Boolean =
    df.schema.fields.find(_.name == colName).exists(f => isChromDtype(f.dataType))

  /** Schema part of `is_bedframe` (reference `core/checks.py:20-87`):
    * coordinate columns present, chrom stringy, start/end integral. */
  def hasBedSchema(df: DataFrame, cols: ColSpec = ColSpec.default): Boolean = {
    val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
    cols.names.forall(fields.contains) &&
    isChromDtype(fields(cols.chrom)) &&
    isIntegral(fields(cols.start)) && isIntegral(fields(cols.end))
  }

  /** Per-row violation predicate for the data part of `is_bedframe`:
    * null discipline (triple all-null or none-null, `checks.py:70-77`) and
    * `start <= end` (`checks.py:79-86`). */
  def bedViolation(cols: ColSpec = ColSpec.default): Column = {
    val anyNull =
      cols.chromCol.isNull || cols.startCol.isNull || cols.endCol.isNull
    val allNull =
      cols.chromCol.isNull && cols.startCol.isNull && cols.endCol.isNull
    (anyNull && !allNull) ||
    (!anyNull && cols.startCol > cols.endCol)
  }

  def isBedframe(df: DataFrame, cols: ColSpec = ColSpec.default): Boolean =
    hasBedSchema(df, cols) && df.filter(bedViolation(cols)).isEmpty

  /** Any internal overlap? (reference `checks.py:148-180`): exists a row
    * whose start < running max of previous ends within chrom — computed as
    * a bucket-parallel two-level prefix scan, not a whole-chromosome
    * window (see [[graft.ops.Scan]]). */
  def isOverlapping(df: DataFrame, cols: ColSpec = ColSpec.default,
                    bucketSize: Long = 1L << 20): Boolean = {
    import graft.ops.Scan
    val bucketed = df.select(cols.chromCol, cols.startCol, cols.endCol)
      .withColumn("__b", Scan.bucketOf(cols.startCol, bucketSize))
    !Scan.prefixMax(bucketed, Seq(cols.chrom), "__b",
        Seq(cols.startCol.asc, cols.endCol.asc), cols.endCol,
        inclusive = false, "__prev_end")
      .filter(col("__prev_end").isNotNull && cols.startCol < col("__prev_end"))
      .isEmpty
  }

  /** ViewFrame invariant (reference `checks.py:183-252`): bedframe + unique
    * non-null `name` + non-overlapping regions. */
  def isViewframe(df: DataFrame, nameCol: String = "name",
                  cols: ColSpec = ColSpec.default): Boolean = {
    df.columns.contains(nameCol) &&
    hasBedSchema(df, cols) &&
    df.filter(bedViolation(cols) || cols.chromCol.isNull || col(nameCol).isNull)
      .isEmpty &&
    df.groupBy(col(nameCol)).count().filter(col("count") > 1).isEmpty &&
    !isOverlapping(df, cols)
  }

  /** df's view labels all appear in the view (reference `checks.py:90-145`). */
  def isCataloged(df: DataFrame, view: DataFrame,
                  dfViewCol: String = "view_region",
                  viewNameCol: String = "name"): Boolean =
    df.select(col(dfViewCol).as("__l"))
      .distinct()
      .join(view.select(col(viewNameCol).as("__l")), Seq("__l"), "left_anti")
      .isEmpty

  /** Every interval contained in its assigned view region
    * (reference `checks.py:255-342`). */
  def isContained(df: DataFrame, view: DataFrame,
                  dfViewCol: String = "view_region",
                  viewNameCol: String = "name",
                  cols: ColSpec = ColSpec.default,
                  colsView: ColSpec = ColSpec.default): Boolean = {
    val v = view.select(
      col(viewNameCol).as("__vname"),
      col(colsView.start).as("__vs"),
      col(colsView.end).as("__ve"))
    df.join(broadcast(v), col(dfViewCol) === col("__vname"), "left")
      .filter(
        col("__vname").isNull ||
          cols.startCol < col("__vs") || cols.endCol > col("__ve"))
      .isEmpty
  }

  /** complement(df, view) empty — df covers every view region
    * (reference `checks.py:345-391`). */
  def isCovering(df: DataFrame, view: DataFrame,
                 viewNameCol: String = "name",
                 cols: ColSpec = ColSpec.default,
                 colsView: ColSpec = ColSpec.default): Boolean =
    graft.ops.Ops.complement(df, view, viewNameCol, cols, colsView).isEmpty

  /** Non-overlapping AND covering AND contained (reference
    * `checks.py:394-471`); requires the df be assignable per region. */
  def isTiling(df: DataFrame, view: DataFrame,
               dfViewCol: String = "view_region",
               viewNameCol: String = "name",
               cols: ColSpec = ColSpec.default,
               colsView: ColSpec = ColSpec.default): Boolean =
    !isOverlapping(df, cols) &&
      isCovering(df, view, viewNameCol, cols, colsView) &&
      (!df.columns.contains(dfViewCol) ||
        isContained(df, view, dfViewCol, viewNameCol, cols, colsView))

  /** Monotone-sorted by (chrom, start, end) in input (file) order, without
    * a global single-partition window (reference `checks.py:474-540` sorts
    * and compares): adjacent pairs are lag-checked inside each input
    * partition in parallel, and partition boundaries are checked on the
    * tiny per-partition (first, last) summary. */
  /** View-order variant (reference `checks.py:474-540` with `view_df`):
    * the input read order must already BE `sort_bedframe(df, view)`'s
    * order — view row rank first (unassigned rows last), then coords.
    * The input ordinal is tagged FIRST and rides as data, so the check
    * survives `assign_view`'s shuffles; sortedness along the ordinal is
    * a two-level prefix-max (no global window). */
  def isSorted(df: DataFrame, view: DataFrame, viewNameCol: String,
               dfViewCol: Option[String],
               cols: ColSpec,
               colsView: ColSpec): Boolean = {
    import graft.ops.{Ops, Scan}
    val tagged = Ops.withInputOrdinal(df, "__sord")
    val withRegion = dfViewCol match {
      case Some(c) => tagged.withColumn("__region", col(c))
      case None => Ops.assignView(tagged, view, dropUnassigned = false,
        dfViewCol = "__region", viewNameCol = viewNameCol, cols = cols,
        colsView = colsView)
    }
    val vOrd = Ops.withInputOrdinal(
      view.select(col(viewNameCol).as("__vname")), "__vord")
    val keyed = withRegion
      .join(broadcast(vOrd), col("__region") === col("__vname"), "left")
      .select(col("__sord"),
        struct(coalesce(col("__vord"), lit(Long.MaxValue)).as("o"),
          cols.startCol.as("s"), cols.endCol.as("e")).as("__k"))
      .withColumn("__b", Scan.bucketOf(col("__sord"), 1L << 16))
    Scan.prefixMax(keyed, Nil, "__b", Seq(col("__sord")), col("__k"),
        inclusive = false, "__pm")
      .filter(col("__pm").isNotNull && col("__pm") > col("__k"))
      .isEmpty
  }

  def isSorted(df: DataFrame, view: DataFrame,
               viewNameCol: String): Boolean =
    isSorted(df, view, viewNameCol, None, ColSpec.default, ColSpec.default)

  def isSorted(df: DataFrame, cols: ColSpec = ColSpec.default): Boolean = {
    import org.apache.spark.sql.expressions.Window
    val key = struct(cols.chromCol, cols.startCol, cols.endCol)
    val base = df.select(key.as("__k"))
      .withColumn("__rid", monotonically_increasing_id())
      .withColumn("__pid", spark_partition_id())
    val wp = Window.partitionBy(col("__pid")).orderBy(col("__rid"))
    val intraOk = base
      .withColumn("__prev", lag(col("__k"), 1).over(wp))
      .filter(col("__prev").isNotNull && col("__prev") > col("__k"))
      .isEmpty
    def interOk = {
      val bounds = base.groupBy(col("__pid")).agg(
        min_by(col("__k"), col("__rid")).as("__first"),
        max_by(col("__k"), col("__rid")).as("__last"))
      val wb = Window.orderBy(col("__pid")) // one row per partition: tiny
      bounds
        .withColumn("__pl", lag(col("__last"), 1).over(wb))
        .filter(col("__pl").isNotNull && col("__pl") > col("__first"))
        .isEmpty
    }
    intraOk && interOk
  }
}
