package graft

import graft.core.ColSpec
import graft.ops.{Closest, Extras, IntervalJoin, Ops}
import org.apache.spark.sql.{Column, DataFrame}

/** Fluent syntax over the functional operator API:
  *
  * {{{
  * import graft.syntax._
  * reads.bf.overlap(peaks, how = "inner")
  * reads.bf.merge(minDist = Some(0))
  * peaks.bf.closestTo(genes, k = 2)
  * }}}
  *
  * Pure sugar — every method delegates to `graft.ops.*`, which mirror the
  * reference's module-level functions one-to-one.
  */
object syntax {

  implicit class BedframeOps(private val df: DataFrame) extends AnyVal {
    def bf: Bedframe = new Bedframe(df, ColSpec.default)
    def bf(cols: ColSpec): Bedframe = new Bedframe(df, cols)
  }

  final class Bedframe(val df: DataFrame, val cols: ColSpec) {
    def select(region: String): DataFrame = Ops.select(df, region, cols)

    def expand(pad: Option[Long] = None, scale: Option[Double] = None,
               side: String = "both"): DataFrame =
      Ops.expand(df, pad, scale, side, cols)

    def overlap(other: DataFrame, how: String = "left",
                suffixes: (String, String) = ("", "_"),
                returnOverlap: Boolean = false,
                on: Seq[String] = Nil,
                cols2: ColSpec = ColSpec.default): DataFrame =
      Ops.overlap(df, other, how, suffixes, returnIndex = false,
        returnOverlap, keepOrder = false, on = on, cols1 = cols,
        cols2 = cols2)

    def countOverlaps(other: DataFrame, countCol: String = "count",
                      on: Seq[String] = Nil): DataFrame =
      Ops.countOverlaps(df, other, countCol, on, cols1 = cols)

    def setdiff(other: DataFrame, on: Seq[String] = Nil): DataFrame =
      Ops.setdiff(df, other, on, cols)

    def cluster(minDist: Option[Long] = Some(0),
                on: Seq[String] = Nil): DataFrame =
      Ops.cluster(df, minDist, on, cols = cols)

    def merge(minDist: Option[Long] = Some(0),
              on: Seq[String] = Nil): DataFrame =
      Ops.merge(df, minDist, on, cols)

    def coverage(other: DataFrame, coverageCol: String = "coverage"): DataFrame =
      Ops.coverage(df, other, coverageCol, cols)

    def subtract(other: DataFrame): DataFrame = Ops.subtract(df, other, cols1 = cols)

    def complement(view: DataFrame): DataFrame = Ops.complement(df, view, cols = cols)

    def closestTo(other: DataFrame, k: Int = 1,
                  ignoreOverlaps: Boolean = false,
                  ignoreUpstream: Boolean = false,
                  ignoreDownstream: Boolean = false,
                  directionCol: Option[String] = None,
                  tieBreakingCol: Option[String] = None): DataFrame =
      Closest.closest(df, Some(other), k, ignoreOverlaps, ignoreUpstream,
        ignoreDownstream, directionCol, tieBreakingCol, cols1 = cols)

    def trim(view: DataFrame): DataFrame = Ops.trim(df, view, cols = cols)
    def trim(): DataFrame = Ops.trim(df, cols)

    def assignView(view: DataFrame, dropUnassigned: Boolean = false): DataFrame =
      Ops.assignView(df, view, dropUnassigned, cols = cols)

    def sort(view: Option[DataFrame] = None): DataFrame =
      Ops.sortBedframe(df, view, cols = cols)

    def pairByDistance(minSep: Long, maxSep: Long): DataFrame =
      Extras.pairByDistance(df, minSep, maxSep, cols = cols)

    def markRuns(valueCol: String): DataFrame = Extras.markRuns(df, valueCol, cols = cols)

    def mergeRuns(valueCol: String,
                  agg: Map[String, Column] = Map.empty): DataFrame =
      Extras.mergeRuns(df, valueCol, agg, cols)
  }
}
