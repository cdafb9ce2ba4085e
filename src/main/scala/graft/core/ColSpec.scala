package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Names of the coordinate triple of an interval relation ("bedframe").
  *
  * Mirrors the reference's configurable column triple
  * (`core/specs.py:11,14-25` — default `("chrom","start","end")`,
  * overridable per call via `cols=`). Instead of the reference's mutable
  * module-level registry (`core/specs.py:28-58`) we use an immutable spec
  * passed (with a default) to every operator.
  *
  * Interval semantics: 0-based, half-open `[start, end)`; `start == end`
  * is a zero-length point; negative coordinates are legal
  * (reference `docs/guide-definitions.rst:6-17`).
  */
final case class ColSpec(chrom: String = "chrom",
                         start: String = "start",
                         end: String = "end") {
  def names: Seq[String] = Seq(chrom, start, end)
  def chromCol: Column = col(chrom)
  def startCol: Column = col(start)
  def endCol: Column = col(end)

  /** Point intervals are promoted to length-1 pseudo-segments for overlap
    * detection (reference `core/arrops.py:271-287`): a point `[x,x)` is
    * treated as `[x,x+1)` so that it overlaps any interval containing `x`
    * and a point exactly at a query start is still selected
    * (`ops.py:62-65`).
    */
  def promotedEnd: Column =
    when(endCol === startCol, startCol + lit(1L)).otherwise(endCol)

  def withSuffix(s: String): ColSpec =
    ColSpec(chrom + s, start + s, end + s)
}

object ColSpec {
  val default: ColSpec = ColSpec()

  /** Suffix every column of `df` (used to disambiguate the two sides of an
    * interval join, like the reference's `suffixes=` on `overlap`,
    * `ops.py:500-508`). */
  def suffixAll(df: DataFrame, suffix: String): DataFrame =
    if (suffix.isEmpty) df
    else df.toDF(df.columns.map(_ + suffix).toIndexedSeq: _*)
}
