package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Natural ordering of chromosome-like names ("chr2" < "chr10" < "chrX").
  *
  * Reference: `core/arrops.py:10-23` (`natsort_key`/`natsorted`), used by
  * `read_chromsizes` ordering (`io/fileops.py:139-148`).
  *
  * Implemented as pure `Column` expressions (codegen-friendly, no UDF):
  * sort by (non-digit prefix, first digit run as number with numeric names
  * first, raw name as tiebreak). Covers the `<alpha prefix><number>` shape
  * that chromosome names take; arbitrary multi-run natural sort is not
  * needed by any reference operator.
  */
object NatOrder {

  def prefix(c: Column): Column = lower(regexp_extract(c, "^(\\D*)", 1))

  def number(c: Column): Column =
    when(regexp_extract(c, "(\\d+)", 1) === "", lit(null).cast("long"))
      .otherwise(regexp_extract(c, "(\\d+)", 1).cast("long"))

  /** Columns to pass to `orderBy` for natural ordering of `c`. */
  def sortKeys(c: Column): Seq[Column] =
    Seq(prefix(c), number(c).asc_nulls_last, c)

  /** A single struct usable in window `orderBy` / comparisons. Non-numeric
    * suffixes (chrX, chrY, chrM) sort after numbered chroms via a flag. */
  def key(c: Column): Column =
    struct(
      prefix(c).as("p"),
      when(number(c).isNull, lit(1)).otherwise(lit(0)).as("nonnum"),
      coalesce(number(c), lit(0L)).as("n"),
      c.as("raw"))
}
