package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic row identity for multi-branch plans.
  *
  * Operators like left/outer interval joins, setdiff, coverage or closest
  * need to correlate "the same input row" across two branches of one plan
  * (the pair-finding branch and the anti/aggregate branch).
  * `monotonically_increasing_id()` is NOT safe for that: its values depend
  * on the physical partition layout at the point of evaluation, and
  * Catalyst legitimately optimizes the two branches differently (e.g.
  * column pruning may collapse a window in one branch only), silently
  * misaligning the ids.
  *
  * Instead we derive the id from row '''content''': a 128-bit two-seed
  * xxhash64 struct. Pure, codegen'd, no shuffle, and identical in every
  * branch by construction. Full-duplicate rows share an id; for identity-
  * keyed aggregation/anti-join this yields correct results for each copy
  * (they are indistinguishable), which matches the engine's multiset
  * semantics. 128 bits keeps the accidental-collision probability
  * negligible at 100 TB scale (~2^64 birthday bound).
  */
object RowId {

  def hashColumn(df: DataFrame): Column = {
    val cs = df.columns.toSeq.map(col)
    struct(
      xxhash64(lit(1) +: cs: _*).as("h1"),
      xxhash64(lit(2) +: cs: _*).as("h2"))
  }

  /** Content hash alone — no duplicate disambiguation, no shuffle. Safe
    * when the operator's use of identity is duplicate-invariant: anti-join
    * membership (all copies match or none), or best-candidate selection
    * joined back per id (every copy receives the same winner). NOT safe
    * for per-row aggregation (counts/sums would merge copies) or per-row
    * top-k. */
  def withContentId(df: DataFrame, name: String): DataFrame =
    df.withColumn(name, hashColumn(df))

  /** Unique deterministic id: (content hash, duplicate rank). The rank
    * window disambiguates full-duplicate rows; since those rows are
    * indistinguishable, any rank assignment yields the same id set in
    * every branch. Costs one hash-partition shuffle of `df`. */
  def withRowId(df: DataFrame, name: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__rowid_h")).orderBy(lit(1))
    df.withColumn("__rowid_h", hashColumn(df))
      .withColumn(name,
        struct(col("__rowid_h").as("h"), row_number().over(w).as("dup")))
      .drop("__rowid_h")
  }
}
