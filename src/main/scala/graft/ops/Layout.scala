package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Space-filling-curve data layout: Morton/Z-order interleaving
  * (Morton 1966; the same multi-dimensional clustering recipe behind
  * Delta Lake's `OPTIMIZE ZORDER BY` and Databricks' liquid
  * clustering) so that parquet row-group min/max statistics prune
  * files for predicates on ANY of the layout columns, not just the
  * leading sort key.
  *
  * Why it matters at 100 TB: a lexicographic `(a, b)` sort gives
  * perfect skipping on `a` and none on `b`; interleaving the bits of
  * both keys gives each file a small axis-aligned box in (a, b) space,
  * so a point/range predicate on either column admits O(sqrt(files))
  * instead of O(files). For genomic tables the natural curve is
  * `(chrom_code, start)`; for an LLM corpus, `(domain_hash, length)`
  * or any two routing keys.
  *
  * Everything here is a codegen'd integer `Column` expression — the
  * z-value computation adds zero shuffles; the layout itself is the
  * one range exchange any global sort already pays. */
object Layout {

  /** Interleave the low `bits` bits of each (non-negative, bounded)
    * column: bit i of column j lands at position `i * n + j` of the
    * result, column 0 in the LOWEST lane (ties broken by later
    * columns). Requires `bits * n <= 63` so the result is a
    * non-negative BIGINT. Inputs must already satisfy
    * `0 <= x < 2^bits` — [[zValueClamped]] wraps this with saturation
    * for open-domain columns.
    *
    * Two-column interleaves use the constant-time mask-spread ladder
    * (5 shift-AND steps per operand); the general n-column path is a
    * per-bit shift/OR fold — either way one flat codegen'd expression,
    * no UDF. */
  def zValue(cols: Seq[Column], bits: Int = 21): Column = {
    val n = cols.size
    require(n >= 2, "z-order needs at least 2 columns")
    require(bits >= 1 && bits * n <= 63,
      s"bits*n must fit a signed 64-bit lane: bits=$bits n=$n")
    val longs = cols.map(_.cast("long"))
    if (n == 2 && bits <= 32)
      spread2(longs(0)).bitwiseOR(shiftleft(spread2(longs(1)), 1))
    else {
      // general n-way: OR together bit i of column j shifted to i*n+j
      val terms = for {
        i <- 0 until bits
        (c, j) <- longs.zipWithIndex
      } yield shiftleft(
        shiftrightunsigned(c, i).bitwiseAND(lit(1L)), i * n + j)
      terms.reduce(_ bitwiseOR _)
    }
  }

  /** Morton spread of a 32-bit lane into even bit positions of a
    * 64-bit word: the classic 5-step magic-mask ladder. */
  private def spread2(x: Column): Column = {
    val masks = Seq(
      (16, 0x0000FFFF0000FFFFL), (8, 0x00FF00FF00FF00FFL),
      (4, 0x0F0F0F0F0F0F0F0FL), (2, 0x3333333333333333L),
      (1, 0x5555555555555555L))
    masks.foldLeft(x.bitwiseAND(lit(0xFFFFFFFFL))) { case (v, (s, m)) =>
      v.bitwiseOR(shiftleft(v, s)).bitwiseAND(lit(m))
    }
  }

  /** [[zValue]] over open-domain columns: negative values clamp to 0,
    * values >= 2^bits saturate to the top code. Saturation (not
    * wrap-around) keeps the curve monotone at the domain edge — a
    * modulo would teleport the largest keys back to the origin and
    * destroy the file-extent bound that makes skipping work. */
  def zValueClamped(cols: Seq[Column], bits: Int = 21): Column = {
    val top = (1L << bits) - 1
    zValue(cols.map(c => least(greatest(c.cast("long"), lit(0L)),
      lit(top))), bits)
  }

  /** Deterministic grid layout: assign each row to file
    * `z >> (n*bits - fileBits)` — the top `fileBits` bits of its
    * z-value, i.e. a fixed 2^fileBits-cell Morton grid. Unlike a
    * sampled range partitioner this is reproducible run-to-run (the
    * driver gate hashes it), and each cell is an exact axis-aligned
    * box, so per-file min/max extents are provably bounded. Skew
    * across cells follows the data distribution; for balanced file
    * SIZES use [[zOrderWrite]]'s range partitioner instead. */
  def zPrefixFiles(df: DataFrame, colNames: Seq[String], bits: Int = 21,
                   fileBits: Int = 6): DataFrame = {
    require(fileBits >= 1 && fileBits <= colNames.size * bits)
    val z = zValueClamped(colNames.map(col), bits)
    df.withColumn("z", z)
      .withColumn("file_id",
        shiftrightunsigned(col("z"), colNames.size * bits - fileBits))
  }

  /** Per-file layout statistics `(file_id, n_rows, min/max per column)`
    * — exactly the parquet footer min/max a reader's file-skipping
    * consults. One map-side-combinable aggregation. */
  def zLayoutStats(df: DataFrame, colNames: Seq[String], bits: Int = 21,
                   fileBits: Int = 6): DataFrame = {
    val withF = zPrefixFiles(df, colNames, bits, fileBits)
    val aggs = count(lit(1)).as("n_rows") +:
      colNames.flatMap(c => Seq(
        min(col(c).cast("long")).as(s"min_$c"),
        max(col(c).cast("long")).as(s"max_$c")))
    withF.groupBy(col("file_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** [[zLayoutStats]] over min-max-scaled lanes: each column is first
    * rescaled onto the full lane domain by its in-relation max
    * (`lane = v * (2^bits - 1) div max(v)` — exact integer floor
    * division), so the prefix grid adapts to the data's actual extent
    * instead of leaving high lane bits dead when the domain is much
    * smaller than `2^bits` (Delta's OPTIMIZE ZORDER normalizes lanes
    * the same way, via per-column range ids). Costs one 1-row
    * aggregate broadcast — no sort, no second shuffle. Statistics
    * (min/max extents) stay in ORIGINAL column units. */
  def zLayoutStatsScaled(df: DataFrame, colNames: Seq[String],
                         bits: Int = 21, fileBits: Int = 6): DataFrame = {
    require(fileBits >= 1 && fileBits <= colNames.size * bits)
    val n = colNames.size
    val top = (1L << bits) - 1
    val mxAggs = colNames.zipWithIndex.map { case (c, i) =>
      greatest(max(greatest(col(c).cast("long"), lit(0L))), lit(1L))
        .as(s"__mx_$i")
    }
    val mx = df.agg(mxAggs.head, mxAggs.tail: _*)
    val proj = df.crossJoin(broadcast(mx)).select(
      colNames.zipWithIndex.map { case (c, i) =>
        greatest(col(c).cast("long"), lit(0L)).as(s"__v_$i")
      } ++ colNames.indices.map(i => col(s"__mx_$i")): _*)
    val lanes = colNames.indices
      .map(i => expr(s"(__v_$i * ${top}L) div __mx_$i"))
    val withF = proj
      .withColumn("z", zValue(lanes, bits))
      .withColumn("file_id",
        shiftrightunsigned(col("z"), n * bits - fileBits))
    val aggs = count(lit(1)).as("n_rows") +:
      colNames.zipWithIndex.flatMap { case (c, i) => Seq(
        min(col(s"__v_$i")).as(s"min_$c"),
        max(col(s"__v_$i")).as(s"max_$c"))
      }
    withF.groupBy(col("file_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Production write path: global z-order via `repartitionByRange`
    * (one sampled range exchange — balanced file sizes, boundaries not
    * reproducible run-to-run) + an in-partition sort so row groups
    * within a file stay clustered too. */
  def zOrderWrite(df: DataFrame, path: String, colNames: Seq[String],
                  numFiles: Int, bits: Int = 21): Unit = {
    val z = zValueClamped(colNames.map(col), bits).as("__z")
    df.select(col("*"), z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Fraction of files a min/max skipping reader must admit for the
    * conjunctive box predicate `lo_i <= col_i <= hi_i` (None = no
    * bound on that axis), given [[zLayoutStats]] output. Driver-side
    * arithmetic on the file-count-sized stats relation — used by specs
    * to certify the curve actually skips. */
  def admittedFileFraction(stats: DataFrame, colNames: Seq[String],
                           box: Seq[(Option[Long], Option[Long])]): Double = {
    require(box.size == colNames.size)
    val pred = colNames.zip(box).map { case (c, (lo, hi)) =>
      val loOk = lo.map(v => col(s"max_$c") >= v).getOrElse(lit(true))
      val hiOk = hi.map(v => col(s"min_$c") <= v).getOrElse(lit(true))
      loOk && hiOk
    }.reduce(_ && _)
    val total = stats.count()
    if (total == 0) 0.0
    else stats.filter(pred).count().toDouble / total
  }

  /** Small-file compaction planner — the table-maintenance half of
    * `OPTIMIZE`: given per-file stats `(partition cols..., nameCol,
    * bytesCol)`, assign every file a `compaction_group` such that each
    * group's files concatenate to roughly `targetBytes` (the classic
    * streaming bin-packing: walk files in name order within a
    * partition, cut a new group whenever the running total would pass
    * the target — each group lands in [target, target + maxfile) except
    * the partition's last, so no group needs a split and oversized
    * files sit alone in their own group). Group id is
    * `floor(cumulative_bytes_before_this_file / targetBytes)`:
    * deterministic, order-free to compute (one running-sum window per
    * partition), and exactly the cut rule above because the running
    * total only crosses a multiple of `targetBytes` when a group
    * closes. Output: input columns + `compaction_group` (0-based per
    * partition) + `group_bytes` (that group's total).
    *
    * Why it matters at 100 TB: a streaming ingest writes millions of
    * KB-sized files; planning the rewrite is itself a big-data job.
    * This plans it relationally — one exchange on the partition
    * columns, two windows over each partition's sorted run, output
    * one row per file — so the planner scales with the file COUNT,
    * never the data volume. */
  def planCompaction(stats: DataFrame, partCols: Seq[String],
                     nameCol: String, bytesCol: String,
                     targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes=$targetBytes")
    import org.apache.spark.sql.expressions.Window
    val part = if (partCols.isEmpty) Window.partitionBy()
               else Window.partitionBy(partCols.map(col): _*)
    // (name, bytes, row-content-hash) ordering: with duplicate names in
    // a partition the ROWS frame over the tie would otherwise be
    // ambiguous, making __before (hence group ids) nondeterministic
    // across runs (ADVICE r11). The content hash closes the remaining
    // same-name-same-bytes case — rows identical in EVERY column are
    // interchangeable, so full determinism of the observable output
    // needs no further key.
    val w = part.orderBy(col(nameCol).asc, col(bytesCol).asc,
        xxhash64(stats.columns.map(col): _*).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val g = stats.withColumn("__before",
        coalesce(sum(col(bytesCol)).over(w), lit(0L)))
      .withColumn("compaction_group",
        expr(s"__before div ${targetBytes}L"))
      .drop("__before")
    val wg = if (partCols.isEmpty) Window.partitionBy(col("compaction_group"))
             else Window.partitionBy(
               (partCols.map(col) :+ col("compaction_group")): _*)
    g.withColumn("group_bytes", sum(col(bytesCol)).over(wg))
  }
}
