package graft.ops

import graft.core.ColSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical strategies for the interval (range-overlap) join — the one
  * operator Spark genuinely lacks. The reference implements it as a
  * single-node sort + double-`searchsorted` sweep (`core/arrops.py:290-375`);
  * a naive Spark translation (`join` on `s1 < e2 && s2 < e1`) degenerates to
  * a broadcast-nested-loop / cartesian plan. Instead:
  *
  *  - '''Binned equi-join''' (the scale path): explode each side onto fixed
  *    genome bins of width `binSize`, equi-join on `(chrom, on..., bin)`,
  *    re-check the true interval predicate, and keep each pair only in the
  *    bin containing `max(start1, start2)` — a closed-form dedup that avoids
  *    a `distinct()` shuffle. Both sides shuffle-partition by `(chrom, bin)`,
  *    which simultaneously parallelizes within chromosomes and defuses
  *    per-chromosome skew (chr1 >> chrM; see SURVEY §4). AQE handles any
  *    residual skew.
  *  - '''Broadcast''': when one side is small (views, chromsizes, dimension
  *    tables), hash-join on `(chrom, on...)` with the range predicate in the
  *    join condition — no shuffle of the big side at all.
  *
  * Point intervals (`start == end`) are promoted to length-1 pseudo-segments
  * inside the predicate (reference `core/arrops.py:271-287`).
  */
object IntervalJoin {

  sealed trait Strategy
  /** Pick broadcast if the right side's estimated plan size is under the
    * session's autoBroadcastJoinThreshold, else binned. */
  case object Auto extends Strategy
  case object Binned extends Strategy
  /** Hierarchical binning for mixed-length relations: an interval of span
    * s explodes into s/binSize rows under [[Binned]], so megabase
    * features (whole genes, SVs, chromosome arms) against a small
    * binSize blow up the candidate relation. Here each interval registers
    * at its OWN level — the smallest bin width that covers it in <= 2
    * bins — plus <= 2 bins at every coarser level, so every interval
    * contributes O(log(maxSpan/binSize)) rows regardless of length.
    * Overlapping pairs are guaranteed to share a bin at the longer
    * interval's level and are emitted exactly once there (level ==
    * max(level1, level2), bin == the overlap start's bin). Costs a ~2x
    * constant over [[Binned]] for uniformly short intervals — pick it
    * when lengths are heavy-tailed. */
  case object BinnedMultiLevel extends Strategy
  case object BroadcastRight extends Strategy

  val DefaultBinSize: Long = 1000000L

  /** Levels above the base bin width (widths binSize..binSize<<MaxLevel);
    * 16 doublings cover any chromosome from any practical binSize. */
  val MaxLevel = 16

  /** Integer floor-division that is exact for negative coordinates. */
  private def fdiv(c: Column, w: Long): Column =
    ((c - pmod(c, lit(w))) / lit(w)).cast("long")

  private def fdivC(c: Column, w: Column): Column =
    ((c - pmod(c, w)) / w).cast("long")

  /** Smallest level whose bin width covers the interval in <= 2 bins:
    * ceil(log2(span/binSize)) clamped to [0, MaxLevel]. */
  private def levelOf(start: Column, pend: Column, binSize: Long): Column =
    least(greatest(
      ceil(log2(greatest(pend - start, lit(1L)).cast("double") / binSize))
        .cast("int"),
      lit(0)), lit(MaxLevel))

  /** (level, bin) registration rows: own level plus every coarser one. */
  private def levelBins(start: Column, pend: Column,
                        binSize: Long): Column = {
    val own = levelOf(start, pend, binSize)
    flatten(transform(sequence(own, lit(MaxLevel)), lvl => {
      val w = call_function("shiftleft", lit(binSize), lvl).cast("long")
      transform(sequence(fdivC(start, w), fdivC(pend - 1, w)),
        b => struct(lvl.cast("long").as("l"), b.as("b")))
    }))
  }

  /** The overlap predicate with point promotion, on already-suffixed specs. */
  def overlapPredicate(c1: ColSpec, c2: ColSpec): Column =
    c1.startCol < c2.promotedEnd && c2.startCol < c1.promotedEnd

  /** Inner interval join of two relations whose column names are already
    * disjoint. Returns all columns of both sides for each overlapping pair.
    *
    * @param on extra equi-key column name pairs (left name, right name),
    *           mirroring the reference's `on=` (`ops.py:456-462`).
    */
  def pairs(left: DataFrame, right: DataFrame,
            c1: ColSpec, c2: ColSpec,
            on: Seq[(String, String)] = Nil,
            strategy: Strategy = Auto,
            binSize: Long = DefaultBinSize): DataFrame = {
    val resolved = strategy match {
      case Auto =>
        // Broadcast is only right for true dimension tables (views,
        // chromsizes): the hash join keys on `chrom` alone, so every left
        // row scans ALL same-chrom right rows — cost O(|L| * |R| / nChrom),
        // catastrophic for a non-tiny right side (observed 650s vs 15s at
        // 600k x 150k). Keep a hard few-thousand-row cap regardless of the
        // session broadcast threshold; everything else takes the binned
        // shuffle join, whose cost tracks the true pair count.
        val cap = 65536L
        val sizeEstimate =
          right.queryExecution.optimizedPlan.stats.sizeInBytes
        if (sizeEstimate <= cap) BroadcastRight else Binned
      case s => s
    }
    resolved match {
      case BroadcastRight | Auto =>
        val cond = (c1.chromCol === c2.chromCol) &&
          on.map { case (a, b) => col(a) === col(b) }
            .foldLeft(overlapPredicate(c1, c2))(_ && _)
        left.join(broadcast(right), cond, "inner")
      case BinnedMultiLevel =>
        val lb = left
          .withColumn("__own1", levelOf(c1.startCol, c1.promotedEnd, binSize))
          .withColumn("__lb",
            explode(levelBins(c1.startCol, c1.promotedEnd, binSize)))
        val rb = right
          .withColumn("__own2", levelOf(c2.startCol, c2.promotedEnd, binSize))
          .withColumn("__lb2",
            explode(levelBins(c2.startCol, c2.promotedEnd, binSize)))
          .hint("SHUFFLE_HASH")
        val cond = (c1.chromCol === c2.chromCol) &&
          on.map { case (a, b) => col(a) === col(b) }
            .foldLeft(col("__lb.l") === col("__lb2.l") &&
              col("__lb.b") === col("__lb2.b"))(_ && _)
        val meetLevel = greatest(col("__own1"), col("__own2")).cast("long")
        val meetWidth =
          call_function("shiftleft", lit(binSize), meetLevel.cast("int"))
            .cast("long")
        lb.join(rb, cond, "inner")
          .filter(overlapPredicate(c1, c2))
          // every pair shares >= 1 bin at the longer side's level; emit it
          // only there, in the bin holding the overlap start — exactly-once
          // without a distinct() shuffle
          .filter(col("__lb.l") === meetLevel &&
            col("__lb.b") ===
              fdivC(greatest(c1.startCol, c2.startCol), meetWidth))
          .drop("__lb", "__lb2", "__own1", "__own2")
      case Binned =>
        val lb = left.withColumn(
          "__bin",
          explode(sequence(fdiv(c1.startCol, binSize),
                           fdiv(c1.promotedEnd - 1, binSize))))
        // Build a hash map of the (smaller) right side per partition
        // instead of sort-merge: with heavily duplicated (chrom, bin) keys
        // SMJ degenerates into a buffered nested loop (measured 20x slower
        // at 112M output pairs). SHJ streams the probe side; the build
        // side is one bin-partition of the smaller relation.
        val rb = right.withColumn(
          "__bin2",
          explode(sequence(fdiv(c2.startCol, binSize),
                           fdiv(c2.promotedEnd - 1, binSize))))
          .hint("SHUFFLE_HASH")
        val cond = (c1.chromCol === c2.chromCol) &&
          on.map { case (a, b) => col(a) === col(b) }
            .foldLeft(col("__bin") === col("__bin2"))(_ && _)
        lb.join(rb, cond, "inner")
          .filter(overlapPredicate(c1, c2))
          // emit each pair only from the bin holding the overlap's start —
          // dedup without a distinct() shuffle
          .filter(col("__bin") === fdiv(greatest(c1.startCol, c2.startCol), binSize))
          .drop("__bin", "__bin2")
    }
  }
}
