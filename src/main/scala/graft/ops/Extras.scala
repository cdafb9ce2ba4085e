package graft.ops

import graft.core.ColSpec
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Derived operators (reference `extras.py`). */
object Extras {

  /** Tile each chromosome `[0, length)` into `binsize` bins, last bin
    * clipped (reference `extras.py:125-167`). Input: a chromsizes relation
    * `(chromCol, lengthCol)`. `sequence`+`explode` generates bins
    * distributively — no driver loop. */
  def binnify(chromsizes: DataFrame, binsize: Long,
              chromCol: String = "chrom", lengthCol: String = "length",
              relIds: Boolean = false): DataFrame = {
    require(binsize > 0, "binsize must be > 0")
    val out = chromsizes
      .select(col(chromCol).as("chrom"), col(lengthCol).cast("long").as("__len"))
      .withColumn("start",
        explode(sequence(lit(0L), col("__len") - 1, lit(binsize))))
      .withColumn("end", least(col("start") + lit(binsize), col("__len")))
      .drop("__len")
    if (relIds) out.withColumn("rel_id", (col("start") / lit(binsize)).cast("long"))
    else out
  }

  /** Split chromosomes into p/q arms at centromere midpoints (reference
    * `extras.py:23-122`). `mids`: (chrom, mid). Chroms without a mid entry
    * yield a single unnamed-arm row spanning the whole chromosome. */
  def makeChromarms(chromsizes: DataFrame, mids: DataFrame,
                    chromCol: String = "chrom", lengthCol: String = "length",
                    midCol: String = "mid"): DataFrame = {
    val cs = chromsizes.select(col(chromCol).as("chrom"),
      col(lengthCol).cast("long").as("__len"))
    val m = mids.select(col(chromCol).as("chrom"), col(midCol).cast("long").as("__mid"))
    cs.join(broadcast(m), Seq("chrom"), "left")
      .select(col("chrom"), col("__len"), col("__mid"),
        explode(when(col("__mid").isNotNull,
          array(
            struct(lit(0L).as("start"), col("__mid").as("end"), lit("_p").as("sfx")),
            struct(col("__mid").as("start"), col("__len").as("end"), lit("_q").as("sfx"))))
          .otherwise(array(
            struct(lit(0L).as("start"), col("__len").as("end"), lit("").as("sfx")))))
          .as("__arm"))
      .select(col("chrom"), col("__arm.start").as("start"),
        col("__arm.end").as("end"),
        concat(col("chrom"), col("__arm.sfx")).as("name"))
  }

  /** All unique interval pairs separated by `[minSep, maxSep]` bp (midpoint-
    * or endpoint-anchored) with an intervening-interval-count filter
    * (reference `extras.py:389-543`). Reproduces the reference's probe
    * trick: each interval emits a right-handed and a left-handed probe
    * interval; an inner interval join of right-probes x left-probes yields
    * exactly the in-band pairs (first of each pair is upstream). Intervening
    * counts are per-chrom dense ranks — same-chromosome pairs make the
    * global rank difference equal the per-chrom one, so no global sort is
    * needed. */
  def pairByDistance(df: DataFrame, minSep: Long, maxSep: Long,
                     minIntervening: Option[Long] = None,
                     maxIntervening: Option[Long] = None,
                     relativeTo: String = "midpoints",
                     suffixes: (String, String) = ("_1", "_2"),
                     cols: ColSpec = ColSpec.default,
                     binSize: Long = IntervalJoin.DefaultBinSize,
                     tieBreak: Option[Column] = None): DataFrame = {
    require(minSep >= 0 && minSep < maxSep, "need 0 <= minSep < maxSep")
    require(relativeTo == "midpoints" || relativeTo == "endpoints",
      "relativeTo must be 'midpoints' or 'endpoints'")
    val mid = floor((cols.startCol + cols.endCol) / lit(2)).cast("long")
    // per-chrom dense ordinal as a bucket-parallel running count — not a
    // whole-chromosome row_number window (see Scan). `tieBreak` (e.g. an
    // id column) makes the rank deterministic when (start, end) repeats —
    // pairs at the maxIntervening boundary would otherwise flip run to run.
    val ranked = Scan.prefixSum(
        df.withColumn("__mid", mid)
          .withColumn("__b", Scan.bucketOf(cols.startCol, 1L << 20)),
        Seq(cols.chrom), "__b",
        Seq(cols.startCol.asc, cols.endCol.asc) ++ tieBreak.map(_.asc),
        lit(1L), inclusive = true, "__rank")
      .drop("__b")
    val (refR, refL) =
      if (relativeTo == "endpoints") (cols.endCol, cols.startCol)
      else (col("__mid"), col("__mid"))
    val rightProbe = ranked
      .withColumn("__ps", refR + lit(minSep / 2))
      .withColumn("__pe", refR + lit((maxSep + 1) / 2))
    val leftProbe = ranked
      .withColumn("__ps", refL - lit(maxSep / 2))
      .withColumn("__pe", refL - lit((minSep + 1) / 2))
    val (s1, s2) = suffixes
    val a = ColSpec.suffixAll(rightProbe, s1)
    val b = ColSpec.suffixAll(leftProbe, s2)
    val pc1 = ColSpec(cols.chrom + s1, "__ps" + s1, "__pe" + s1)
    val pc2 = ColSpec(cols.chrom + s2, "__ps" + s2, "__pe" + s2)
    var p = IntervalJoin.pairs(a, b, pc1, pc2, Nil, IntervalJoin.Binned, binSize)
      .withColumn("__intervening",
        abs(col("__rank" + s1) - col("__rank" + s2)) - 1)
    minIntervening.foreach(v => p = p.filter(col("__intervening") >= v))
    maxIntervening.foreach(v => p = p.filter(col("__intervening") <= v))
    val dropCols = Seq(s1, s2).flatMap(s =>
      Seq("__ps" + s, "__pe" + s, "__mid" + s, "__rank" + s)) :+ "__intervening"
    p.drop(dropCols: _*)
  }

  /** Per-interval covered-bp plus overlap count against an annotation
    * relation (reference `frac_gene_coverage`, `extras.py:357-387` — the
    * UCSC mRNA fetch becomes a caller-supplied relation in zero-egress
    * Spark; any interval annotation table works). Output: df columns +
    * `coverage` + `count`.
    *
    * Both aggregates run over one distinct-probe relation: counts via
    * the pair-free rank identity in [[Ops.countOverlaps]] — linear in
    * rows, independent of pair density (the earlier count pair join
    * enumerated 112M pairs at sf0.1 and dominated the query at 6.5s; a
    * round-4 experiment fusing both aggregates onto one
    * cluster-id-carrying pair join was 27% slower still) — and covered
    * bp via `Ops.coveredBp`'s adaptive pair-join/rank-scan dispatch.
    * The slim stats join each other first so the wide probe relation is
    * joined back exactly once. */
  def fracGeneCoverage(df: DataFrame, annotations: DataFrame,
                       cols: ColSpec = ColSpec.default,
                       colsAnn: ColSpec = ColSpec.default,
                       binSize: Long = IntervalJoin.DefaultBinSize): DataFrame = {
    val l = RowId.withContentId(df, "__gid")
    val lDist = l.select(cols.names.map(col) :+ col("__gid"): _*)
      .dropDuplicates("__gid")
    // covered bp via Ops.coverage's adaptive dispatcher (pair join vs
    // merged runs for narrow probes, rank scan for heavy-tailed ones)
    val covered = Ops.coveredBp(lDist, "__gid", annotations,
        "coverage", cols, colsAnn, binSize)
      .withColumnRenamed("__gid", "__cid")
    // counts come from the pair-free rank scan (see Ops.countOverlaps):
    // this was the dominant cost as a pair join — the pair relation's
    // cardinality grows with the square of interval density (112M pairs
    // at sf0.1) while the scan stays linear in rows
    val counts = Ops.overlapCountsByRank(lDist, "__gid",
        annotations.select(colsAnn.names.map(col): _*), "count", Nil,
        cols, colsAnn, binSize)
      .withColumnRenamed("__gid", "__nid")
    // inner-join the slim stats first and pay the wide-relation join-back
    // ONCE (hash, not sort-merge — sorting the wide side twice was a
    // measurable tail cost). Sound under either covered path: covered's
    // keys are a superset of the count>0 probes (rank scan emits all
    // concrete probes; the pair path emits exactly the count>0 ones,
    // since a probe overlaps a merged run iff it overlaps a raw
    // annotation) — the rows the inner join drops are exactly those the
    // final coalesce reconstructs as zeros
    val stats = covered.join(counts, col("__cid") === col("__nid"))
      .select(col("__cid").as("__sid"), col("coverage"), col("count"))
    l.join(stats.hint("shuffle_hash"), col("__gid") === col("__sid"), "left")
      .withColumn("coverage", coalesce(col("coverage"), lit(0L)))
      .withColumn("count", coalesce(col("count"), lit(0L)))
      .drop("__gid", "__sid")
  }

  /** Genome-wide pileup: the stepwise coverage-depth function of `df`
    * (reference kernel `coverage_intervals_rle`, `arrops.py:757-770`).
    * Event-list formulation: +w at starts / -w at ends, aggregated per
    * breakpoint, running-sum per chromosome, segments between consecutive
    * breakpoints. Zero-length points contribute nothing (their +w/-w
    * cancel at the same breakpoint). The running sum is a two-level
    * prefix scan over (chrom, pos-bucket) — no whole-chromosome window
    * (see [[graft.ops.Scan]]); the next-breakpoint lookup is a
    * within-bucket `lead` stitched across buckets with the (tiny)
    * per-bucket first-breakpoint relation. Output:
    * (chrom, start, end, depth) covering [min endpoint, max endpoint). */
  def pileup(df: DataFrame, valueCol: Option[String] = None,
             cols: ColSpec = ColSpec.default,
             bucketSize: Long = 1L << 20): DataFrame = {
    val w = valueCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
    val events = df.select(cols.chromCol.as("chrom"),
      explode(array(
        struct(cols.startCol.as("pos"), w.as("d")),
        struct(cols.endCol.as("pos"), (-w).as("d")))).as("__e"))
      .select(col("chrom"), col("__e.pos").as("pos"), col("__e.d").as("d"))
    val agg = events.groupBy(col("chrom"), col("pos"))
      .agg(sum(col("d")).as("__delta"))
      .withColumn("__b", Scan.bucketOf(col("pos"), bucketSize))
    val withDepth = Scan.prefixSum(agg, Seq("chrom"), "__b",
      Seq(col("pos").asc), col("__delta"), inclusive = true, "depth")
    Scan.withNext(withDepth, Seq("chrom"), "__b", "pos", "__next")
      .filter(col("__next").isNotNull)
      .select(col("chrom"), col("pos").as(cols.start),
        col("__next").as(cols.end), col("depth"))
  }

  /** Mark runs of spatially consecutive (abutting, non-overlapping)
    * intervals sharing the same value of `valueCol` (reference
    * `extras.py:546-650`). Run ids reset per chromosome. Same sweep shape
    * as [[Ops.cluster]] with an extra value-change border; the cummax and
    * border-count scans are two-level (see [[graft.ops.Scan]]) and the
    * previous-row value is a within-bucket `lag` stitched with each
    * bucket's last value carried from the (tiny) bucket summary. */
  def markRuns(df: DataFrame, valueCol: String, runCol: String = "run",
               cols: ColSpec = ColSpec.default,
               bucketSize: Long = 1L << 20): DataFrame = {
    val ord = Seq(cols.startCol.asc, cols.endCol.asc)
    val bucketed = df.withColumn("__b", Scan.bucketOf(cols.startCol, bucketSize))
    val withPrev = Scan.prefixMax(bucketed, Seq(cols.chrom), "__b", ord,
      cols.endCol, inclusive = false, "__pm")
    val wLocal = Window.partitionBy(cols.chromCol, col("__b"))
      .orderBy(cols.startCol, cols.endCol)
    val wB = Window.partitionBy(cols.chromCol).orderBy(col("__b"))
    val lastVals = bucketed.groupBy(cols.chromCol, col("__b"))
      .agg(max_by(col(valueCol), struct(cols.startCol, cols.endCol))
        .as("__blast"))
      .withColumn("__pvc", lag(col("__blast"), 1).over(wB))
      .drop("__blast")
    // row_number (not coalesce) picks the carry: a legitimately-null
    // previous value must not fall through to the previous bucket's
    val flagged = withPrev
      .join(broadcast(lastVals), Seq(cols.chrom, "__b"), "left")
      .withColumn("__rn", row_number().over(wLocal))
      .withColumn("__pv",
        when(col("__rn") === 1, col("__pvc"))
          .otherwise(lag(col(valueCol), 1).over(wLocal)))
      .withColumn("__border",
        when(col("__pm").isNull, lit(1L))
          .otherwise((cols.startCol > col("__pm") ||
            !(col(valueCol) <=> col("__pv"))).cast("long")))
    Scan.prefixSum(flagged, Seq(cols.chrom), "__b", ord,
        col("__border"), inclusive = true, "__runs")
      .withColumn(runCol, col("__runs") - 1)
      .drop("__b", "__pm", "__pvc", "__rn", "__pv", "__border", "__runs")
  }

  /** Merge runs of equal-valued abutting intervals with optional extra
    * aggregations (reference `extras.py:653-735`). */
  def mergeRuns(df: DataFrame, valueCol: String,
                agg: Map[String, Column] = Map.empty,
                cols: ColSpec = ColSpec.default,
                bucketSize: Long = 1L << 20): DataFrame = {
    val marked = markRuns(df, valueCol, "__run", cols, bucketSize)
    val aggs = Seq(
      min(cols.startCol).as(cols.start),
      max(cols.endCol).as(cols.end)) ++
      agg.map { case (n, c) => c.as(n) }
    val outCols = Seq(cols.chromCol, cols.startCol, cols.endCol,
      col(valueCol)) ++ agg.keys.toSeq.map(col)
    marked
      .groupBy(cols.chromCol, col(valueCol), col("__run"))
      .agg(aggs.head, aggs.tail: _*)
      .drop("__run")
      .select(outCols: _*)
  }

  /** Greedy first-fit stacking levels for plotting (reference
    * `stack_intervals`, `arrops.py:773-798`, used by `vis.plot_intervals`):
    * sweep each chromosome's borders in (position, ends-before-starts,
    * longer-first) order, assigning each interval the smallest free level.
    * First-fit is inherently sequential per chromosome, so this runs as a
    * per-chrom `mapPartitions` sweep (repartition by chrom + local sort) —
    * appropriate for a visualization-scale operator; levels are O(max
    * overlap depth) deep. Zero-length points are promoted to length 1
    * (the engine-wide convention) so they occupy a level at their
    * position. Adds `levelCol` (0-based). */
  def stackIntervals(df: DataFrame, levelCol: String = "level",
                     cols: ColSpec = ColSpec.default): DataFrame = {
    val l = RowId.withRowId(df, "__sid")
    val pend = when(cols.endCol === cols.startCol, cols.startCol + 1)
      .otherwise(cols.endCol)
    val ev = l.select(cols.chromCol.as("__ch"),
        col("__sid"), cols.startCol.as("__s"), pend.as("__e"))
      .select(col("__ch"), col("__sid"), (col("__e") - col("__s")).as("__len"),
        explode(array(
          struct(col("__s").as("b"), lit(1).as("t")),
          struct(col("__e").as("b"), lit(-1).as("t")))).as("__ev"))
      .select(col("__ch"), col("__sid"), col("__len"),
        col("__ev.b").as("__b"), col("__ev.t").as("__t"))
    val parted = ev.repartition(graft.core.Par.width(ev), col("__ch"))
      .sortWithinPartitions(col("__ch"), col("__b").asc, col("__t").asc,
        col("__len").desc)
    val outSchema = StructType(Seq(
      StructField("__lid", l.schema("__sid").dataType),
      StructField(levelCol, IntegerType, nullable = false)))
    val levels = parted.mapPartitions { rows =>
      var curChrom: String = null
      val freed = new java.util.TreeSet[Integer]()
      var next = 0
      val live = scala.collection.mutable.HashMap.empty[Any, Int]
      rows.flatMap { r =>
        val ch = r.getString(0)
        if (ch != curChrom) {
          curChrom = ch; freed.clear(); next = 0; live.clear()
        }
        val id = r.get(1)
        if (r.getInt(4) > 0) { // start: assign smallest free level
          val lvl =
            if (!freed.isEmpty) { val v = freed.pollFirst(); v.intValue() }
            else { val v = next; next += 1; v }
          live.put(id, lvl)
          Some(Row(id, lvl))
        } else { // end: release
          live.remove(id).foreach(lvl => freed.add(lvl))
          None
        }
      }
    }(Encoders.row(outSchema))
    l.join(levels, col("__sid") === col("__lid"), "inner")
      .drop("__sid", "__lid")
  }

  /** Interval-set Jaccard statistic (the `bedtools jaccard` measure —
    * beyond the reference, which has no whole-set similarity): both
    * inputs are self-merged (min_dist=0) so internal overlap cannot
    * double-count, the intersection is the total overlapping base count
    * of the merged runs, and the union is `bp1 + bp2 - intersection`.
    * Returns exactly one row:
    * (intersection_bp, union_bp, jaccard, n_intersections) — jaccard is
    * the single IEEE division of two exact longs. Scale shape: two
    * range-partitioned merge sweeps + one binned overlap join + scalar
    * aggregates; nothing quadratic, nothing single-partition. */
  def jaccardIntervals(df1: DataFrame, df2: DataFrame,
                       cols1: ColSpec = ColSpec.default,
                       cols2: ColSpec = ColSpec.default,
                       binSize: Long = IntervalJoin.DefaultBinSize): DataFrame = {
    // persist barrier on each merged side: both feed TWO plan branches
    // (the overlap join and a bp aggregate), and the range-partitioned
    // merge is nondeterministically partitioned — see [[multiIntersect]]
    val m1 = Ops.merge(df1, cols = cols1).persist()
    val m2 = Ops.merge(df2, cols = cols2).persist()
    val pairs = Ops.overlap(m1, m2, how = "inner", suffixes = ("_1", "_2"),
      returnOverlap = true, binSize = binSize)
    val inter = pairs.agg(
      coalesce(sum(greatest(lit(0L), col("overlap_end") - col("overlap_start"))),
        lit(0L)).as("intersection_bp"),
      count(lit(1)).as("n_intersections"))
    val bp1 = m1.agg(coalesce(sum(col(cols1.end) - col(cols1.start)), lit(0L))
      .as("__bp1"))
    val bp2 = m2.agg(coalesce(sum(col(cols2.end) - col(cols2.start)), lit(0L))
      .as("__bp2"))
    val out = inter.crossJoin(bp1).crossJoin(bp2)
      .withColumn("union_bp",
        col("__bp1") + col("__bp2") - col("intersection_bp"))
      .withColumn("jaccard",
        when(col("union_bp") > 0L,
          col("intersection_bp").cast("double") / col("union_bp").cast("double")))
      .select(col("intersection_bp"), col("union_bp"), col("jaccard"),
        col("n_intersections"))
    // the statistic is exactly ONE row: compute it eagerly so both merge
    // barriers release before returning — a lazy return would pin two
    // input-sized cache entries in the CacheManager for the session
    // lifetime (per-call leak in a long-lived session).
    val rows = out.collect()
    m1.unpersist(blocking = false)
    m2.unpersist(blocking = false)
    df1.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), out.schema)
  }

  /** Relative-distance statistic (bedtools `reldist`, Favorov et al.
    * 2012): for each df1 interval, the distance of its midpoint to the
    * closer of the two flanking df2 midpoints, scaled by the distance
    * between those flanks — ~U[0, 0.5] when the sets are spatially
    * unrelated, skewed toward 0 under correlation. Both relations reduce
    * to zero-length midpoint POINTS, so [[Closest]]'s gap distance
    * degenerates to the exact |mid1 - mid2| (a coincident midpoint is an
    * overlap at distance 0); one upstream and one downstream k=1 as-of
    * query supply the flanks, intervals missing either flank on their
    * chromosome drop (the bedtools rule), and the statistic is a single
    * IEEE division of two exact longs (hash-safe).
    *
    * Scale shape: BOTH flanks ride ONE bucket-parallel event-list scan —
    * every midpoint event is mirrored into a `(chrom, +-1)` direction
    * group with signed position, so one [[Scan.prefixMax]] pass computes
    * the running "last df2 midpoint at-or-before me" in both directions
    * at once (in signed space the downstream flank IS an upstream max),
    * and an id-keyed hash agg pivots the two directions back together.
    * Replaces the original two full as-of [[Closest]] invocations
    * (measured ~2x on the sf0.1 gate); nothing quadratic, no
    * whole-chromosome window. Eager: the event union feeding the scan
    * needs a consistency barrier (Scan INPUT CONTRACT), so the result is
    * materialized and the barrier released before returning. */
  def relDistance(df1: DataFrame, df2: DataFrame, idCol: String = "id",
                  cols1: ColSpec = ColSpec.default,
                  cols2: ColSpec = ColSpec.default,
                  binSize: Long = IntervalJoin.DefaultBinSize,
                  bucketSize: Long = 1L << 20): DataFrame = {
    val dirs = array(lit(1L), lit(-1L))
    // __kind 0 (df2 source) sorts before __kind 1 (df1 query) at equal
    // position: a coincident midpoint is a flank at distance 0 on BOTH
    // sides (the Closest overlap rule this fusion replaces).
    val aEv = df1.select(col(idCol).as("__aid"), cols1.chromCol.as("chrom"),
        expr(s"(${cols1.start} + ${cols1.end}) div 2").as("__m"))
      .withColumn("__dir", explode(dirs))
      .select(col("__aid"), col("chrom"), col("__dir"),
        (col("__m") * col("__dir")).as("__pos"), lit(1).as("__kind"),
        lit(null).cast("long").as("__bval"))
    val bEv = df2.select(cols2.chromCol.as("chrom"),
        expr(s"(${cols2.start} + ${cols2.end}) div 2").as("__m"))
      .withColumn("__dir", explode(dirs))
      .select(lit(null).cast("long").as("__aid"), col("chrom"), col("__dir"),
        (col("__m") * col("__dir")).as("__pos"), lit(0).as("__kind"),
        (col("__m") * col("__dir")).as("__bval"))
    val events = aEv.unionByName(bEv)
      .withColumn("__bkt", Scan.bucketOf(col("__pos"), bucketSize))
      .persist()
    val flanked = Scan.prefixMax(events, Seq("chrom", "__dir"), "__bkt",
        Seq(col("__pos"), col("__kind")), col("__bval"),
        inclusive = true, "__flank")
      .filter(col("__kind") === 1 && col("__flank").isNotNull)
      // signed space collapses both directions to one formula:
      //   fwd: d_up   = m_a - max(m_b <= m_a)            = pos - flank
      //   rev: d_down = min(m_b >= m_a) - m_a = -flank + pos
      .select(col("__aid"), col("__dir"), (col("__pos") - col("__flank")).as("__d"))
    val out = flanked.groupBy(col("__aid"))
      .agg(max(when(col("__dir") === 1L, col("__d"))).as("__dup"),
        max(when(col("__dir") === -1L, col("__d"))).as("__ddown"))
      .filter(col("__dup").isNotNull && col("__ddown").isNotNull)
      .withColumn("reldist",
        when(col("__dup") + col("__ddown") === 0L, lit(0.0))
          .otherwise(least(col("__dup"), col("__ddown")).cast("double") /
            (col("__dup") + col("__ddown")).cast("double")))
      .select(col("__aid").as(idCol), col("__dup").as("d_upstream"),
        col("__ddown").as("d_downstream"), col("reldist"))
      .localCheckpoint()
    events.unpersist(blocking = false)
    out
  }

  /** Genome-wide coverage-depth histogram (the `bedtools genomecov`
    * summary): for every depth, the total bases at exactly that depth
    * and the genome fraction (single IEEE division of exact longs).
    * Depth 0 is the chromsizes remainder — `pileup` only emits runs
    * between a chromosome's first and last event, so leading/trailing
    * uncovered spans are accounted by subtraction. Scale shape: one
    * bucket-parallel pileup sweep + a depth-keyed hash agg (persisted:
    * it is depth-cardinality-sized and referenced twice). */
  def coverageHistogram(df: DataFrame, chromSizes: DataFrame,
                        cols: ColSpec = ColSpec.default,
                        bucketSize: Long = 1L << 20): DataFrame = {
    val hist = pileup(df, None, cols, bucketSize)
      .filter(col("depth") > 0)
      .groupBy(col("depth"))
      .agg(sum(col(cols.end) - col(cols.start)).as("n_bases"))
      .persist()
    val g = chromSizes.agg(sum(col("length")).cast("long").as("__g"))
    val covered = hist.agg(coalesce(sum(col("n_bases")), lit(0L)).as("__cov"))
    val zero = g.crossJoin(covered)
      .select(lit(0L).as("depth"), (col("__g") - col("__cov")).as("n_bases"))
    val out = hist.unionByName(zero).crossJoin(g)
      .withColumn("fraction",
        col("n_bases").cast("double") / col("__g").cast("double"))
      .select(col("depth"), col("n_bases"), col("fraction"))
      // eager, depth-cardinality-sized: localCheckpoint materializes the
      // histogram so the input-sized `hist` barrier releases now instead
      // of leaking a CacheManager entry per call; its own blocks are
      // ContextCleaner-collected once the result is unreferenced.
      .localCheckpoint()
    hist.unpersist(blocking = false)
    out
  }

  /** Multi-set intersection runs (the `bedtools multiinter` shape):
    * partition the covered genome into maximal runs labelled by HOW MANY
    * of the input interval SETS cover them. Each input is self-merged
    * first so a set counts at most once per base; the merged relations
    * union and one pileup sweep yields (chrom, start, end, n_sets) for
    * every run covered by at least one set. Scale shape: k merge sweeps
    * + one bucket-parallel pileup — linear in rows. */
  def multiIntersect(dfs: Seq[DataFrame],
                     cols: ColSpec = ColSpec.default,
                     bucketSize: Long = 1L << 20): DataFrame = {
    require(dfs.nonEmpty, "multiIntersect needs at least one input")
    val merged = dfs.map(df => Ops.merge(df, cols = cols)
      .select(cols.chromCol, cols.startCol, cols.endCol))
    // persist barrier: the range-partitioned merge plans are
    // NONDETERMINISTICALLY partitioned (repartitionByRange samples), and
    // the pileup scan consumes its input in more than one plan branch —
    // without a single materialization the branches can see inconsistent
    // row sets (the graft.ops.RowId hazard; observed as phantom
    // zero-length runs). The merged union is at most input-sized.
    val u = merged.reduce(_ unionByName _).persist()
    val out = pileup(u, None, cols, bucketSize)
      .filter(col("depth") > 0)
      .withColumnRenamed("depth", "n_sets")
      // eager: materializing the runs lets the union barrier release
      // immediately (no per-call CacheManager leak); the checkpoint
      // blocks are ContextCleaner-collected with the result, and the
      // runs are no larger than the merged input the persist held.
      .localCheckpoint()
    u.unpersist(blocking = false)
    out
  }
}
