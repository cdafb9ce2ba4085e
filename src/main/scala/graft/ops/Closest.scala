package graft.ops

import graft.core.ColSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** k-nearest-neighbor join by genomic distance (reference
  * `ops.py:919-1240`, kernels `arrops.py:506-754`) — the engine's as-of
  * join.
  *
  * Shape (all shuffle-friendly, no cartesian products):
  *  1. overlap candidates via [[IntervalJoin]] (distance 0);
  *  2. per side, the k nearest non-overlapping neighbors found with a
  *     distributed ''as-of'' lookup: union slim right events (keyed by
  *     end resp. start) with slim left probes and take ONE running count
  *     of right events — for a right row that count is its per-chromosome
  *     ordinal, for a probe it is the as-of insertion position; then
  *     `sequence`+`explode` the k neighbor ordinals, equi-join them back
  *     to the ordinal'd events, and fetch the full right rows by row id —
  *     O(k) rows per left row, never a scan of the whole right side. The
  *     count runs as a two-level prefix scan over (chrom,
  *     coordinate-bucket) — no whole-chromosome single-partition window
  *     (see [[Scan]]);
  *  3. rank the union with the reference's overlap-first ordering
  *     (non-overlap sort distance = dist+1, `arrops.py:722-730`), keep the
  *     top k per left row, and left-join back so rows with no neighbor
  *     survive with nulls.
  */
object Closest {

  /** @param df2 None -> self-closest, excluding identical rows
    *            (reference `arrops.py:655-657`).
    * @param directionCol df1 column (e.g. strand); rows with value "-" have
    *                     upstream/downstream flipped (`ops.py:1009-1012`).
    * @param tieBreakingCol df2 column; lower wins (`arrops.py:737-740`).
    * @param tieBreakingExpr arbitrary tie expression over df2's columns
    *                        (UNSUFFIXED names — references are rewritten
    *                        onto the suffixed right side); lower wins.
    *                        The reference accepts a callable computing tie
    *                        values from the df2 intervals
    *                        (`ops.py:972-980`); e.g. `-col("score")` makes
    *                        the highest score win. Mutually exclusive with
    *                        `tieBreakingCol`. Ties WITHIN equal expression
    *                        values fall back to an internal content id —
    *                        make the expression injective where the choice
    *                        matters.
    * @param returnInput include both sides' input columns (`ops.py:1110`).
    * @param returnDistance include `distance` (zero for overlaps,
    *                       `ops.py:1113-1115`).
    * @param returnOverlap add `have_overlap`/`overlap_start`/`overlap_end`,
    *                      nulls when not overlapping (`ops.py:1117-1121`).
    */
  def closest(df1: DataFrame, df2: Option[DataFrame] = None, k: Int = 1,
              ignoreOverlaps: Boolean = false,
              ignoreUpstream: Boolean = false,
              ignoreDownstream: Boolean = false,
              directionCol: Option[String] = None,
              tieBreakingCol: Option[String] = None,
              tieBreakingExpr: Option[Column] = None,
              returnInput: Boolean = true,
              returnDistance: Boolean = true,
              returnOverlap: Boolean = false,
              suffixes: (String, String) = ("", "_"),
              cols1: ColSpec = ColSpec.default,
              cols2: ColSpec = ColSpec.default,
              binSize: Long = IntervalJoin.DefaultBinSize,
              bucketSize: Long = 1L << 20): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(returnInput || returnDistance || returnOverlap,
      "at least one of returnInput/returnDistance/returnOverlap required")
    require(!(ignoreOverlaps && ignoreUpstream && ignoreDownstream),
      "cannot ignore overlaps, upstream, and downstream at once")
    val selfJoin = df2.isEmpty
    val (sf1, sf2) = suffixes
    val base2 = df2.getOrElse(df1)
    val c1 = cols1.withSuffix(sf1)
    val c2 = cols2.withSuffix(sf2)

    val l = RowId.withRowId(ColSpec.suffixAll(df1, sf1), "__id1")
    // The right side's id only keys the ordinal->row fetch and the final
    // tie-break; full-duplicate rows are interchangeable under both, so
    // the shuffle-free content id suffices. Self-closest is the exception:
    // there "identical row" must mean "same row", not "same content"
    // (reference excludes only the row itself, arrops.py:655-657), so it
    // pays the dup-rank shuffle for unique ids.
    val r =
      if (selfJoin) RowId.withRowId(ColSpec.suffixAll(base2, sf2), "__id2")
      else RowId.withContentId(ColSpec.suffixAll(base2, sf2), "__id2")

    require(tieBreakingCol.isEmpty || tieBreakingExpr.isEmpty,
      "tieBreakingCol and tieBreakingExpr are mutually exclusive")
    val tie: Column = (tieBreakingCol, tieBreakingExpr) match {
      case (Some(t), _) => col(t + sf2)
      case (None, Some(e)) =>
        // rewrite the user's unsuffixed df2 references onto the suffixed
        // right relation — evaluated as a projection wherever `tie` is
        // used, so the content/row ids (hashes over the ORIGINAL column
        // set) are untouched and self-closest identity still aligns
        import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
        import org.apache.spark.sql.graftbridge.Bridge
        Bridge.column(Bridge.catalystExpression(e).transform {
          case a: UnresolvedAttribute =>
            UnresolvedAttribute(a.nameParts.init :+ (a.nameParts.last + sf2))
        })
      case _ => lit(0L)
    }
    val tieType =
      if (tieBreakingCol.isDefined || tieBreakingExpr.isDefined)
        r.select(tie.as("__t")).schema.head.dataType
      else LongType
    val lCols = l.columns.toSeq
    val rCols = r.columns.toSeq
    val allCols = lCols ++ rCols

    // Candidates stay SLIM — (ids, coords, tie, dist) only — until after
    // the top-k rank; the wide l/r payload columns re-enter by row id for
    // just the k surviving rows per probe. Ranking 3.8M candidate rows at
    // full user-column width measured 3x slower than the slim rank+join.
    val slimOf: DataFrame => DataFrame = df => df.select(
      col("__id1"), col("__id2"),
      c1.startCol.as("__s1"), c1.endCol.as("__e1"),
      c2.startCol.as("__s2"), c2.endCol.as("__e2"),
      tie.as("__tie"), col("__dist"), col("__sortdist"))

    // ---- candidate set A: overlapping pairs (distance 0) ----------------
    val overlaps =
      if (ignoreOverlaps) None
      else Some(slimOf(
        IntervalJoin.pairs(l, r, c1, c2, Nil, IntervalJoin.Binned, binSize)
          .withColumn("__dist", lit(0L))
          .withColumn("__sortdist", lit(0L))))

    // ---- candidate sets B/C: k nearest per side via as-of lookup --------
    // B: right rows strictly left of the query (end2 <= start1), nearest =
    //    largest end2. Ordinals ascend by end2; preferred tie-values are
    //    placed LAST among equal end2 so that taking ordinals from the tail
    //    keeps them.
    // One SLIM union scan does both jobs: the running count of right
    // events is the right row's per-chromosome ordinal AND the probe's
    // as-of position (right events at a probe's own key sort before the
    // probe on the B side and after it on the C side, giving <= vs <
    // semantics for free). Events carry both coordinate pairs, so the
    // candidate join never touches the wide relations.
    val takeK = if (selfJoin) k + 1 else k
    def sideCandidates(leftSide: Boolean): DataFrame = {
      val rEvents = r.select(
        c2.chromCol.as("__ch"),
        (if (leftSide) c2.endCol else c2.startCol).as("__key"),
        lit(if (leftSide) 0 else 1).as("__tag"),
        tie.as("__tie"), col("__id2").as("__rid"),
        lit(null).cast(l.schema("__id1").dataType).as("__pid"),
        lit(null).cast(LongType).as("__s1"),
        lit(null).cast(LongType).as("__e1"),
        c2.startCol.as("__s2"), c2.endCol.as("__e2"))
      val lEvents = l.select(
        c1.chromCol.as("__ch"),
        (if (leftSide) c1.startCol else c1.endCol).as("__key"),
        lit(if (leftSide) 1 else 0).as("__tag"),
        lit(null).cast(tieType).as("__tie"),
        lit(null).cast(r.schema("__id2").dataType).as("__rid"),
        col("__id1").as("__pid"),
        c1.startCol.as("__s1"), c1.endCol.as("__e1"),
        lit(null).cast(LongType).as("__s2"),
        lit(null).cast(LongType).as("__e2"))
      val ord =
        if (leftSide) Seq(col("__key").asc, col("__tag").asc,
          col("__tie").desc, col("__rid").desc)
        else Seq(col("__key").asc, col("__tag").asc,
          col("__tie").asc, col("__rid").asc)
      val scanned = Scan.prefixSum(
        rEvents.unionByName(lEvents)
          .withColumn("__b", Scan.bucketOf(col("__key"), bucketSize)),
        Seq("__ch"), "__b", ord,
        when(col("__rid").isNotNull, 1L).otherwise(0L),
        inclusive = true, "__cnt")
      // B: neighbors at ordinals cnt-takeK+1..cnt ; C: cnt+1..cnt+takeK
      val wanted = scanned.filter(col("__pid").isNotNull)
        .withColumn("__want",
          if (leftSide)
            when(col("__cnt") < 1, array().cast(ArrayType(LongType)))
              .otherwise(sequence(
                greatest(lit(1L), col("__cnt") - lit(takeK - 1L)),
                col("__cnt")))
          else
            sequence(col("__cnt") + lit(1L),
              col("__cnt") + lit(takeK.toLong)))
        .select(col("__pid").as("__id1"), col("__ch").as("__pch"),
          col("__s1"), col("__e1"), explode(col("__want")).as("__wseq"))
      val rightSeq = scanned.filter(col("__rid").isNotNull)
        .select(col("__ch"), col("__cnt").as("__rseq"),
          col("__rid").as("__id2"), col("__tie"), col("__s2"), col("__e2"))
      wanted.join(rightSeq,
          col("__pch") === col("__ch") && col("__wseq") === col("__rseq"),
          "inner")
        .drop("__wseq", "__rseq", "__ch", "__pch")
        .withColumn("__dist",
          if (leftSide) col("__s1") - col("__e2")
          else col("__s2") - col("__e1"))
        .withColumn("__sortdist", col("__dist") + lit(1L))
    }

    // a side is needed unless ignored for every row
    val upstreamC =
      if (ignoreUpstream && directionCol.isEmpty) None
      else Some(sideCandidates(leftSide = true))
    val downstreamC =
      if (ignoreDownstream && directionCol.isEmpty) None
      else Some(sideCandidates(leftSide = false))

    var cands = (overlaps.toSeq ++ upstreamC.toSeq ++ downstreamC.toSeq)
      .reduce(_ unionByName _)

    if (selfJoin) cands = cands.filter(col("__id1") =!= col("__id2"))

    // direction-aware masking: genomic-left = upstream for "+" rows,
    // downstream for "-" rows. The direction column (an l attribute)
    // joins in slim when needed.
    if ((ignoreUpstream || ignoreDownstream) && directionCol.isDefined) {
      val d = directionCol.get + sf1
      cands = cands.join(
        l.select(col("__id1"), col(d).as("__dir")), Seq("__id1"), "left")
    }
    if (ignoreUpstream || ignoreDownstream) {
      val isMinus = directionCol match {
        case Some(_) => col("__dir") === "-"
        case None    => lit(false)
      }
      val genomicLeft = col("__e2") <= col("__s1") && col("__sortdist") > 0
      val genomicRight = col("__s2") >= col("__e1") && col("__sortdist") > 0
      val isUpstream = when(isMinus, genomicRight).otherwise(genomicLeft)
      val isDownstream = when(isMinus, genomicLeft).otherwise(genomicRight)
      if (ignoreUpstream) cands = cands.filter(!isUpstream)
      if (ignoreDownstream) cands = cands.filter(!isDownstream)
      if (directionCol.isDefined) cands = cands.drop("__dir")
    }

    val wRank = Window.partitionBy(col("__id1"))
      .orderBy(col("__sortdist").asc, col("__tie").asc, col("__id2").asc)
    val ovlStart = greatest(col("__s1"), col("__s2"))
    val ovlEnd = least(col("__e1"), col("__e2"))
    // have_overlap follows the candidate convention (__sortdist == 0 under
    // the engine-wide point promotion), NOT raw ovlStart < ovlEnd: a
    // zero-length interval matched as an overlap via promotion must report
    // have_overlap=true with its (empty, start==end) intersection coords —
    // raw coords would contradict the distance=0 the same pair carries.
    val hasOvl = col("__sortdist") === 0
    val extraRanked: Seq[Column] =
      (if (returnOverlap)
        Seq(hasOvl.as("have_overlap"),
          when(hasOvl, ovlStart).otherwise(lit(null).cast(LongType))
            .as("overlap_start"),
          when(hasOvl, ovlEnd).otherwise(lit(null).cast(LongType))
            .as("overlap_end"))
      else Nil) ++
      (if (returnDistance) Seq(col("__dist").as("distance")) else Nil)
    val extraNulls: Seq[Column] =
      (if (returnOverlap)
        Seq(lit(null).cast(BooleanType).as("have_overlap"),
          lit(null).cast(LongType).as("overlap_start"),
          lit(null).cast(LongType).as("overlap_end"))
      else Nil) ++
      (if (returnDistance) Seq(lit(null).cast(LongType).as("distance"))
       else Nil)
    val ranked = cands
      .withColumn("__rk", row_number().over(wRank))
      .filter(col("__rk") <= k)
      .select(col("__id1") +: col("__id2") +: extraRanked: _*)

    // wide payload re-enters for just the top-k rows; content ids of the
    // fetch side collide only for full-duplicate rows, so one fetch row
    // per id keeps the multiset exact
    val rFetch = (if (selfJoin) r else r.dropDuplicates("__id2"))
      .withColumnRenamed("__id2", "__fid")
    // Assembly is ONE left join of l against the ranked candidates:
    // probes with no candidate null-extend for free. An earlier
    // matched-union-anti formulation referenced `ranked` from two plan
    // branches, so the whole candidate pipeline (both as-of scans, the
    // overlap join, the rank window) executed twice — measured 2-10x
    // wall-time swings at sf0.1 as the duplicated stages raced. Hash
    // join hints because the ids are structs: sort-merge would sort the
    // wide payload relations on struct keys.
    val withR =
      if (returnInput)
        ranked.join(rFetch.hint("shuffle_hash"),
          col("__id2") === col("__fid"), "inner").drop("__fid")
      else ranked
    val base = if (returnInput) l else l.select(col("__id1"))
    val extraColNames =
      (if (returnOverlap) Seq("have_overlap", "overlap_start", "overlap_end")
       else Nil) ++
        (if (returnDistance) Seq("distance") else Nil)
    val outNames =
      (if (returnInput) (lCols ++ rCols).filterNot(Set("__id1", "__id2"))
       else Nil) ++ extraColNames
    base.join(withR.hint("shuffle_hash"), Seq("__id1"), "left")
      .select(outNames.map(col): _*)
  }
}
