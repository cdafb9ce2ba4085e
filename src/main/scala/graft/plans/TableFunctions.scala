package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo,
  Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** TVF-style SQL surface for WHOLE-OPERATOR semantics a scalar function
  * can't express — nearest-neighbor (`closest`) and cluster-merge
  * (`merge`). A pure-SQL user writing k-NN as a window over a
  * chrom-only join gets the O(|L|·|R|/n_chrom) cross-product plan the
  * engine exists to avoid; these table functions resolve straight to
  * the engine's logical plans (banded candidates + rank scan for
  * closest, range-partitioned sweep for merge), so `spark.sql` users
  * get the scale-safe shape without the Scala API:
  *
  * {{{ SELECT id_1, id_2, distance
  *     FROM graft_closest('probes', 'targets', 3, 'id') }}}
  * {{{ SELECT chrom, start, `end`, n_intervals
  *     FROM graft_merge('intervals', 0) }}}
  *
  * Table arguments are string literals resolved against the session
  * catalog (views or tables) at analysis time — the injected builder
  * receives expressions, not relations, so this is the TVF idiom
  * Spark's `injectTableFunction` supports. The closest bin width comes
  * from the same runtime conf as the interval-join rewrite
  * ([[IntervalJoinRewrite.BinSizeKey]]) — one knob for the SQL
  * surface's coordinate scale. */
object GraftTableFunctions {

  private def strLit(e: Expression, fn: String, what: String): String =
    e match {
      case Literal(v, StringType) if v != null => v.toString
      case other => throw new IllegalArgumentException(
        s"$fn: $what must be a string literal, got $other")
    }

  private def longLit(e: Expression, fn: String, what: String): Long =
    e match {
      case Literal(v: Int, IntegerType) => v.toLong
      case Literal(v: Long, LongType) => v
      case other => throw new IllegalArgumentException(
        s"$fn: $what must be an integer literal, got $other")
    }

  /** Comma-separated name-list literal ('' or whitespace-only → Nil) —
    * the SQL spelling of the Scala API's `on: Seq[String]` grouping
    * argument. */
  private def strListLit(e: Expression, fn: String, what: String): Seq[String] =
    strLit(e, fn, what).split(',').iterator.map(_.trim)
      .filter(_.nonEmpty).toSeq

  private def binSize(s: SparkSession): Long =
    s.conf.get(IntervalJoinRewrite.BinSizeKey,
      IntervalJoinRewrite.DefaultBinSize.toString).toLong

  /** Bucket width of the ordered scans behind `graft_cluster`/
    * `graft_merge` — a PARALLELISM knob (results are bucket-invariant):
    * the per-chrom sweep splits into ranges of this many coordinates,
    * so parallelism ~ coordinate_extent / bucketSize per chrom. The
    * 2^20 default suits genome-scale coordinates (~250 ranges per
    * human chromosome); sessions over small coordinate spaces lower it
    * via this conf the way the join rewrite's binSize is lowered. */
  val BucketSizeKey = "spark.graft.sql.scan.bucketSize"
  private def bucketSize(s: SparkSession): Long =
    s.conf.get(BucketSizeKey, (1L << 20).toString).toLong

  val all: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan)] = Seq(
    (FunctionIdentifier("graft_closest"),
      new ExpressionInfo("graft.ops.Closest", "graft_closest"),
      { args: Seq[Expression] =>
        require(args.length >= 3 && args.length <= 5,
          "graft_closest(left_table, right_table, k[, tie_col[, ignore]]) " +
            s"expects 3-5 arguments, got ${args.length}")
        val fn = "graft_closest"
        val s = SparkSession.active
        val k = longLit(args(2), fn, "k").toInt
        // '' means "no tie column" so callers can reach the ignore arg
        val tie = if (args.length > 3)
          Some(strLit(args(3), fn, "tie_col")).filter(_.nonEmpty) else None
        // comma-set of neighbor classes to EXCLUDE: any of
        // 'overlaps', 'upstream', 'downstream' (the Scala ignore_* flags)
        val ignore = if (args.length > 4)
          strListLit(args(4), fn, "ignore").toSet else Set.empty[String]
        val bad = ignore -- Set("overlaps", "upstream", "downstream")
        require(bad.isEmpty,
          s"$fn: ignore accepts overlaps/upstream/downstream, got $bad")
        // bucketSize is the same parallelism knob graft_cluster/merge
        // read (results are bucket-invariant); before r15 it was NOT
        // passed, so the TVF's rank scan always ran at the 2^20
        // genome-scale default — an 8-way parallelism floor that held
        // ext_sql_closest ~1.5x over its Scala twin at sf0.1 (the one
        // non-weather-shaped gap in three straight bench twins).
        graft.ops.Closest.closest(
            s.table(strLit(args(0), fn, "left_table")),
            Some(s.table(strLit(args(1), fn, "right_table"))),
            k = k,
            ignoreOverlaps = ignore("overlaps"),
            ignoreUpstream = ignore("upstream"),
            ignoreDownstream = ignore("downstream"),
            tieBreakingCol = tie, suffixes = ("_1", "_2"),
            binSize = binSize(s), bucketSize = bucketSize(s))
          .queryExecution.logical
      }),
    (FunctionIdentifier("graft_merge"),
      new ExpressionInfo("graft.ops.Ops", "graft_merge"),
      { args: Seq[Expression] =>
        require(args.length == 2 || args.length == 3,
          "graft_merge(table, min_dist[, on_cols]) expects 2-3 " +
            s"arguments, got ${args.length}")
        val fn = "graft_merge"
        val s = SparkSession.active
        val on = if (args.length > 2)
          strListLit(args(2), fn, "on_cols") else Nil
        graft.ops.Ops.merge(s.table(strLit(args(0), fn, "table")),
            minDist = Some(longLit(args(1), fn, "min_dist")), on = on)
          .queryExecution.logical
      }),
    (FunctionIdentifier("graft_cluster"),
      new ExpressionInfo("graft.ops.Ops", "graft_cluster"),
      { args: Seq[Expression] =>
        require(args.length == 2 || args.length == 3,
          "graft_cluster(table, min_dist[, on_cols]) expects 2-3 " +
            s"arguments, got ${args.length}")
        val fn = "graft_cluster"
        val s = SparkSession.active
        val on = if (args.length > 2)
          strListLit(args(2), fn, "on_cols") else Nil
        graft.ops.Ops.cluster(s.table(strLit(args(0), fn, "table")),
            minDist = Some(longLit(args(1), fn, "min_dist")), on = on,
            bucketSize = bucketSize(s))
          .queryExecution.logical
      }),
    (FunctionIdentifier("graft_coverage"),
      new ExpressionInfo("graft.ops.Ops", "graft_coverage"),
      { args: Seq[Expression] =>
        require(args.length == 2,
          s"graft_coverage(table, by_table) expects 2 arguments, got ${args.length}")
        val fn = "graft_coverage"
        val s = SparkSession.active
        graft.ops.Ops.coverage(
            s.table(strLit(args(0), fn, "table")),
            s.table(strLit(args(1), fn, "by_table")),
            binSize = binSize(s))
          .queryExecution.logical
      }),
    (FunctionIdentifier("graft_subtract"),
      new ExpressionInfo("graft.ops.Ops", "graft_subtract"),
      { args: Seq[Expression] =>
        require(args.length == 2,
          s"graft_subtract(table, minus_table) expects 2 arguments, got ${args.length}")
        val fn = "graft_subtract"
        val s = SparkSession.active
        graft.ops.Ops.subtract(
            s.table(strLit(args(0), fn, "table")),
            s.table(strLit(args(1), fn, "minus_table")),
            binSize = binSize(s))
          .queryExecution.logical
      }),
    (FunctionIdentifier("graft_complement"),
      new ExpressionInfo("graft.ops.Ops", "graft_complement"),
      { args: Seq[Expression] =>
        require(args.length == 1,
          s"graft_complement(table) expects 1 argument, got ${args.length}")
        val fn = "graft_complement"
        val s = SparkSession.active
        graft.ops.Ops.complement(s.table(strLit(args(0), fn, "table")))
          .queryExecution.logical
      }))
}
