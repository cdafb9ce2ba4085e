package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic interval relations derived from the driver's TPC-H-ish
  * parquet tables (TESTDATA.md), used by `SparkEntry.queries`, plus the
  * exactly-equivalent DuckDB SQL CTEs used by `SparkEntry.oracleSql`.
  *
  * Coordinate design: `start` = days since 1995-01-01 (ship/order dates
  * span 1995..2001 -> coords 0..~2530), 8 chromosomes `c0..c7`, interval
  * lengths 0..40 (zero-length points arise where `l_quantity % 30 == 0`).
  * All numeric outputs are BIGINT on both engines so the driver's
  * schema/hash compare is exact.
  */
object TestTables {

  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def days(c: String) =
    datediff(col(c).cast("date"), lit("1995-01-01").cast("date")).cast("long")

  /** Within-order ordering of lineitem for a deterministic synthetic row
    * id — (l_orderkey, l_linenumber) is NOT unique in this data; rows that
    * tie on all these keys are full duplicates, for which id assignment is
    * interchangeable. */
  private val liOrder = Seq("l_linenumber", "l_partkey",
    "l_suppkey", "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "l_returnflag", "l_linestatus", "l_shipdate")

  /** ~60k rows at sf0.01; includes zero-length points.
    * `id = l_orderkey*100 + rank within order` is unique and deterministic
    * without a global sort: the window partitions by l_orderkey, so id
    * assignment parallelizes across the cluster (TPC-H has <= 7 lines per
    * order; 100 leaves slack for duplicate rows). */
  def iv1(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_orderkey")).orderBy(liOrder.map(col): _*)
    table(s, dir, "lineitem")
      .withColumn("id",
        col("l_orderkey").cast("long") * 100 + row_number().over(w))
      .select(
        col("id"),
        concat(lit("c"), (col("l_suppkey") % 8).cast("string")).as("chrom"),
        days("l_shipdate").as("start"),
        (days("l_shipdate") + (col("l_quantity").cast("long") % 30)).as("end"),
        when(col("l_orderkey") % 2 === 0, "+").otherwise("-").as("strand"))
  }

  val iv1Sql: String =
    s"""iv1 AS (
      |  SELECT CAST(l_orderkey AS BIGINT) * 100 + ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY ${liOrder.mkString(", ")}) AS id,
      |         'c' || CAST(l_suppkey % 8 AS VARCHAR) AS chrom,
      |         CAST(date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS start,
      |         CAST(date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) + CAST(l_quantity AS BIGINT) % 30 AS BIGINT) AS "end",
      |         CASE WHEN l_orderkey % 2 = 0 THEN '+' ELSE '-' END AS strand
      |  FROM lineitem)""".stripMargin

  /** ~15k rows at sf0.01. */
  def iv2(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "orders").select(
      col("o_orderkey").cast("long").as("id"),
      concat(lit("c"), (col("o_custkey") % 8).cast("string")).as("chrom"),
      days("o_orderdate").as("start"),
      (days("o_orderdate") + 1 + col("o_orderkey") % 25).cast("long").as("end"),
      when(col("o_orderkey") % 3 === 0, "+").otherwise("-").as("strand"))

  val iv2Sql: String =
    """iv2 AS (
      |  SELECT CAST(o_orderkey AS BIGINT) AS id,
      |         'c' || CAST(o_custkey % 8 AS VARCHAR) AS chrom,
      |         CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS start,
      |         CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) + 1 + o_orderkey % 25 AS BIGINT) AS "end",
      |         CASE WHEN o_orderkey % 3 = 0 THEN '+' ELSE '-' END AS strand
      |  FROM orders)""".stripMargin

  /** iv2 plus planted zero-length points `[end, end)` abutting every 7th
    * iv2 interval — the regression fixture for the merged-anti promotion
    * bug (a point absorbed into an abutting merged run must still match
    * df1 rows starting exactly at its coordinate). */
  def iv2p(s: SparkSession, dir: String): DataFrame = {
    val base = iv2(s, dir)
    base.unionByName(base.filter(col("id") % 7 === 0).select(
      (col("id") + 10000000L).as("id"), col("chrom"),
      col("end").as("start"), col("end").as("end"), col("strand")))
  }

  val iv2pSql: String =
    """iv2p AS (
      |  SELECT * FROM iv2
      |  UNION ALL
      |  SELECT id + 10000000, chrom, "end", "end", strand
      |  FROM iv2 WHERE id % 7 = 0)""".stripMargin

  /** Mixed-span relation with a gene-scale tail: a 1/16 subsample of iv1
    * (bounds the pair count) where every 7th id stretches an extra 700
    * coords — ~14% of spans land far beyond the two-level long cut
    * (8*binSize = 512 at the gates' B = 64), so a p99 span probe reads
    * heavy at any sample size. */
  def ivLong(s: SparkSession, dir: String): DataFrame =
    iv1(s, dir).filter(col("id") % 16 === 0)
      .select(col("id"), col("chrom"), col("start"),
        (col("end") + when(col("id") % 7 === 0, 700L).otherwise(0L)).as("end"))

  val ivLongSql: String =
    """ivlong AS (
      |  SELECT id, chrom, start,
      |         "end" + CASE WHEN id % 7 = 0 THEN 700 ELSE 0 END AS "end"
      |  FROM iv1 WHERE id % 16 = 0)""".stripMargin

  /** ~1.5k rows at sf0.01 — the small probe side for closest/pairing. */
  def iv3(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "customer").select(
      col("c_custkey").cast("long").as("id"),
      concat(lit("c"), (col("c_custkey") % 8).cast("string")).as("chrom"),
      ((col("c_custkey") * 37) % 2400).cast("long").as("start"),
      ((col("c_custkey") * 37) % 2400 + 1 + col("c_custkey") % 40).cast("long").as("end"))

  val iv3Sql: String =
    """iv3 AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS id,
      |         'c' || CAST(c_custkey % 8 AS VARCHAR) AS chrom,
      |         CAST((c_custkey * 37) % 2400 AS BIGINT) AS start,
      |         CAST((c_custkey * 37) % 2400 + 1 + c_custkey % 40 AS BIGINT) AS "end"
      |  FROM customer)""".stripMargin

  /** Named, ordered partitioning of each chromosome into 3 regions —
    * the ViewFrame fixture. 24 rows; always broadcast. */
  def view(s: SparkSession): DataFrame =
    s.range(8).select(
      concat(lit("c"), col("id").cast("string")).as("__c"), col("id").as("__i"),
      explode(array(
        struct(lit(0L).as("s"), lit(900L).as("e"), lit("p").as("nm"), lit(0L).as("o")),
        struct(lit(900L).as("s"), lit(1800L).as("e"), lit("q").as("nm"), lit(1L).as("o")),
        struct(lit(1800L).as("s"), lit(2600L).as("e"), lit("r").as("nm"), lit(2L).as("o"))))
        .as("__a"))
      .select(col("__c").as("chrom"), col("__a.s").as("start"),
        col("__a.e").as("end"),
        concat(col("__c"), lit("_"), col("__a.nm")).as("name"),
        (col("__i") * 3 + col("__a.o")).as("ord"))

  val viewSql: String =
    """vw AS (
      |  SELECT 'c' || CAST(i AS VARCHAR) AS chrom, CAST(s AS BIGINT) AS start,
      |         CAST(e AS BIGINT) AS "end",
      |         'c' || CAST(i AS VARCHAR) || '_' || nm AS name,
      |         CAST(i * 3 + o AS BIGINT) AS ord
      |  FROM range(8) t(i)
      |  CROSS JOIN (VALUES (0, 900, 'p', 0), (900, 1800, 'q', 1),
      |                     (1800, 2600, 'r', 2)) v(s, e, nm, o))""".stripMargin

  /** Synthetic chunked sequence store for the seq operators: 8 chroms of
    * length 2570 in 100 bp chunks; bases derive from md5 hex digits
    * (identical in Spark and DuckDB) via `translate` — digit 'f' maps to
    * N so mapped_only paths are exercised (~1/16 N rate). */
  def seqChunks(s: SparkSession): DataFrame = {
    val chroms = s.range(8).select(
      concat(lit("c"), col("id").cast("string")).as("chrom"))
    val js = s.range(26).select(col("id").as("__j"))
    val raw = concat((0 until 4).map(t =>
      md5(concat(col("chrom"), lit("_"), col("__j").cast("string"),
        lit("_" + t)).cast("binary"))): _*)
    chroms.crossJoin(js)
      .withColumn("cstart", col("__j") * 100)
      .withColumn("cend", least(col("cstart") + 100, lit(2570L)))
      .withColumn("seq",
        translate(raw, "0123456789abcdef", "ACGTACGTACGTACGN")
          .substr(lit(1), (col("cend") - col("cstart")).cast("int")))
      .drop("__j")
  }

  val seqChunksSql: String =
    """chunksq AS (
      |  SELECT 'c' || CAST(c AS VARCHAR) AS chrom,
      |         CAST(j * 100 AS BIGINT) AS cstart,
      |         LEAST(CAST(j * 100 + 100 AS BIGINT), 2570) AS cend,
      |         substr(translate(
      |             md5('c'||c||'_'||j||'_0') || md5('c'||c||'_'||j||'_1') ||
      |             md5('c'||c||'_'||j||'_2') || md5('c'||c||'_'||j||'_3'),
      |             '0123456789abcdef', 'ACGTACGTACGTACGN'),
      |           1, CAST(LEAST(j * 100 + 100, 2570) - j * 100 AS INT)) AS seq
      |  FROM range(8) t(c) CROSS JOIN range(26) u(j))""".stripMargin

  /** chromsizes: every chromosome has length 2570 (exercises last-bin clip
    * in binnify: 2570 % 100 != 0). */
  def chromsizes(s: SparkSession): DataFrame =
    s.range(8).select(
      concat(lit("c"), col("id").cast("string")).as("chrom"),
      lit(2570L).as("length"))

  val chromsizesSql: String =
    """chroms AS (
      |  SELECT 'c' || CAST(i AS VARCHAR) AS chrom, CAST(2570 AS BIGINT) AS length
      |  FROM range(8) t(i))""".stripMargin

  /** SQL fragment: min_dist=0 merge of `src` as CTE `name` (chrom,start,
    * end, n_intervals). */
  def mergedSql(src: String, name: String = "m1"): String =
    s"""$name AS (
       |  SELECT chrom, MIN(start) AS start, MAX("end") AS "end", COUNT(*) AS n_intervals
       |  FROM (
       |    SELECT chrom, start, "end",
       |           SUM(brd) OVER (PARTITION BY chrom ORDER BY start, "end", id
       |                          ROWS UNBOUNDED PRECEDING) AS cid
       |    FROM (
       |      SELECT *, CASE WHEN pm IS NULL OR start > pm THEN 1 ELSE 0 END AS brd
       |      FROM (
       |        SELECT id, chrom, start, "end",
       |               MAX("end") OVER (PARTITION BY chrom ORDER BY start, "end", id
       |                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
       |        FROM $src) x) y) z
       |  GROUP BY chrom, cid)""".stripMargin

  /** SQL fragment: merged iv1 (min_dist=0) as CTE `m1` (chrom,start,end). */
  val mergedIv1Sql: String = mergedSql("iv1")

  /** The point-promoted overlap predicate between SQL aliases a and b. */
  def overlapSql(a: String, b: String): String =
    s"""$a.start < (CASE WHEN $b."end" = $b.start THEN $b.start + 1 ELSE $b."end" END)
       | AND $b.start < (CASE WHEN $a."end" = $a.start THEN $a.start + 1 ELSE $a."end" END)""".stripMargin
}
