package graft

import graft.plans.IntervalJoinRewrite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

/** The Catalyst extension (`plans.IntervalJoinRewrite`, registered via
  * `spark.sql.extensions` in TestSpark): plain-SQL range joins must plan
  * as binned equi-joins and return exactly the naive semantics. */
class ExtensionSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set(IntervalJoinRewrite.BinSizeKey, "64")
    spark.conf.set(IntervalJoinRewrite.SmallBytesKey, "0")
  }

  override def afterAll(): Unit = {
    // the session is JVM-shared across suites: restore defaults so no
    // later suite sees a zeroed dimension-side cutoff
    spark.conf.unset(IntervalJoinRewrite.BinSizeKey)
    spark.conf.unset(IntervalJoinRewrite.SmallBytesKey)
    spark.conf.unset(IntervalJoinRewrite.EnabledKey)
    super.afterAll()
  }

  private def ivA: DataFrame = spark.range(0, 1200).select(
    col("id").as("ida"),
    concat(lit("c"), (col("id") % 4).cast("string")).as("chrom"),
    ((col("id") * 37) % 3000).as("start"),
    ((col("id") * 37) % 3000 + 1 + col("id") % 50).as("end"))

  private def ivB: DataFrame = spark.range(0, 900).select(
    col("id").as("idb"),
    concat(lit("c"), (col("id") % 4).cast("string")).as("chrom2"),
    ((col("id") * 53) % 3000).as("start2"),
    ((col("id") * 53) % 3000 + 1 + col("id") % 30).as("end2"))

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def assertRewritten(df: DataFrame): Unit = {
    val p = planOf(df)
    assert(p.contains("Generate explode"), s"no bin explode in plan:\n$p")
    assert(p.contains("ShuffledHashJoin"), s"no SHJ in plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"nested-loop survived the rewrite:\n$p")
  }

  test("SQL overlap join rewrites to the binned plan and matches brute force") {
    ivA.createOrReplaceTempView("ext_a")
    ivB.createOrReplaceTempView("ext_b")
    val sql = spark.sql(
      """SELECT a.ida, b.idb FROM ext_a a JOIN ext_b b
        |  ON a.chrom = b.chrom2 AND a.start < b.end2 AND b.start2 < a.`end`
        |""".stripMargin)
    assertRewritten(sql)
    val brute = ivA.crossJoin(ivB)
      .filter(col("chrom") === col("chrom2") &&
        col("start") < col("end2") && col("start2") < col("end"))
      .select("ida", "idb")
    assert(sql.count() > 1000, "fixture must be non-vacuous")
    assert(sql.exceptAll(brute).isEmpty && brute.exceptAll(sql).isEmpty)
  }

  test("pure range join (no equi key) rewrites — the would-be cartesian shape") {
    val pts = spark.range(0, 800)
      .select(col("id").as("pid"), ((col("id") * 97) % 3000).as("p"))
    val rng = spark.range(0, 300).select(
      col("id").as("rid"),
      ((col("id") * 31) % 3000).as("lo"),
      ((col("id") * 31) % 3000 + 40).as("hi"))
    pts.createOrReplaceTempView("ext_pts")
    rng.createOrReplaceTempView("ext_rng")
    val sql = spark.sql(
      """SELECT p.pid, r.rid FROM ext_pts p JOIN ext_rng r
        |  ON r.lo <= p.p AND p.p < r.hi""".stripMargin)
    assertRewritten(sql)
    val brute = pts.crossJoin(rng)
      .filter(col("lo") <= col("p") && col("p") < col("hi"))
      .select("pid", "rid")
    assert(sql.count() > 100)
    assert(sql.exceptAll(brute).isEmpty && brute.exceptAll(sql).isEmpty)
  }

  test("flipped spellings (>, >=) and <= bounds match brute force") {
    ivA.createOrReplaceTempView("ext_a")
    ivB.createOrReplaceTempView("ext_b")
    val sql = spark.sql(
      """SELECT a.ida, b.idb FROM ext_a a JOIN ext_b b
        |  ON a.chrom = b.chrom2 AND b.end2 >= a.start AND a.`end` > b.start2
        |""".stripMargin)
    assertRewritten(sql)
    val brute = ivA.crossJoin(ivB)
      .filter(col("chrom") === col("chrom2") &&
        col("end2") >= col("start") && col("end") > col("start2"))
      .select("ida", "idb")
    assert(sql.exceptAll(brute).isEmpty && brute.exceptAll(sql).isEmpty)
  }

  test("band-join spelling (a.x - b.x bounded both ways) rewrites and " +
    "matches brute force") {
    val ta = spark.range(0, 900)
      .select(col("id").as("ida"), ((col("id") * 61) % 5000).as("x"))
    val tb = spark.range(0, 700)
      .select(col("id").as("idb"), ((col("id") * 83) % 5000).as("y"))
    ta.createOrReplaceTempView("ext_ta")
    tb.createOrReplaceTempView("ext_tb")
    // |x - y| <= 25 written as two cross-side differences
    val sql = spark.sql(
      """SELECT a.ida, b.idb FROM ext_ta a JOIN ext_tb b
        |  ON a.x - b.y <= 25 AND b.y - a.x <= 25""".stripMargin)
    assertRewritten(sql)
    val brute = ta.crossJoin(tb)
      .filter(abs(col("x") - col("y")) <= 25)
      .select("ida", "idb")
    assert(sql.count() > 100)
    assert(sql.exceptAll(brute).isEmpty && brute.exceptAll(sql).isEmpty)
  }

  test("hinted joins and non-inner joins are left to Spark") {
    val hinted = ivA.join(broadcast(ivB),
      col("chrom") === col("chrom2") &&
        col("start") < col("end2") && col("start2") < col("end"))
    assert(!planOf(hinted).contains("Generate explode"),
      "broadcast-hinted join must not be rewritten")
    ivA.createOrReplaceTempView("ext_a")
    ivB.createOrReplaceTempView("ext_b")
    val left = spark.sql(
      """SELECT a.ida, b.idb FROM ext_a a LEFT JOIN ext_b b
        |  ON a.chrom = b.chrom2 AND a.start < b.end2 AND b.start2 < a.`end`
        |""".stripMargin)
    assert(!planOf(left).contains("Generate explode"),
      "outer join must not be rewritten")
  }

  test("kill switch disables the rewrite") {
    spark.conf.set(IntervalJoinRewrite.EnabledKey, "false")
    try {
      ivA.createOrReplaceTempView("ext_a")
      ivB.createOrReplaceTempView("ext_b")
      val sql = spark.sql(
        """SELECT a.ida, b.idb FROM ext_a a JOIN ext_b b
          |  ON a.chrom = b.chrom2 AND a.start < b.end2 AND b.start2 < a.`end`
          |""".stripMargin)
      assert(!planOf(sql).contains("Generate explode"))
    } finally spark.conf.set(IntervalJoinRewrite.EnabledKey, "true")
  }

  test("zero-length points participate exactly as the predicate says") {
    // a point [p, p) AT the interval's start coordinate fails strict <
    // (start2 < end needs 90 < 90), but p in [lo, hi) must match under
    // the point-in-interval spelling
    val pt = Seq((1L, "c0", 90L, 90L)).toDF("ida", "chrom", "start", "end")
      .unionByName(ivA.limit(0))
    val rng = Seq((7L, "c0", 90L, 120L)).toDF("idb", "chrom2", "start2", "end2")
    pt.createOrReplaceTempView("ext_pt")
    rng.createOrReplaceTempView("ext_rng2")
    val strict = spark.sql(
      """SELECT a.ida, b.idb FROM ext_pt a JOIN ext_rng2 b
        |  ON a.chrom = b.chrom2 AND a.start < b.end2 AND b.start2 < a.`end`
        |""".stripMargin)
    assert(strict.count() == 0, "strict predicate excludes the empty interval")
    val pin = spark.sql(
      """SELECT a.ida, b.idb FROM ext_pt a JOIN ext_rng2 b
        |  ON a.chrom = b.chrom2 AND b.start2 <= a.start AND a.start < b.end2
        |""".stripMargin)
    assert(pin.count() == 1, "point-in-interval must match")
  }

  test("SQL functions: vec_* resolve to the native kernels") {
    val r = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "vec_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c, " +
        "vec_sqdist(array(0.0d, 0.0d), array(3.0d, 4.0d)) AS s").head()
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 1.0 &&
      r.getDouble(2) == 25.0)
    val n = spark.sql(
      "SELECT vec_l2_normalize(array(3.0d, 4.0d)) AS v").head()
      .getSeq[Double](0)
    assert(n.zip(Seq(0.6, 0.8)).forall { case (a, b) =>
      math.abs(a - b) < 1e-15 })
    // bucket function agrees with the Column-API expression on real data
    val df = Seq((1L, Array(0.5f, -1.5f, 2.0f))).toDF("id", "v")
    df.createOrReplaceTempView("ext_vec")
    val sqlB = spark.sql("SELECT vec_lsh_bucket(v, 6) AS b FROM ext_vec")
      .head().getLong(0)
    val colB = df.select(graft.ann.Ann.lshBucket(col("v"), 6)).head().getLong(0)
    assert(sqlB == colB)
    assert(spark.sql("SELECT unicode_normalize('cafe\u0301', 'NFC') AS s")
      .head().getString(0) == "caf\u00e9")
    // arity / literal contract errors surface at analysis, not runtime
    intercept[Exception] {
      spark.sql("SELECT vec_dot(array(1.0d))").collect()
    }
  }

  test("SQL functions: z_value / hdr_bucket match the Column API") {
    import spark.implicits._
    val df = Seq((5L, 9L, 1234L), (0L, 0L, 0L), (100L, 3L, 99999L))
      .toDF("a", "b", "v")
    df.createOrReplaceTempView("ext_zv")
    val sqlRows = spark.sql(
      "SELECT z_value(a, b, 21) AS z, hdr_bucket(v, 4) AS k FROM ext_zv")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val colRows = df.select(
        graft.ops.Layout.zValue(Seq(col("a"), col("b")), 21).as("z"),
        graft.text.Hdr.bucketize(col("v"), 4).as("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sqlRows.toSeq == colRows.toSeq)
    // 3-lane variadic form resolves too
    assert(spark.sql("SELECT z_value(1L, 2L, 3L, 10) AS z FROM ext_zv")
      .head().getLong(0) ==
      df.limit(1).select(graft.ops.Layout.zValue(
        Seq(lit(1L), lit(2L), lit(3L)), 10)).head().getLong(0))
    // bits must be a literal
    intercept[Exception] {
      spark.sql("SELECT z_value(a, b, cast(a AS int)) FROM ext_zv")
        .collect()
    }
  }
}
