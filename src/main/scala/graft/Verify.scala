package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query names — run just those
    // (local iteration on one gate without paying the full 74-query dump).
    // A leading '-' inverts the set: "-a,b" runs everything EXCEPT a and b
    // (the sf1 gate dumps the bulk suite in one JVM, then the heavy
    // pair-family queries one at a time with deletion in between).
    val rawOnly = args.lift(2)
    val invert = rawOnly.exists(_.startsWith("-"))
    val only: Option[Set[String]] = rawOnly.map(s =>
      s.stripPrefix("-").split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def keep(name: String): Boolean =
      if (invert) !only.exists(_.contains(name))
      else only.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Output file count per query. 1 (the default, what the driver's gate
    // expects) serializes only the final write; >1 parallelizes the dump
    // for sf1-scale outputs where a single writer thread on a ~1e9-row
    // pair relation becomes the wall-clock (the DuckDB compare reads the
    // output via glob, so multi-file dirs gate identically).
    val outParts = sys.env.getOrElse("SPARK_GRAFT_OUT_PARTS", "1").toInt
    val spark = graft.core.Scratch.tune(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.extensions", "graft.plans.GraftExtensions")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // A wired query that errors before producing output must stay VISIBLE:
    // with no output dir the downstream compare silently omits it and the
    // artifact reads as all-green (the r6 events regression hid this way).
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (!keep(name)) ()
      else {
      val t0 = System.nanoTime()
      try {
        // repartition(1), NOT coalesce(1): coalesce removes the final
        // shuffle boundary, so the whole last stage (joins, windows)
        // collapses onto one thread; repartition keeps the query parallel
        // and only serializes the file write (measured 53s -> 2s on
        // iv_subtract_index at sf0.01)
        fn(spark, sfDir).repartition(outParts).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        System.err.println(
          f"[verify] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      } catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
          .linesIterator.take(3).mkString(" ").take(400)
        System.err.println(s"[verify] $name FAILED: ${errors(name)}")
        // Make the failure VISIBLE to the driver's outDir scan (r6
        // ADVICE: an erroring gate must surface in the artifact, not
        // vanish): a one-row relation with the error under a
        // __verify_error column can never rows/schema/hash-match any
        // oracle, so the compare records a FAILING entry instead of
        // omitting the query. Also clobbers any partial write.
        try {
          import org.apache.spark.sql.types.{StringType, StructField, StructType}
          spark.createDataFrame(
              java.util.Arrays.asList(
                org.apache.spark.sql.Row(s"$name: ${errors(name)}")),
              StructType(Seq(StructField("__verify_error", StringType))))
            .repartition(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case _: Throwable => () }
      }
      }
    }
    // signature/bucket dumps for the hash-based oracles go to a SIBLING
    // dir: the driver's gate scans outDir and must only see query results
    val auxDir = new java.io.File(outDir).getAbsolutePath + "__aux"
    // full runs dump every aux; a subset run dumps an aux only if its
    // name is listed too (e.g. `Verify sf out emb_semdedup,semdedup_assign`)
    SparkEntry.auxDumps.foreach { case (name, fn) =>
      if (keep(name))
      try fn(spark, sfDir).repartition(1).write.mode("overwrite")
        .parquet(s"$auxDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] aux $name failed: ${e.getMessage}")
      }
    }
    // measured LSH quality: recall of the bucketed ANN vs exact top-k
    if (rawOnly.isEmpty || invert) try {
      import org.apache.spark.sql.functions.col
      val emb = TestTables.table(spark, sfDir, "embeddings")
      val q = emb.filter(col("vec_id") % 100 === 0)
      val exact = graft.ann.Ann.bruteForceTopK(emb, q, 5)
        .select("query_id", "neighbor_id")
      val approx = graft.ann.Ann.lshTopK(emb, q, 5, 6)
        .select("query_id", "neighbor_id")
      val hit = exact.intersect(approx).count()
      val tot = exact.count()
      System.err.println(s"[verify] emb_ann_lsh recall@5 = $hit/$tot")
    } catch { case e: Throwable =>
      System.err.println(s"[verify] recall probe failed: ${e.getMessage}")
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // {AUX_DIR} marks oracles that read Verify's own signature/bucket
    // dumps (DuckDB cannot recompute xxhash64) — resolve it here so the
    // SQL the driver executes carries the real absolute path.
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("{AUX_DIR}", auxDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Wired-but-erroring manifest for the LOCAL gate (tools/check.py):
    // goes to the aux sibling so the driver's outDir scan never sees it.
    // n_wired lets the gate detect queries that vanished entirely.
    new java.io.File(auxDir).mkdirs()
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    val nWired = SparkEntry.queries.count { case (n, _) => keep(n) }
    Files.writeString(Paths.get(s"$auxDir/verify_errors.json"),
      s"""{"n_wired":$nWired,"errors":$errJson}""")
    if (errors.nonEmpty) {
      System.err.println(s"[verify] ${errors.size}/$nWired wired queries ERRORED: " +
        errors.keys.mkString(","))
    }
    spark.stop()
  }
}
