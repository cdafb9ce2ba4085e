package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.util.concurrent.{FutureTask, TimeUnit, TimeoutException}
import java.util.concurrent.atomic.AtomicBoolean
import scala.collection.mutable

/** Benchmark main. Prints one JSON line per completed query
  * (`"metric":"query"`) and a final `"metric":"total"` line the driver
  * parses. Robustness contract (the r5 artifact was forfeited to an
  * environment slow phase, rc=124 with zero output):
  *
  *   - every per-query result is streamed to stdout the moment it
  *     completes, so a killed run still leaves per-query data;
  *   - a JVM shutdown hook emits the final total line (flagged
  *     `"partial":true`) if the process is SIGTERM'd before the suite
  *     finishes — `timeout(1)` sends SIGTERM, which runs hooks;
  *   - each query rep runs under a wall budget in its own thread and is
  *     cancelled via job-group interrupt past it (skip-and-flag, never
  *     hang the suite on one degraded query);
  *   - a canary (fixed 1-second-class query) is timed at start and end
  *     and recorded in the artifact, so a degraded VM phase is visible
  *     in the numbers rather than inferred from them.
  */
object Bench {
  private def now(): Long = System.nanoTime()

  /** Run `body` on a daemon thread under `budgetSec`; cancel its Spark
    * jobs and return Left on timeout. Job group is set inside the
    * worker thread (setJobGroup is thread-local).
    */
  private def withBudget[A](spark: SparkSession, tag: String, budgetSec: Int)(
      body: => A): Either[String, A] = {
    val task = new FutureTask[A](() => {
      spark.sparkContext.setJobGroup(s"bench-$tag", tag, interruptOnCancel = true)
      try body finally spark.sparkContext.clearJobGroup()
    })
    val t = new Thread(task, s"bench-$tag"); t.setDaemon(true); t.start()
    try Right(task.get(budgetSec.toLong, TimeUnit.SECONDS))
    catch {
      case _: TimeoutException =>
        spark.sparkContext.cancelJobGroup(s"bench-$tag")
        // Wait for the cancelled query to actually die: cancellation is
        // async, and a still-running zombie competes for every core and
        // poisons all subsequent timings (measured 10-20x on the queries
        // after a timed-out one). 10s cap: during a VM stall phase the
        // worker can sit in uninterruptible munmap for far longer, and
        // burning suite wall waiting on it costs more than the zombie does.
        t.join(10000L)
        if (t.isAlive) System.err.println(s"[bench] $tag zombie survived cancel")
        Left("timeout")
      case e: Throwable =>
        Left(Option(e.getCause).getOrElse(e).getMessage match {
          case null => e.getClass.getSimpleName
          case m    => m.takeWhile(_ != '\n').take(160)
        })
    }
  }

  /** Non-prunable sink: checksum every output column so Catalyst can't
    * drop projection-only work (a bare count() lets it prune the whole
    * select list down to a parquet row count). bit_xor, not sum: a sum
    * of 64-bit hashes overflows under ANSI mode.
    */
  /** (row count, order-free content signature). The signature is the
    * bit_xor of the per-row xxhash64 — printed per query so a
    * correctness-vs-environment dispute (the r11 driver-red rows) can
    * be adjudicated from the artifacts: same rows+sig across runs means
    * the VALUES were identical and any red gate is environmental. */
  private def sink(df: DataFrame): (Long, Long) = graft.core.Sig.sink(df)

  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** Build the final artifact lines: (sidecar line with FULL maps,
    * stdout line honoring the ≤1700-char contract).
    *
    * Pure and exposed for BenchEmitSpec — the r13 driver artifact was
    * lost to this logic: the old fallback loop only shrank `queries`
    * while serializing `skipped` unbounded, so a 102-skip run (the map
    * alone ~3.5 kB) discarded all 72 MEASURED values and still blew the
    * driver's 2000-char tail window (VERDICT r13 #2). Preference order
    * now: full maps → collapse `skipped` to reason-counts → only then
    * collapse the fastest measured queries into `agg_fast`. `total`,
    * `fast_tail` and `n_queries` cover `measured` only; `pinned` gates
    * (measured at a pinned smaller SF) are reported separately so the
    * sf-tagged total stays round-over-round comparable (ADVICE r13).
    */
  def buildFinalLines(measured: Seq[(String, Double)],
                      pinned: Seq[(String, Double)],
                      skipped: Seq[(String, String)],
                      metaTail: String): (String, String) = {
    def r1(v: Double): String = (math.rint(v * 10) / 10).toString
    val total = measured.map(_._2).sum
    val skFull = skipped.map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val skCounts = skipped.map(_._2).groupBy(v => v.takeWhile(_ != ':'))
      .toSeq.sortBy(_._1)
      .map { case (r, vs) => jstr(r) + ":" + vs.size }
      .mkString("{", ",", "}")
    val pinnedJson = pinned.sortBy(_._1)
      .map { case (k, v) => jstr(k) + ":" + r1(v) }.mkString("{", ",", "}")
    // Fast-tail summary: mean/p50 of everything OUTSIDE the slowest
    // decile. The suite's round-over-round noise lives in a handful
    // of storm-struck heavies; the fast tail is the stable signal a
    // reviewer can compare across rounds at a glance without
    // re-deriving it from 150 per-query values.
    val fastTail = {
      val vs = measured.map(_._2).sorted
      val keep = vs.take(math.max(1, (vs.size * 9) / 10))
      if (keep.isEmpty) """"fast_tail":null"""
      else {
        def r2(v: Double): String = (math.rint(v * 100) / 100).toString
        s""""fast_tail":{"n":${keep.size},"mean_sec":${r2(
          keep.sum / keep.size)},"p50_sec":${r2(keep(keep.size / 2))}}"""
      }
    }
    def line(qs: String, sk: String): String =
      s"""{"metric":"total","value":${r1(total)},"unit":"sec","queries":$qs,"skipped":$sk,"pinned":$pinnedJson,"n_queries":${measured.size},$fastTail,$metaTail}"""
    val bySlow = measured.sortBy(-_._2)
    def qsFor(keep: Int): String = {
      val kept = bySlow.take(keep)
      val rest = bySlow.drop(keep)
      val entries = kept.sortBy(_._1)
        .map { case (k, v) => jstr(k) + ":" + r1(v) }
      // "sidecar" names the committed artifact whose full line carries
      // EVERY per-query value individually — the collapsed queries are
      // measured, not dropped (VERDICT r15 #5: the PERF differ labeled
      // 33 agg'd improvements "dropped_from_bench")
      val agg = if (rest.isEmpty) Nil else {
        val vs = rest.map(_._2)
        List(s""""agg_fast":{"n":${vs.size},"sum_sec":${r1(vs.sum)},"max_sec":${r1(vs.max)},"sidecar":"bench_result.json"}""")
      }
      (entries ++ agg).mkString("{", ",", "}")
    }
    val fullLine = line(qsFor(measured.size), skFull)
    val out = (Iterator(fullLine) ++
        (measured.size to 0 by -1).iterator.map(k => line(qsFor(k), skCounts)))
      .find(_.length <= 1700)
      .getOrElse(line("{}", """{"overflow":true}"""))
    (fullLine, out)
  }

  /** Pass-1 suite order: the alphabetical list rotated left by
    * `key mod size` positions. Pure and exposed for BenchEmitSpec.
    *
    * WHY (VERDICT r14 #1): the driver's bench window is routinely
    * weather-truncated (r13 measured 72 queries, r14 measured 83), and
    * a FIXED alphabetical order means every truncated run measures the
    * same prefix — the `q1_*`/`seq_*`/`txt_*`/`util_*` tail had no
    * driver-side number for three rounds straight. Rotating the start
    * position by a per-run key makes consecutive partial runs TILE the
    * suite instead of starving the same tail. The key advances by 101
    * positions per epoch hour (driver rounds are hours apart; 101 is
    * coprime with any realistic suite size, so successive runs start
    * far apart — e.g. 175 queries / 6h between rounds = 606 mod 175 =
    * 81 positions). Later passes are unaffected: they already order
    * unmeasured-first, then slowest-first.
    */
  def rotated[A](xs: Seq[A], key: Long): Seq[A] =
    if (xs.isEmpty) xs
    else {
      val shift = (((key % xs.size) + xs.size) % xs.size).toInt
      xs.drop(shift) ++ xs.take(shift)
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.Scratch.tune(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.extensions", "graft.plans.GraftExtensions")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val queryBudget = sys.env.getOrElse("SPARK_GRAFT_QUERY_BUDGET", "90").toInt
    // Self-imposed wall ceiling, chosen below the driver's own kill
    // timeout (r5 died at rc=124 with nothing emitted): past it we flag
    // remaining queries as skipped and still print a valid total line.
    val totalBudget = sys.env.getOrElse("SPARK_GRAFT_TOTAL_BUDGET", "1100").toInt
    // Past this first-rep time a second rep buys noise reduction we can't
    // afford; record the single rep instead.
    val rep2Cutoff = sys.env.getOrElse("SPARK_GRAFT_REP2_CUTOFF", "20").toDouble
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    var effReps = reps // dropped to 1 when the start canary flags a deep phase

    val results = mutable.LinkedHashMap[String, Double]()
    val skipped = mutable.LinkedHashMap[String, String]()
    val resultsSmall = mutable.LinkedHashMap[String, Double]()
    var canaryStart = -1.0
    var canaryEnd = -1.0
    val suiteT0 = now()
    val emitted = new AtomicBoolean(false)

    // Heavyweight end-to-end gates measure multi-index ORCHESTRATION
    // (batches x indexes x per-batch actions), not an operator: at the
    // suite SF they dominate the total (r12: evt_ingest_e2e was 76s of
    // a 529s sf0.1 bench). Pin their bench-side data shape to the
    // sf0.01 twin when one exists so the suite total keeps measuring
    // operators; the per-query line is tagged with the PINNED shape.
    // Correctness is untouched — Verify still gates them at the
    // driver's SF. Defined here (not at the pass loop) because
    // emitFinal needs the set: pinned measurements are excluded from
    // the sf-tagged total and reported under their own "pinned" key
    // (ADVICE r13: summing a pinned-sf0.01 time into a total tagged
    // sf=sf0.1 made round-over-round totals incomparable).
    val e2ePinSmall = Set("evt_ingest_e2e")
    val pinDir = sfDir.replace("sf0.1", "sf0.01")
    val pinOk = pinDir != sfDir && new java.io.File(pinDir).isDirectory

    // Pass-1 rotation key (see `rotated`). Env override pins it for
    // reproducible local runs; 0 restores the legacy alphabetical order.
    val rotKey = sys.env.get("SPARK_GRAFT_BENCH_ROT").map(_.toLong)
      .getOrElse(System.currentTimeMillis() / 3600000L * 101L)

    // The one line the driver parses. Also invoked from the shutdown
    // hook, so it must never touch Spark (the context may be dying).
    //
    // HARD LENGTH CONTRACT (r6 lesson): the driver keeps only the LAST
    // 2000 chars of stdout and parses the final line out of that tail —
    // r6's total line was ~2500 chars (83 queries at ns precision), so it
    // arrived front-truncated and parsed:null. The final line must fit in
    // the tail WITH slack for a preceding fragment, so it is built to
    // ≤1700 chars: values at 0.1s precision, and if the full per-query
    // map still overflows, the fastest queries collapse into one
    // "agg_fast" summary (n/sum/max) while the slowest keep their own
    // entries — the slow ones are what gets read against the baseline.
    // Everything verbose (full-precision per-query, sf0.01 pairs) is
    // already streamed as its own "metric":"query" line the moment it
    // completes, before this line.
    def emitFinal(partial: Boolean): Unit = if (emitted.compareAndSet(false, true)) {
      def r1(v: Double): String = (math.rint(v * 10) / 10).toString
      // Pinned e2e gates were measured at the pinned sf0.01 shape: keep
      // them OUT of the sf-tagged total / fast-tail / n_queries and
      // report them under their own "pinned" key so the headline total
      // stays comparable across rounds (ADVICE r13, medium).
      val (pinnedRes, measured) = results.toSeq.partition { case (k, _) =>
        e2ePinSmall.contains(k) && pinOk }
      val wall = (now() - suiteT0) / 1e9
      val sfTag = sfDir.split('/').lastOption.getOrElse(sfDir)
      val smallTotal =
        if (resultsSmall.isEmpty) "null" else r1(resultsSmall.values.sum)
      val metaTail =
        s""""sf":${jstr(sfTag)},"partial":$partial,"canary_start_sec":${r1(canaryStart)},"canary_end_sec":${r1(canaryEnd)},"wall_sec":${r1(wall)},"reps":$effReps,"rot":$rotKey,"sf001_total_sec":$smallTotal"""
      val (fullLine, out) =
        Bench.buildFinalLines(measured, pinnedRes, skipped.toSeq, metaTail)
      // r12's driver artifact arrived parsed:null — a TorrentBroadcast
      // cleanup stack (another thread, stderr) spliced into the merged
      // stream mid-line. Defense in depth: persist a sidecar copy FIRST
      // (survives any stream tear, and has NO length contract — it always
      // carries the full per-query and full skipped maps), flush stderr so
      // buffered log lines land before ours, then emit the JSON as the
      // final stdout line.
      try java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_result.json"),
        (fullLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case _: Throwable => () }
      System.err.flush()
      println(out)
      System.out.flush()
    }
    val hook = new Thread(() => emitFinal(partial = true), "bench-emit-hook")
    Runtime.getRuntime.addShutdownHook(hook)

    // Canary: fixed-size MULTI-JOB probe (persist + count + agg), ~1 s
    // healthy. Its time in the artifact distinguishes "engine regressed"
    // from "VM is in a slow phase" without a rerun. Multi-job because the
    // documented slow phase hits persist/collect-heavy queries while
    // single-stage scans stay fast — a plain range scan reads healthy
    // right through it.
    def canary(): Double = {
      val t0 = now()
      withBudget(spark, "canary", queryBudget) {
        val d = spark.range(50L * 1000 * 1000)
          .select(xxhash64(col("id")).as("h"))
        d.persist()
        // bit_xor, not sum: summing 50M uniform 64-bit hashes overflows
        // under ANSI mode and aborts the agg job (errors swallowed by
        // withBudget), so the canary would only time persist+count.
        try { d.count(); d.agg(bit_xor(col("h"))).head() }
        finally d.unpersist(blocking = false)
      }
      (now() - t0) / 1e9
    }
    canaryStart = canary()
    System.err.println(f"[bench] canary $canaryStart%.2fs")
    // Deep throttle phase (healthy canary ~1-3s incl. cold JIT): before
    // committing to a degraded 1-rep run, wait out the storm — the VM's
    // stall phases last minutes, so a bounded sleep-and-retry (3x60s)
    // often buys a healthy full-rep run for 1-3 min of wall (the healthy
    // suite is ~100-200s, so the budget absorbs it). Only if the canary
    // stays degraded after the retries do we drop to 1 rep.
    var canaryWaits = 0
    while (canaryStart > 15.0 && canaryWaits < 3) {
      canaryWaits += 1
      System.err.println(s"[bench] canary degraded; waiting 60s (retry $canaryWaits/3)")
      Thread.sleep(60000L)
      canaryStart = canary()
      System.err.println(f"[bench] canary retry $canaryStart%.2fs")
    }
    if (canaryStart > 15.0) {
      System.err.println("[bench] degraded environment persists -> 1 rep")
      effReps = 1
    }

    // Untimed warmup: JIT, codegen, and parquet footer reads otherwise
    // land entirely on the alphabetically-first query (~8s of phantom
    // cost observed on a 0.3s query). Budgeted: a degraded VM must not
    // be able to burn the suite's wall clock on warmup.
    if (!sys.env.contains("SPARK_GRAFT_NO_WARMUP")) {
      withBudget(spark, "warmup", queryBudget) {
        Seq("lineitem", "orders", "customer", "documents", "embeddings")
          .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
        SparkEntry.queries.get("iv_merge").foreach(f => f(spark, sfDir).count())
      }.left.foreach(e => System.err.println(s"[bench] warmup failed: $e"))
    }

    def elapsed(): Double = (now() - suiteT0) / 1e9

    /** One measurement pass over the whole suite; min-merges into `out`
      * and streams a JSON line per completed query rep.
      *
      * Reps are organized as FULL-SUITE PASSES rather than back-to-back
      * reps of each query: the VM's stall phases (block-writeback + munmap
      * D-state storms) last minutes, so two adjacent reps share the same
      * weather and min() learns nothing — while the same query minutes
      * apart in different passes sees independent weather. Pass >1 budgets
      * adapt to the best known time (2x best + 5s), so a phase can burn at
      * most that much wall per already-measured query, not 90s. */
    // Storm mode: the VM's stall phases last minutes; hammering them with
    // 90s budgets burned the whole r6 wall budget inside pass 1 (four
    // timeout-cancels + zombie joins ~500s). Two consecutive timeouts or
    // >30s results flip the suite into a 25s-budget mode; three
    // consecutive sub-10s successes flip it back. Storm-skipped queries
    // are retried by the later passes / the rescue pass under (hopefully)
    // better weather.
    var stormSignals = 0
    var calmStreak = 0
    var storm = false

    def runPass(dir: String, sfTag: String, pass: Int, perQueryBudget: Int,
                out: mutable.LinkedHashMap[String, Double],
                only: Option[Set[String]] = None): Unit = {
      // Pass 1 runs the alphabetical order rotated by the per-run key
      // (see `rotated` — truncated driver runs tile the suite instead
      // of starving the same tail). Later passes run unmeasured queries
      // first, then slowest-first: when the total budget truncates a
      // pass (the suite keeps growing — 149 queries at r9), what gets
      // dropped is the second rep of the CHEAP tail, not whichever
      // queries sort last alphabetically.
      val wanted0 = SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (n, _) => args.isEmpty || args.contains(n) }
        .filter { case (n, _) => only.forall(_.contains(n)) }
        // a pinned gate already ran at the sf0.01 shape in the main
        // pass — re-measuring it in the scale-pair pass would record a
        // meaningless sf0.01-vs-sf0.01 pair and burn budget
        .filter { case (n, _) =>
          !(e2ePinSmall.contains(n) && pinOk && dir == pinDir) }
      val wanted = if (pass <= 1) Bench.rotated(wanted0, rotKey)
        else wanted0.sortBy { case (n, _) =>
          out.get(n).fold(Double.NegativeInfinity)(-_) }
      for ((name, fn) <- wanted) {
        if (elapsed() > totalBudget) {
          if (!out.contains(name) && !skipped.contains(name))
            skipped(name) = s"total_budget:$sfTag"
        } else {
          val adaptive = out.get(name)
            .map(best => math.min(perQueryBudget, (best * 2 + 5).ceil.toInt))
            .getOrElse(perQueryBudget)
          val pinned = e2ePinSmall.contains(name) && pinOk && dir == sfDir
          // an unmeasured pinned e2e gate gets a 150s floor: its
          // orchestration cost (~50s calm, 90s+ in a stall phase) sits
          // right at the default budget, and a timeout skip loses the
          // measurement entirely — it runs once, outside the scale
          // pair, so the floor costs at most one query's slack
          val adaptive2 = if (pinned && !out.contains(name))
            math.max(adaptive, 150) else adaptive
          // unmeasured pinned gates are EXEMPT from the storm clamp:
          // r13 shipped with evt_ingest_e2e skipped in BOTH artifacts
          // because the 25s storm cap defeated the 150s floor exactly
          // when the floor was needed (VERDICT r13 #3 / ADVICE). One
          // gate, bounded cost: at most 150s once per suite.
          val budget =
            if (storm && !(pinned && !out.contains(name)))
              math.min(adaptive2, 25)
            else adaptive2
          val qdir = if (pinned) pinDir else dir
          val qsf = if (pinned) sfTag + "-pinned-sf0.01" else sfTag
          val t0 = now()
          withBudget(spark, s"$name-p$pass", budget)(sink(fn(spark, qdir))) match {
            case Right((n, sig)) =>
              val dt = (now() - t0) / 1e9
              if (dt > 30) { stormSignals += 1; calmStreak = 0 }
              else if (dt < 10) {
                calmStreak += 1; stormSignals = 0
                if (storm && calmStreak >= 3) {
                  storm = false
                  System.err.println("[bench] storm mode OFF")
                }
              }
              val best = out.get(name).fold(dt)(math.min(_, dt))
              out(name) = best
              skipped.remove(name)
              System.err.println(
                f"[bench] $qsf p$pass $name%-24s $dt%8.2fs  rows=$n sig=$sig%016x  best=$best%.2f")
              println(s"""{"metric":"query","query":${jstr(name)},"sf":${jstr(qsf)},"pass":$pass,"value":$best,"unit":"sec","rows":$n,"sig":${jstr(f"$sig%016x")}}""")
            case Left(e) =>
              stormSignals += 1; calmStreak = 0
              if (!storm && stormSignals >= 2) {
                storm = true
                System.err.println("[bench] storm mode ON (25s budgets)")
              }
              if (!out.contains(name)) {
                skipped(name) = s"$e:$qsf"
                System.err.println(s"[bench] p$pass $name SKIPPED ($e)")
                println(s"""{"metric":"query","query":${jstr(name)},"sf":${jstr(qsf)},"pass":$pass,"skipped":${jstr(e)}}""")
              } else
                System.err.println(s"[bench] p$pass $name rep failed ($e); keeping best")
          }
          // storage hygiene between timings: localCheckpoint blocks
          // (e.g. dedup_components) would otherwise stay pinned in
          // executor memory for the rest of the suite and show up as
          // multi-second pressure spikes in unrelated later queries.
          // clearCache additionally drops the operators' Barrier entries
          // (r15): every rep recomputes its barriers from the parquet
          // inputs — no cross-rep or cross-query reuse distorts a timing.
          if (!sys.env.contains("SPARK_GRAFT_NO_UNPERSIST")) {
            try spark.catalog.clearCache() catch { case _: Throwable => () }
            spark.sparkContext.getPersistentRDDs.values
              .foreach(_.unpersist(blocking = false))
          }
          System.out.flush()
        }
      }
    }

    runPass(sfDir, "main", 1, queryBudget, results)
    // Later passes re-measure only queries where a second rep can move
    // the number: sub-second queries' absolute noise is within the 0.1s
    // artifact precision, so their rep money goes to the slow ones.
    for (p <- 2 to effReps) {
      val worth = results.collect { case (n, b) if b > 1.0 => n }.toSet ++
        skipped.keySet
      if (worth.nonEmpty)
        runPass(sfDir, "main", p, queryBudget, results, only = Some(worth))
    }
    // Rescue pass: a query still slower than rep2Cutoff after all passes
    // (or skipped outright) was probably measured under a stall phase
    // every time it ran; one more try under fresh weather, wall
    // permitting. rep2Cutoff doubles as the "fast enough, leave it" bar.
    if (effReps >= 2 && elapsed() < totalBudget * 0.8) {
      val retry = results.collect {
        case (n, best) if best > rep2Cutoff => n }.toSet ++ skipped.keySet
      if (retry.nonEmpty) {
        System.err.println(s"[bench] rescue pass for ${retry.mkString(",")}")
        runPass(sfDir, "main", 3, queryBudget, results, only = Some(retry))
      }
    }

    // Scale pair (VERDICT r5 #6): a 10x-smaller per-query run in the
    // same artifact turns "would it survive 100x?" into a measured
    // scaling exponent. Only when the main pass finished healthy with
    // wall budget to spare.
    val smallDir = sfDir.replace("sf0.1", "sf0.01")
    // 0.85 (was 0.75, was 0.6 — raised each time the suite grew and
    // silently dropped the scale pair): a 99-query two-pass main suite
    // under mild weather runs ~850-900s, and the sf0.01 pass costs
    // ~100-150s against the shutdown hook's guarantee that a driver
    // kill still leaves a parseable artifact
    if (!sys.env.contains("SPARK_GRAFT_NO_SECOND_SF") && smallDir != sfDir &&
        new java.io.File(smallDir).isDirectory && skipped.isEmpty) {
      // Wall-tight fallback: rather than dropping the scale pair
      // entirely (it silently vanished twice as the suite grew), keep
      // at least the slowest-40 pairing — those are the queries the
      // scaling exponent is read from.
      if (elapsed() < totalBudget * 0.85)
        runPass(smallDir, "sf0.01", 1, queryBudget.min(30), resultsSmall)
      else if (elapsed() < totalBudget * 0.95) {
        val slowest = results.toSeq.sortBy(-_._2).take(40).map(_._1).toSet
        runPass(smallDir, "sf0.01", 1, queryBudget.min(30), resultsSmall,
          only = Some(slowest))
      }
    }

    canaryEnd = canary()
    System.err.println(f"[bench] canary-end $canaryEnd%.2fs")
    // stop Spark BEFORE the final emit: its executor/cleaner threads are
    // the source of the async log stacks that can land AFTER our line
    // and become the driver's "last line" (r12 parsed:null). The
    // shutdown hook stays installed until AFTER emitFinal — if stop()
    // hangs in a VM stall phase and the harness SIGTERMs us, the hook
    // still emits the partial artifact (the r5 failure mode); the
    // emitted-CAS makes double emission impossible.
    try spark.stop() catch { case _: Throwable => () }
    emitFinal(partial = false)
    try Runtime.getRuntime.removeShutdownHook(hook) catch { case _: Throwable => }
  }
}
