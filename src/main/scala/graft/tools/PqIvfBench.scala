package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Split build/search timing for the IVF-shortlisted ADC path:
  * `runMain graft.tools.PqIvfBench <sfDir> [reps] [kCents]`.
  *
  * Builds the PQ codebooks + coarse centroids + BOTH persisted layouts
  * once (plain codes for the exhaustive scan, centroid-bucketed
  * PQ-IVF codes for the pruned scan), then times ONLY the search
  * stage of each, reps times, reporting the min. Also reports recall:
  * the fraction of the exhaustive ADC top-k that the IVF shortlist
  * recovers. This isolates the number the per-gate timing can't show —
  * the emb_pq_ivf gate rebuilds its index per call, so its wall clock
  * is Lloyd-dominated and says nothing about whether probe pruning
  * pays at search time.
  *
  * Geometry: kCents defaults to round(sqrt(N)) — the standard IVF
  * list-count rule (per-query work minimized at ~sqrt(N) lists when
  * probe cost = nProbe*N/kCents + kCents centroid distances) — and
  * nProbe is swept in powers of two until recall vs the exhaustive ADC
  * scan passes 0.99 (or the probe set covers every list), so the
  * artifact records the whole recall-vs-wall knee rather than one
  * operating point.
  *
  * Corpus: a path reads `<dir>/embeddings.parquet`; the literal form
  * `synth:<n>x<dim>x<clusters>` instead generates a DETERMINISTIC
  * (fixed-seed) Gaussian-mixture corpus. The second form exists
  * because the fixture embeddings are isotropic random vectors
  * (measured within-label mean cosine ~= cross-label ~= 0), and on
  * isotropic data ANY inverted-file method's recall provably tracks
  * the probed fraction — cell membership carries no neighbor signal —
  * so the production operating point (high recall at a small probe
  * fraction) is a property the DATA has to permit. The mixture corpus
  * (unit centers, default sigma 0.06 — separable; sigma 0.35 serves as
  * the isotropic control) is the regime real text/image embeddings
  * live in, and is where the recall-at-fraction-of-wall claim is
  * demonstrated; the fixture run is kept in the artifact to document
  * the isotropic bound honestly. */
object PqIvfBench {
  private def sink(df: DataFrame): Long = graft.core.Sig.sink(df)._1

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.core.Scratch.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ann.Ann

    val emb =
      if (dir.startsWith("synth:")) {
        val parts = dir.stripPrefix("synth:").split('x')
        val Array(n, d, c) = parts.take(3).map(_.toInt)
        // per-dim noise sigma in thousandths (4th field, default 60):
        // the FULL noise norm is sigma*sqrt(d), so sigma must sit well
        // under (inter-center distance ~ sqrt(2)) / sqrt(d) for cluster
        // structure to exist at all — at d=64, sigma=0.06 gives noise
        // norm ~0.48 against ~1.41 center separation (separable), while
        // sigma=0.35 gives ~2.8 (pure isotropic noise, the fixture
        // regime)
        val sigma = (if (parts.length > 3) parts(3).toInt else 60) / 1000.0
        // fixed-seed Gaussian mixture: c unit-norm centers (driver,
        // c*d doubles — dimension-sized), points generated DISTRIBUTED:
        // only the centers broadcast, each row draws its noise from a
        // per-row deterministic RNG seeded by vec_id, so synth sizes in
        // the millions never materialize on the driver and the corpus
        // is identical under any partitioning
        val rnd = new scala.util.Random(42)
        def gauss(dim: Int): Array[Double] = Array.fill(dim)(rnd.nextGaussian())
        def unit(v: Array[Double]): Array[Double] = {
          val nm = math.sqrt(v.map(x => x * x).sum); v.map(_ / nm)
        }
        val centers = Array.fill(c)(unit(gauss(d)))
        val bc = spark.sparkContext.broadcast(centers)
        import spark.implicits._
        spark.range(n.toLong).as[Long]
          .mapPartitions { it =>
            val cs = bc.value
            it.map { i =>
              // splitmix64 finalizer over the row id (ADVICE r13): raw
              // affine seeds (42*1000003+i) are sequential, and
              // java.util.Random's setSeed scrambler mixes consecutive
              // seeds poorly — the first nextGaussian draws correlate
              // across adjacent vec_ids, subtly distorting the cluster
              // geometry. Note this CHANGES the synthetic fixture vs the
              // r13 artifact (recorded in BENCH_PQIVF_r14).
              var z = i + 0x9e3779b97f4a7c15L
              z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
              z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
              z = z ^ (z >>> 31)
              val r = new scala.util.Random(z)
              val lbl = (i % c).toInt
              val v = cs(lbl).map(cv => (cv + sigma * r.nextGaussian()).toFloat)
              (i, v, lbl)
            }
          }
          .toDF("vec_id", "embedding", "label")
          .repartition(cpus.toInt).persist()
      } else spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val k = 5
    val nVecs = emb.count()
    val kCents = if (args.length > 2) args(2).toInt
      else math.max(8, math.round(math.sqrt(nVecs.toDouble)).toInt)
    val base = graft.core.Scratch.dir
      .getOrElse(System.getProperty("java.io.tmpdir"))
    val run = java.util.UUID.randomUUID().toString.replace("-", "")

    val tBuild0 = System.nanoTime()
    val books = Ann.pqCodebooks(emb, m = 8, k = 16)
    val cents = Ann.ivfCentroids(emb, kCents)
    Ann.pqEncode(emb, books)
      .write.mode("overwrite").parquet(s"$base/pqb-$run/codes")
    Ann.writePqIvfIndex(emb, books, cents, s"pqivf_$run",
      s"$base/pqb-$run/idx", numBuckets = 8)
    val buildSec = (System.nanoTime() - tBuild0) / 1e9

    val codes = spark.read.parquet(s"$base/pqb-$run/codes")
    def timeMin(body: => Long): (Double, Long) = {
      var best = Double.MaxValue; var rows = 0L
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        rows = body
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, rows)
    }
    val (adcSec, _) =
      timeMin(sink(Ann.pqAdcTopK(codes, books, queries, k)))

    // recall/latency curve over nProbe: sweep powers of two up the
    // pruning knob until the recall knee (>= 0.99 vs exhaustive ADC)
    val exact = Ann.pqAdcTopK(codes, books, queries, k)
      .select(col("query_id"), col("neighbor_id")).persist()
    val nExact = exact.count()
    val probes = Iterator.iterate(1)(_ * 2)
      .takeWhile(_ < kCents).toSeq :+ kCents
    val curve = scala.collection.mutable.ArrayBuffer.empty[String]
    var knee = false
    for (np <- probes if !knee) {
      val (sec, _) =
        timeMin(sink(Ann.pqIvfTopK(spark.table(s"pqivf_$run"), books,
          queries, cents, k, np)))
      val approx = Ann.pqIvfTopK(spark.table(s"pqivf_$run"), books,
          queries, cents, k, np)
        .select(col("query_id"), col("neighbor_id"))
      val nHit = exact.join(approx, Seq("query_id", "neighbor_id")).count()
      val recall = nHit.toDouble / nExact
      curve += f"""{"n_probe":$np,"search_sec":$sec%.2f,""" +
        f""""recall":$recall%.4f}"""
      if (recall >= 0.99) knee = true
    }
    exact.unpersist()

    println(f"""{"sf":"${dir.split('/').last}","n_vecs":$nVecs,""" +
      f""""build_sec":$buildSec%.1f,""" +
      f""""search_adc_sec":$adcSec%.2f,""" +
      f""""ivf":[${curve.mkString(",")}],"reps":$reps,""" +
      f""""k":$k,"k_centroids":$kCents}""")

    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(s"$base/pqb-$run"))
    spark.stop()
  }
}
