package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Split build/search timing for the IVF-shortlisted ADC path:
  * `runMain graft.tools.PqIvfBench <sfDir> [reps]`.
  *
  * Builds the PQ codebooks + coarse centroids + BOTH persisted layouts
  * once (plain codes for the exhaustive scan, centroid-bucketed
  * PQ-IVF codes for the pruned scan), then times ONLY the search
  * stage of each, reps times, reporting the min. Also reports recall:
  * the fraction of the exhaustive ADC top-k that the IVF shortlist
  * recovers. This isolates the number the per-gate timing can't show —
  * the emb_pq_ivf gate rebuilds its index per call, so its wall clock
  * is Lloyd-dominated and says nothing about whether probe pruning
  * pays at search time. */
object PqIvfBench {
  private def sink(df: DataFrame): Long =
    df.select(xxhash64(df.columns.map(col): _*).as("__h"))
      .agg(count(lit(1)).as("__n"), bit_xor(col("__h")))
      .head().getLong(0)

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

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val (k, kCents) = (5, 8)
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

    // recall/latency curve over nProbe: the pruning knob's tradeoff
    val exact = Ann.pqAdcTopK(codes, books, queries, k)
      .select(col("query_id"), col("neighbor_id")).persist()
    val nExact = exact.count()
    val curve = Seq(1, 2, 4).map { np =>
      val (sec, _) =
        timeMin(sink(Ann.pqIvfTopK(spark.table(s"pqivf_$run"), books,
          queries, cents, k, np)))
      val approx = Ann.pqIvfTopK(spark.table(s"pqivf_$run"), books,
          queries, cents, k, np)
        .select(col("query_id"), col("neighbor_id"))
      val nHit = exact.join(approx, Seq("query_id", "neighbor_id")).count()
      f"""{"n_probe":$np,"search_sec":$sec%.2f,""" +
        f""""recall":${nHit.toDouble / nExact}%.4f}"""
    }
    exact.unpersist()

    println(f"""{"sf":"${dir.split('/').last}","build_sec":$buildSec%.1f,""" +
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
