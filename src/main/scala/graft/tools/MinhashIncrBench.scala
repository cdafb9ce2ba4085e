package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Split build/probe timing for the persisted minhash-band index:
  * `runMain graft.tools.MinhashIncrBench <sfDir> [reps]`.
  *
  * The dedup_minhash_incr GATE builds its index inside the gate call
  * (hermetic by design since r11), so its wall clock is
  * construction-dominated and conflates the two numbers a production
  * ingest pipeline actually sees: the ONE-TIME cold index build over
  * the corpus, and the PER-BATCH probe+append against the already-
  * persisted index. This tool measures them separately on the gate's
  * own split (`doc_id % 3 != 0` = corpus, `% 3 == 0` = ingest batch)
  * with the gate's LSH parameters, reporting min-of-reps for the probe
  * (the steady-state number) and the single cold build. The probe's
  * pair count and an order-free signature are printed so reps are
  * visibly computing the same relation. */
object MinhashIncrBench {
  private def sink(df: DataFrame): (Long, Long) = graft.core.Sig.sink(df)

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.core.Scratch.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.dedup.Dedup

    val all = spark.read.parquet(s"$dir/documents.parquet")
    val corpus = all.filter(col("doc_id") % 3 =!= 0)
    val batch = all.filter(col("doc_id") % 3 === 0)
    val base = graft.core.Scratch.dir
      .getOrElse(System.getProperty("java.io.tmpdir"))
    val run = java.util.UUID.randomUUID().toString.replace("-", "")
    val tbl = s"graft_mhb_$run"

    val tBuild0 = System.nanoTime()
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", tbl,
      s"$base/mhb-$run", numBuckets = 8)
    val buildSec = (System.nanoTime() - tBuild0) / 1e9

    var probeSec = Double.MaxValue
    var rows = 0L
    var sig = 0L
    for (_ <- 1 to reps) {
      val t0 = System.nanoTime()
      // the WithRelease variant + release after consumption: the
      // production per-batch path frees its probe caches after every
      // onPairs, so the steady-state number must be measured the same
      // way (the no-release wrapper would pin two cache entries + a
      // checkpoint RDD per rep and degrade later reps)
      val (pairs, release) = Dedup.incrementalMinhashPairsWithRelease(
        batch, all, tbl, "doc_id", "text", n = 3, numHashes = 48,
        bands = 16, threshold = 0.6)
      val (n, s) = try sink(pairs) finally release()
      probeSec = math.min(probeSec, (System.nanoTime() - t0) / 1e9)
      rows = n; sig = s
    }

    val nCorpus = corpus.count()
    val nBatch = batch.count()
    println(f"""{"sf":"${dir.split('/').last}","n_corpus":$nCorpus,""" +
      f""""n_batch":$nBatch,"build_sec":$buildSec%.1f,""" +
      f""""probe_sec":$probeSec%.2f,"pairs":$rows,""" +
      f""""sig":"${sig.toHexString}","reps":$reps}""")

    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(s"$base/mhb-$run"))
    spark.stop()
  }
}
