package graft.mm

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines.
  *
  * Media ride as opaque `binary` columns with typed metadata structs; the
  * Spark-side concerns — schema, batch shape, partition sizing, the
  * mapPartitions decode boundary — are real and tested. The actual
  * image/audio codecs are NOT available in this environment, so
  * [[decodeStub]] derives deterministic fake features from the bytes; a
  * real deployment swaps `fakeDecode` for a JNI/c-lib decoder with the
  * same signature (the plan shape is unchanged).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("mime", StringType)))

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  /** Deterministic stand-in for a media decoder: metadata + an 8-dim
    * "feature" derived from byte statistics. Replace with a real codec. */
  def fakeDecode(bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val n = if (bytes == null) 0 else bytes.length
    val w = (n % 640) + 1
    val h = ((n * 7) % 480) + 1
    val frames = (n % 24) + 1
    val feat = new Array[Float](8)
    var i = 0
    while (i < n) { feat(i % 8) += (bytes(i) & 0xff) / 255.0f; i += 1 }
    (w, h, frames, feat)
  }

  /** Decode boundary: per-partition batch iteration (one decoder init per
    * partition, the pattern a JNI codec needs), preserving columnar
    * upstream/downstream plans.
    *
    * Partition sizing is derived from the optimizer's size estimate (exact
    * file bytes for scans, propagated estimates for derived plans) — NO
    * extra pass over the payload relation (an earlier `df.count()` here
    * was a full second scan whenever the input wasn't a bare file read).
    * Since payload bytes dominate row width, bytes-per-task is also the
    * right unit for bounding decoder memory. When the estimate is
    * unusable (unknown-stats plans default to Long.MaxValue-ish), fall
    * back to the cluster's default parallelism; pass `numPartitions` to
    * pin it explicitly. */
  def decode(media: DataFrame,
             targetBytesPerPartition: Long = 256L << 20,
             numPartitions: Option[Int] = None): DataFrame = {
    val df = media.select("media_id", "payload", "mime")
    val parts = numPartitions.getOrElse {
      val defaultPar = df.sparkSession.sparkContext.defaultParallelism
      val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
      if (est <= 0 || est >= BigInt(Long.MaxValue) / 4) defaultPar
      else {
        val byBytes = ((est + targetBytesPerPartition - 1) /
          targetBytesPerPartition).toInt
        math.min(math.max(defaultPar, byBytes), 1 << 18)
      }
    }
    df.repartition(parts).mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("payload")
        val (w, h, fr, feat) = fakeDecode(bytes)
        Row(r.getLong(0), r.getString(2),
          if (bytes == null) 0L else bytes.length.toLong, w, h, fr, feat.toSeq)
      }
    }(Encoders.row(decodedSchema))
  }

  /** Frame sampling plumbing: every `step`-th frame index per video row,
    * exploded — downstream per-frame decode hangs off (media_id, frame). */
  def sampleFrames(decoded: DataFrame, step: Int): DataFrame =
    decoded.select(col("media_id"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(step))).as("frame"))

  /** Resize plumbing (aspect-preserving fit into a `tw` x `th` box): the
    * dimension arithmetic is the real part — a codec swap keeps it and
    * replaces only the pixel work, which at this boundary is a payload
    * transform inside [[decode]]'s mapPartitions. */
  def resizeMeta(decoded: DataFrame, tw: Int, th: Int): DataFrame =
    decoded
      .withColumn("__scale", least(lit(tw.toDouble) / col("width"),
        lit(th.toDouble) / col("height")))
      .withColumn("out_width",
        greatest(lit(1L), floor(col("width") * col("__scale"))).cast("int"))
      .withColumn("out_height",
        greatest(lit(1L), floor(col("height") * col("__scale"))).cast("int"))
      .drop("__scale")

  /** Wrap a text/binary-ish table into the media schema (for tests and
    * for treating raw docs as payloads). */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
              mime: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("payload"), lit(mime).as("mime"))
}
