package graft.mm

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines.
  *
  * Media ride as opaque `binary` columns with typed metadata structs; the
  * Spark-side concerns — schema, batch shape, partition sizing, the
  * mapPartitions decode boundary — are real and tested. PNG/JPEG payloads
  * decode for REAL through the pure-JVM `javax.imageio` codec
  * ([[imageDecode]]: true dimensions + a deterministic 2x2-grid mean-RGB
  * feature; corrupt payloads yield null metadata instead of failing the
  * task). Audio/video codecs are NOT available in this environment, so
  * other mimes fall back to [[fakeDecode]]'s deterministic byte-stat
  * stand-in; a real deployment swaps that one function for a JNI/c-lib
  * decoder with the same signature (the plan shape is unchanged).
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

  /** Mimes routed through the real [[imageDecode]] codec. */
  private val ImageMimes = Set("image/png", "image/jpeg", "image/gif",
    "image/bmp")

  /** REAL image decode (pure JVM, `javax.imageio` — no native deps):
    * returns `(width, height, feature)` with the true pixel dimensions
    * and a deterministic 12-dim feature — mean R,G,B over a 2x2 spatial
    * grid, normalized to [0,1] (fixed scan order, double accumulation).
    * `None` for corrupt/undecodable payloads — a poisoned row must
    * surface as null metadata, never fail a 100k-row task. */
  def imageDecode(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    if (bytes == null || bytes.length == 0) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val sums = new Array[Double](12)
        val counts = new Array[Long](4)
        var y = 0
        while (y < h) {
          val gy = if (y * 2 >= h) 1 else 0
          var x = 0
          while (x < w) {
            val gx = if (x * 2 >= w) 1 else 0
            val cell = gy * 2 + gx
            val rgb = img.getRGB(x, y)
            sums(cell * 3) += (rgb >> 16) & 0xff
            sums(cell * 3 + 1) += (rgb >> 8) & 0xff
            sums(cell * 3 + 2) += rgb & 0xff
            counts(cell) += 1
            x += 1
          }
          y += 1
        }
        val feat = new Array[Float](12)
        var i = 0
        while (i < 12) {
          val c = counts(i / 3)
          feat(i) = if (c == 0) 0f else (sums(i) / (255.0 * c)).toFloat
          i += 1
        }
        Some((w, h, feat))
      }
    } catch { case _: Exception => None }
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
        val mime = r.getString(2)
        val nb = if (bytes == null) 0L else bytes.length.toLong
        if (ImageMimes.contains(mime)) imageDecode(bytes) match {
          case Some((w, h, feat)) =>
            Row(r.getLong(0), mime, nb, w, h, 1, feat.toSeq)
          case None => // corrupt/undecodable: null metadata, row survives
            Row(r.getLong(0), mime, nb, null, null, null, null)
        } else {
          val (w, h, fr, feat) = fakeDecode(bytes)
          Row(r.getLong(0), mime, nb, w, h, fr, feat.toSeq)
        }
      }
    }(Encoders.row(decodedSchema))
  }

  /** Deterministic PNG test fixture, generated ON THE EXECUTORS (no
    * driver collect): one `(4 + id % 13) x (3 + id*5 % 11)` image per
    * input row, solid-filled with an id-derived RGB, encoded through the
    * real `javax.imageio` PNG writer. Exists so [[decode]]'s image path
    * can be gated end-to-end (encode -> decode round trip recovers the
    * planted dimensions and fill color) without image files in the
    * testdata. */
  def syntheticPng(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val (w, h) = plantedDims(id)
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val rgb = plantedRgb(id)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          Row(id, bos.toByteArray, "image/png")
        }
      }(Encoders.row(mediaSchema))

  /** The fixture's planted dimensions, shared with oracle arithmetic. */
  def plantedDims(id: Long): (Int, Int) =
    (4 + (id % 13).toInt, 3 + ((id * 5) % 11).toInt)

  /** The fixture's planted fill color (packed 0xRRGGBB). */
  def plantedRgb(id: Long): Int =
    (((id * 37) % 256).toInt << 16) | (((id * 59) % 256).toInt << 8) |
      ((id * 83) % 256).toInt

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
