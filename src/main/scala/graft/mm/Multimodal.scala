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
  * task); RIFF/WAVE audio parses for real ([[wavDecode]]) and MP4 video
  * CONTAINERS parse for real ([[mp4Decode]]: ISO-BMFF box walk for
  * dimensions/frame-count/duration — pixel codecs are not available in
  * this environment, so the video feature stays null). Remaining mimes
  * fall back to [[fakeDecode]]'s deterministic byte-stat stand-in; a
  * real deployment swaps that one function for a JNI/c-lib decoder with
  * the same signature (the plan shape is unchanged).
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

  /** Partition-sizing shared by the decode boundaries: ensure at least
    * the bytes-derived partition count, WITHOUT shuffling the payload
    * relation when its incoming partitioning already satisfies it — a
    * well-split file scan (`files.maxPartitionBytes`) arrives correctly
    * sized, and an unconditional `repartition` there is a full network
    * copy of the payload bytes (at 100 TB of media, a 100 TB shuffle for
    * nothing). `numPartitions` is a parallelism FLOOR: the relation is
    * only reshuffled when it has fewer partitions than requested.
    *
    * The target count derives from the optimizer's size estimate (exact
    * file bytes for scans, propagated estimates for derived plans) — NO
    * extra pass over the payload relation. Since payload bytes dominate
    * row width, bytes-per-task is also the right unit for bounding
    * decoder memory. When the estimate is unusable (unknown-stats plans
    * default to Long.MaxValue-ish), fall back to the cluster's default
    * parallelism. */
  private def sizedForDecode(df: DataFrame, targetBytesPerPartition: Long,
                             numPartitions: Option[Int]): DataFrame = {
    val want = numPartitions.getOrElse {
      val defaultPar = df.sparkSession.sparkContext.defaultParallelism
      val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
      if (est <= 0 || est >= BigInt(Long.MaxValue) / 4) defaultPar
      else {
        val byBytes = ((est + targetBytesPerPartition - 1) /
          targetBytesPerPartition).toInt
        math.min(math.max(defaultPar, byBytes), 1 << 18)
      }
    }
    if (df.rdd.getNumPartitions >= want) df else df.repartition(want)
  }

  /** Decode boundary: per-partition batch iteration (one decoder init per
    * partition, the pattern a JNI codec needs), preserving columnar
    * upstream/downstream plans; partition sizing via [[sizedForDecode]]. */
  def decode(media: DataFrame,
             targetBytesPerPartition: Long = 256L << 20,
             numPartitions: Option[Int] = None): DataFrame = {
    val df = media.select("media_id", "payload", "mime")
    sizedForDecode(df, targetBytesPerPartition, numPartitions)
      .mapPartitions { rows =>
      rows.map { r =>
        // positional access: with the repartition elided, chained
        // mapPartitions can hand over schema-less rows (same contract
        // as resizeImages)
        val bytes = r.getAs[Array[Byte]](1)
        val mime = r.getString(2)
        val nb = if (bytes == null) 0L else bytes.length.toLong
        if (ImageMimes.contains(mime)) imageDecode(bytes) match {
          case Some((w, h, feat)) =>
            Row(r.getLong(0), mime, nb, w, h, 1, feat.toSeq)
          case None => // corrupt/undecodable: null metadata, row survives
            Row(r.getLong(0), mime, nb, null, null, null, null)
        } else if (Mp4Mimes.contains(mime)) mp4Decode(bytes) match {
          // container metadata is real; pixel features need codecs this
          // environment lacks -> feature null, n_frames REAL (sampleFrames
          // consumes it)
          case Some(m) =>
            Row(r.getLong(0), mime, nb, m.width, m.height, m.nFrames, null)
          case None =>
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

  /** Two-tone PNG fixture for the perceptual-hash gate: 64x64, dark
    * (0x202020) left of pixel column `8 * ((id % 7) + 1)`, light
    * (0xE0E0E0) right of it — the ONLY id-dependence is the split
    * position, so ids congruent mod 7 produce pixel-identical images
    * (same aHash by construction) while the 7 split positions give 7
    * distinct bit layouts. Generated on the executors like
    * [[syntheticPng]]. */
  def syntheticPngTwoTone(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val split = 8 * ((id % 7).toInt + 1)
          val img = new java.awt.image.BufferedImage(64, 64,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < 64) {
            var x = 0
            while (x < 64) {
              img.setRGB(x, y, if (x < split) 0x202020 else 0xE0E0E0)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          Row(id, bos.toByteArray, "image/png")
        }
      }(Encoders.row(mediaSchema))

  /** Average-hash (aHash) perceptual fingerprint — the classic
    * near-duplicate image signature: 8x8 grid of block-mean grays, bit
    * `by*8 + bx` set iff the block's mean exceeds the image's global
    * mean. All comparisons are EXACT cross-multiplied integer
    * arithmetic (`block_sum * n_total > total_sum * n_block` — no
    * float means to drift across JVMs); grayscale is integer luma
    * `(299r + 587g + 114b) / 1000`. Resolution-independent: block
    * `(bx, by)` covers pixel columns `[bx*w/8, (bx+1)*w/8)` (integer
    * bounds; an empty block on a <8px axis reads as not-above).
    * `None` for null/undecodable payloads. */
  def imageAHash(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null || bytes.length == 0) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) return None
      val (w, h) = (img.getWidth, img.getHeight)
      val sums = new Array[Long](64)
      val cnts = new Array[Long](64)
      var total = 0L
      var y = 0
      while (y < h) {
        val by = math.min(y * 8 / h, 7)
        var x = 0
        while (x < w) {
          val bx = math.min(x * 8 / w, 7)
          val rgb = img.getRGB(x, y)
          val gray = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
            114 * (rgb & 0xff)) / 1000
          val b = by * 8 + bx
          sums(b) += gray; cnts(b) += 1; total += gray
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h.toLong
      var hash = 0L
      var b = 0
      while (b < 64) {
        if (cnts(b) > 0 && sums(b) * n > total * cnts(b)) hash |= 1L << b
        b += 1
      }
      Some(hash)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Pixel-content duplicate groups by [[imageAHash]]: every media row
    * mapped to `(media_id, rep_id)` with `rep_id` the smallest media id
    * sharing its hash (undecodable payloads represent themselves).
    * Scale shape: one decode pass at the codec boundary
    * (`mapPartitions`, [[decode]]'s posture), one hash exchange on the
    * 64-bit signature for the min-aggregate, one join back — never a
    * pairwise compare. Near-dup variant: band the hash's four 16-bit
    * quarters and verify candidates by Hamming distance, exactly the
    * [[graft.dedup.Dedup.simhashPairs]] recipe on this column. */
  def phashGroups(media: DataFrame): DataFrame = {
    val hashSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("ahash", LongType, nullable = true)))
    val hashed = media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val h = imageAHash(r.getAs[Array[Byte]](1))
          Row(r.getLong(0), h.map(Long.box).orNull)
        }
      }(Encoders.row(hashSchema))
    val reps = hashed.filter(col("ahash").isNotNull)
      .groupBy(col("ahash")).agg(min(col("media_id")).as("rep_id"))
    hashed.join(reps, Seq("ahash"), "left")
      .select(col("media_id"),
        coalesce(col("rep_id"), col("media_id")).as("rep_id"))
  }

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

  /** REAL image resize at the decode boundary: payloads whose mime
    * routes through the image codec are decoded, aspect-fit into a
    * `tw x th` box with EXACTLY [[resizeMeta]]'s arithmetic
    * (`floor(dim * min(tw/w, th/h))`, floor 1 px), redrawn through
    * `java.awt.Graphics2D` and re-encoded as PNG on the executors.
    * Non-image mimes and corrupt/undecodable images pass through
    * byte-identical (poison stays visible downstream, never fails the
    * task). Output keeps [[mediaSchema]] — resized rows become
    * `image/png` — so a resized corpus feeds the same decode/probe
    * pipeline as the original. */
  def resizeImages(media: DataFrame, tw: Int, th: Int,
                   numPartitions: Option[Int] = None): DataFrame = {
    require(tw > 0 && th > 0)
    val df = media.select("media_id", "payload", "mime")
    // same floor semantic as [[sizedForDecode]]: never shuffle payload
    // bytes that already have the requested parallelism
    val base = numPartitions
      .filter(df.rdd.getNumPartitions < _)
      .map(df.repartition(_)).getOrElse(df)
    base.mapPartitions { rows =>
      rows.map { r =>
        // positional access: chained mapPartitions can elide the
        // serialization boundary and hand over schema-less rows
        val bytes = r.getAs[Array[Byte]](1)
        val mime = r.getString(2)
        val passthrough = Row(r.getLong(0), bytes, mime)
        if (!ImageMimes.contains(mime) || bytes == null || bytes.isEmpty)
          passthrough
        else
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            if (img == null) passthrough
            else {
              val scale = math.min(tw.toDouble / img.getWidth,
                th.toDouble / img.getHeight)
              val ow = math.max(1, math.floor(img.getWidth * scale).toInt)
              val oh = math.max(1, math.floor(img.getHeight * scale).toInt)
              val out = new java.awt.image.BufferedImage(ow, oh,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g2 = out.createGraphics()
              try g2.drawImage(img, 0, 0, ow, oh, null)
              finally g2.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              Row(r.getLong(0), bos.toByteArray, "image/png")
            }
          } catch { case _: Exception => passthrough }
      }
    }(Encoders.row(mediaSchema))
  }

  // ---------------------------------------------------------------- video

  val videoSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("duration_ms", LongType)))

  /** Decoded MP4/ISO-BMFF container metadata: presentation dimensions of
    * the first video track, its sample (frame) count, and the movie
    * duration. */
  final case class Mp4Meta(width: Int, height: Int, nFrames: Int,
                           durationMs: Long)

  /** Mimes routed through the real [[mp4Decode]] container parser. */
  private val Mp4Mimes = Set("video/mp4", "video/quicktime", "video/m4v")

  /** REAL video-container metadata decode — a pure-JVM walk of the
    * (public) ISO-BMFF box structure: top-level scan for `moov`, then
    * `mvhd` for timescale/duration, and per `trak` the `tkhd`
    * width/height (16.16 fixed point), `mdia/hdlr` handler type, and
    * `mdia/minf/stbl/stsz` sample count (`stts` entry sum as fallback).
    * The first track whose handler is `vide` wins. Handles 64-bit box
    * sizes and version-1 full boxes; a truncated/corrupt container —
    * or one with no video track — yields `None`, so a poisoned row
    * surfaces as null metadata rather than failing the task (same
    * contract as [[imageDecode]]/[[wavDecode]]). Pixel decode is out of
    * scope in this environment (no codecs); the container walk is what
    * makes `n_frames` REAL for [[sampleFrames]]. */
  /** (type, bodyStart, bodyEnd) of each ISO-BMFF box in `[from, to)` —
    * shared walker for [[mp4Decode]] and [[mp4FrameRanges]]. Handles
    * 64-bit sizes and to-end boxes; stops cleanly at truncation. */
  private def mp4Boxes(bytes: Array[Byte], bb: java.nio.ByteBuffer)(
      from: Int, to: Int): Seq[(String, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var off = from
    while (off + 8 <= to) {
      val size32 = bb.getInt(off).toLong & 0xffffffffL
      val tpe = new String(bytes, off + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      val (hdr, size) =
        if (size32 == 1L) {
          if (off + 16 > to) return out.toSeq
          (16, bb.getLong(off + 8))
        } else if (size32 == 0L) (8, (to - off).toLong) // box runs to end
        else (8, size32)
      if (size < hdr || off + size > to) return out.toSeq
      out += ((tpe, off + hdr, off + size.toInt))
      off += size.toInt
    }
    out.toSeq
  }

  private def mp4Find(bs: Seq[(String, Int, Int)],
                      t: String): Option[(Int, Int)] =
    bs.collectFirst { case (`t`, a, b) => (a, b) }

  def mp4Decode(bytes: Array[Byte]): Option[Mp4Meta] = {
    if (bytes == null || bytes.length < 16) return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    val boxes = mp4Boxes(bytes, bb) _
    val find = mp4Find _

    try {
      val top = boxes(0, bytes.length)
      val (moovA, moovB) = find(top, "moov").getOrElse(return None)
      val moov = boxes(moovA, moovB)
      // mvhd: movie timescale + duration (version 1 widens the times)
      val durMs = find(moov, "mvhd").flatMap { case (a, _) =>
        val v = bytes(a) & 0xff
        val (scale, dur) =
          if (v == 1) (bb.getInt(a + 20), bb.getLong(a + 24))
          else (bb.getInt(a + 12), bb.getInt(a + 16).toLong & 0xffffffffL)
        if (scale > 0) Some(dur * 1000L / scale) else None
      }.getOrElse(0L)
      // first trak whose mdia/hdlr handler is 'vide'
      moov.collect { case ("trak", a, b) => boxes(a, b) }
        .flatMap { trak =>
          for {
            (ta, _) <- find(trak, "tkhd")
            (ma, mb) <- find(trak, "mdia")
            mdia = boxes(ma, mb)
            (ha, _) <- find(mdia, "hdlr")
            if new String(bytes, ha + 8, 4,
              java.nio.charset.StandardCharsets.US_ASCII) == "vide"
          } yield {
            val v = bytes(ta) & 0xff
            val whOff = ta + (if (v == 1) 88 else 76)
            val w = bb.getInt(whOff) >>> 16 // 16.16 fixed -> integer part
            val h = bb.getInt(whOff + 4) >>> 16
            val frames = (for {
              (na, nb2) <- find(mdia, "minf")
              (sa, sb) <- find(boxes(na, nb2), "stbl")
              stbl = boxes(sa, sb)
              n <- find(stbl, "stsz").map { case (za, _) => bb.getInt(za + 8) }
                .orElse(find(stbl, "stts").map { case (za, _) =>
                  // sum of per-entry sample counts
                  val entries = bb.getInt(za + 4)
                  (0 until entries).map(i => bb.getInt(za + 8 + i * 8)).sum
                })
            } yield n).getOrElse(0)
            Mp4Meta(w, h, frames, durMs)
          }
        }.headOption
    } catch { case _: Exception => None }
  }

  /** Absolute `(offset, size)` byte range of every video sample (frame)
    * in an ISO-BMFF container, in sample order — the real sample-table
    * walk: `stsz` per-sample sizes (or the uniform-size shortcut),
    * `stsc` sample-to-chunk runs, `stco`/`co64` chunk offsets. This is
    * container-level frame access, NOT pixel decode: each range holds
    * one compressed sample (e.g. an H.264 access unit), which is
    * exactly what a frame-sampling pipeline ships to a decode service.
    * Corrupt / truncated / no-video-track containers yield `None`;
    * ranges pointing past a truncated `mdat` are caught at extraction
    * ([[extractFrames]] skips them), never thrown. */
  def mp4FrameRanges(bytes: Array[Byte]): Option[Array[(Long, Int)]] = {
    if (bytes == null || bytes.length < 16) return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    val boxes = mp4Boxes(bytes, bb) _
    try {
      val top = boxes(0, bytes.length)
      val (moovA, moovB) = mp4Find(top, "moov").getOrElse(return None)
      val moov = boxes(moovA, moovB)
      moov.collect { case ("trak", a, b) => boxes(a, b) }
        .flatMap { trak =>
          for {
            (ma, mb) <- mp4Find(trak, "mdia")
            mdia = boxes(ma, mb)
            (ha, _) <- mp4Find(mdia, "hdlr")
            if new String(bytes, ha + 8, 4,
              java.nio.charset.StandardCharsets.US_ASCII) == "vide"
            (na, nb2) <- mp4Find(mdia, "minf")
            (sa, sb) <- mp4Find(boxes(na, nb2), "stbl")
            stbl = boxes(sa, sb)
            (za, _) <- mp4Find(stbl, "stsz")
            (ca, _) <- mp4Find(stbl, "stsc")
            chunkOffs <- mp4Find(stbl, "stco").map { case (oa, _) =>
                val n = bb.getInt(oa + 4)
                Array.tabulate(n)(i =>
                  bb.getInt(oa + 8 + 4 * i).toLong & 0xffffffffL)
              }.orElse(mp4Find(stbl, "co64").map { case (oa, _) =>
                val n = bb.getInt(oa + 4)
                Array.tabulate(n)(i => bb.getLong(oa + 8 + 8 * i))
              })
          } yield {
            val uniform = bb.getInt(za + 4)
            val count = bb.getInt(za + 8)
            val sizes =
              if (uniform != 0) Array.fill(count)(uniform)
              else Array.tabulate(count)(i => bb.getInt(za + 12 + 4 * i))
            val nE = bb.getInt(ca + 4)
            val runs = Array.tabulate(nE)(i =>
              (bb.getInt(ca + 8 + 12 * i), bb.getInt(ca + 12 + 12 * i)))
            val out = Array.newBuilder[(Long, Int)]
            var sample = 0
            var run = 0
            while (run < runs.length && sample < count) {
              val (firstChunk, perChunk) = runs(run)
              val lastChunk =
                if (run + 1 < runs.length) runs(run + 1)._1 - 1
                else chunkOffs.length
              var c = firstChunk
              while (c <= lastChunk && c <= chunkOffs.length &&
                     sample < count) {
                var off = chunkOffs(c - 1) // chunk numbers are 1-based
                var k = 0
                while (k < perChunk && sample < count) {
                  out += ((off, sizes(sample)))
                  off += sizes(sample)
                  sample += 1; k += 1
                }
                c += 1
              }
              run += 1
            }
            out.result()
          }
        }.headOption
    } catch { case _: Exception => None }
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("frame", IntegerType),
    StructField("frame_bytes", BinaryType)))

  /** REAL frame sampling over video payloads: every `step`-th sample's
    * compressed bytes sliced straight out of the container via
    * [[mp4FrameRanges]] — `(media_id, frame, frame_bytes)`, one row per
    * sampled frame. Non-video mimes, corrupt containers, and ranges
    * pointing past a truncated `mdat` contribute no rows (poison never
    * fails the task). Same partition-sizing contract as [[decode]]:
    * payload bytes stay where the scan put them unless the incoming
    * partitioning is materially coarser than the byte target. */
  def extractFrames(media: DataFrame, step: Int,
                    targetBytesPerPartition: Long = 256L << 20,
                    numPartitions: Option[Int] = None): DataFrame = {
    require(step >= 1, s"step=$step")
    val df = media.select("media_id", "payload", "mime")
    sizedForDecode(df, targetBytesPerPartition, numPartitions)
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val mime = r.getString(2)
          if (!Mp4Mimes.contains(mime)) Iterator.empty
          else {
            val bytes = r.getAs[Array[Byte]](1)
            mp4FrameRanges(bytes) match {
              case Some(ranges) =>
                Iterator.range(0, ranges.length, step).flatMap { i =>
                  val (off, len) = ranges(i)
                  // overflow-safe bounds check: `off + len` could wrap for
                  // a hostile co64 offset near Long.MaxValue and admit a
                  // garbage slice into copyOfRange (poison must skip, not
                  // throw)
                  if (off >= 0 && len >= 0 && off <= bytes.length.toLong - len)
                    Iterator.single(Row(r.getLong(0), i,
                      java.util.Arrays.copyOfRange(bytes, off.toInt,
                        off.toInt + len)))
                  else Iterator.empty
                }
              case None => Iterator.empty
            }
          }
        }
      }(Encoders.row(frameSchema))
  }

  /** Video decode boundary — same partition-sizing and per-partition
    * batch shape as [[decode]], emitting [[videoSchema]]. MP4/ISO-BMFF
    * payloads parse for real through [[mp4Decode]]; corrupt/unsupported
    * payloads yield null metadata. */
  def decodeVideo(media: DataFrame,
                  targetBytesPerPartition: Long = 256L << 20,
                  numPartitions: Option[Int] = None): DataFrame = {
    val df = media.select("media_id", "payload", "mime")
    sizedForDecode(df, targetBytesPerPartition, numPartitions)
      .mapPartitions { rows =>
        rows.map { r =>
          // positional: see decode (schema-less rows after elided exchange)
          val bytes = r.getAs[Array[Byte]](1)
          val mime = r.getString(2)
          val nb = if (bytes == null) 0L else bytes.length.toLong
          mp4Decode(bytes) match {
            case Some(m) =>
              Row(r.getLong(0), mime, nb, m.width, m.height, m.nFrames,
                m.durationMs)
            case None =>
              Row(r.getLong(0), mime, nb, null, null, null, null)
          }
        }
      }(Encoders.row(videoSchema))
  }

  /** Deterministic MP4 test fixture, generated ON THE EXECUTORS: one
    * metadata-only ISO-BMFF container per input row — `ftyp` +
    * `moov{mvhd, trak{tkhd, mdia{mdhd, hdlr(vide), minf{stbl{stsd,
    * stts, stsz}}}}}` — with planted arithmetic ([[plantedVideo]]):
    * `16*(1+id%8) x 16*(1+id%5)` at `10+(id%20)` frames, 25 fps
    * (movie timescale 1000, duration `frames*40`). Exists so
    * [[decodeVideo]]/[[decode]]'s MP4 path is gated end-to-end
    * (build -> parse recovers the planted box arithmetic) without video
    * files in the testdata — the exact pattern of [[syntheticWav]]. */
  def syntheticMp4(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val (w, h, frames) = plantedVideo(id)
          Row(id, buildMp4(id, w, h, frames), "video/mp4")
        }
      }(Encoders.row(mediaSchema))

  /** The MP4 fixture's planted `(width, height, n_frames)`, shared with
    * oracle arithmetic; duration is `n_frames * 40` ms (25 fps). */
  def plantedVideo(id: Long): (Int, Int, Int) =
    (16 * (1 + (id % 8)).toInt, 16 * (1 + (id % 5)).toInt,
      10 + (id % 20).toInt)

  /** The fixture's planted per-frame payload — ASCII on purpose, so the
    * DuckDB oracle reproduces `md5(frame_bytes)` with plain string
    * arithmetic. Variable length (`1 + (id+i) % 7` trailing pad)
    * exercises the non-uniform stsz table path. */
  def plantedFrame(id: Long, i: Int): Array[Byte] =
    (s"frame|$id|$i|" + "x" * (1 + ((id + i) % 7)).toInt)
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** From-scratch ISO-BMFF builder for the fixture (public box layout;
    * big-endian sizes, 16.16 fixed-point tkhd dims). Since r9 the
    * container carries a REAL sample layout: a non-uniform `stsz` size
    * table, a two-run `stsc` sample-to-chunk map, `stco` chunk offsets,
    * and an `mdat` holding every [[plantedFrame]] payload split across
    * two chunks — so [[extractFrames]] walks the same tables a camera
    * MP4 ships. */
  private[graft] def buildMp4(id: Long, w: Int, h: Int,
                              frames: Int): Array[Byte] = {
    def box(tpe: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      bb.putInt(8 + body.length)
        .put(tpe.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        .put(body)
      bb.array()
    }
    def body(n: Int)(f: java.nio.ByteBuffer => Unit): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(n)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      f(bb); bb.array()
    }
    val identity = body(36) { m =>
      m.putInt(0x00010000).putInt(0).putInt(0)
      m.putInt(0).putInt(0x00010000).putInt(0)
      m.putInt(0).putInt(0).putInt(0x40000000); ()
    }
    val ftyp = box("ftyp", body(16) { b =>
      b.put("isom".getBytes("US-ASCII")).putInt(0x200)
        .put("isom".getBytes("US-ASCII")).put("mp42".getBytes("US-ASCII")); ()
    })
    val duration = frames * 40 // timescale 1000 -> ms at 25 fps
    val mvhd = box("mvhd", body(100) { b =>
      b.putInt(0) // version 0 + flags
        .putInt(0).putInt(0) // creation/modification
        .putInt(1000).putInt(duration) // timescale, duration
        .putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
        .putLong(0).put(identity)
      (0 until 6).foreach(_ => b.putInt(0)) // pre_defined
      b.putInt(2); () // next_track_ID
    })
    val tkhd = box("tkhd", body(84) { b =>
      b.putInt(0x000007) // version 0, flags: enabled|in-movie|in-preview
        .putInt(0).putInt(0) // creation/modification
        .putInt(1).putInt(0) // track_ID, reserved
        .putInt(duration).putLong(0)
        .putShort(0).putShort(0).putShort(0).putShort(0)
        .put(identity)
        .putInt(w << 16).putInt(h << 16); () // 16.16 fixed
    })
    val mdhd = box("mdhd", body(24) { b =>
      b.putInt(0).putInt(0).putInt(0)
        .putInt(1000).putInt(duration)
        .putShort(0x55c4.toShort).putShort(0); () // language 'und'
    })
    val hdlr = box("hdlr", body(25) { b =>
      b.putInt(0).putInt(0).put("vide".getBytes("US-ASCII"))
        .putInt(0).putInt(0).putInt(0).put(0.toByte); ()
    })
    val stsd = box("stsd", body(8) { b => b.putInt(0).putInt(0); () })
    val stts = box("stts", body(16) { b =>
      b.putInt(0).putInt(1).putInt(frames).putInt(40); ()
    })
    val payloads = (0 until frames).map(i => plantedFrame(id, i))
    val stsz = box("stsz", body(12 + 4 * frames) { b =>
      b.putInt(0).putInt(0).putInt(frames) // sample_size 0 -> per-sample table
      payloads.foreach(p => b.putInt(p.length)); ()
    })
    // two chunks: first ceil(frames/2) samples, then the rest
    val spc1 = math.max(1, (frames + 1) / 2)
    val spc2 = frames - spc1
    val stscEntries =
      if (spc2 > 0) Seq((1, spc1), (2, spc2)) else Seq((1, spc1))
    val stsc = box("stsc", body(8 + 12 * stscEntries.length) { b =>
      b.putInt(0).putInt(stscEntries.length)
      stscEntries.foreach { case (fc, n) => b.putInt(fc).putInt(n).putInt(1) }
      ()
    })
    // stco offsets are absolute file offsets into mdat's body; moov's
    // size is known once stco's own (fixed) size is accounted for
    val nChunks = stscEntries.length
    val stcoSize = 8 + (8 + 4 * nChunks)
    val stblPre = stsd ++ stts ++ stsz ++ stsc
    // sizes of the fixed wrappers: each box adds an 8-byte header
    val stblSize = 8 + stblPre.length + stcoSize
    val minfSize = 8 + stblSize
    val mdiaSize = 8 + mdhd.length + hdlr.length + minfSize
    val trakSize = 8 + tkhd.length + mdiaSize
    val moovSize = 8 + mvhd.length + trakSize
    val mdatBody = ftyp.length + moovSize + 8
    val chunk1Len = payloads.take(spc1).map(_.length).sum
    val stco = box("stco", body(8 + 4 * nChunks) { b =>
      b.putInt(0).putInt(nChunks).putInt(mdatBody)
      if (nChunks > 1) b.putInt(mdatBody + chunk1Len); ()
    })
    val stbl = box("stbl", stblPre ++ stco)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    val mdat = box("mdat", payloads.flatten.toArray)
    ftyp ++ moov ++ mdat
  }

  /** Wrap a text/binary-ish table into the media schema (for tests and
    * for treating raw docs as payloads). */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
              mime: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("payload"), lit(mime).as("mime"))

  // ---------------------------------------------------------------- audio

  val audioSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits", IntegerType),
    StructField("n_samples", LongType),
    StructField("duration_ms", LongType),
    StructField("feature", ArrayType(FloatType))))

  /** Decoded WAV header + audio feature. `feature` is the RMS amplitude
    * (normalized to [0,1]) over 4 equal sample windows — the deterministic
    * audio analogue of [[imageDecode]]'s grid-mean feature. */
  final case class WavMeta(sampleRate: Int, channels: Int, bits: Int,
                           nSamples: Long, feature: Array[Float])

  /** REAL audio decode for RIFF/WAVE PCM payloads — a pure-JVM parser of
    * the (public) RIFF container: chunk walk from offset 12, `fmt ` for
    * the format words, `data` for the sample payload. Supports PCM
    * (format tag 1) at 8 or 16 bits, any channel count; anything else —
    * or a truncated/corrupt container — yields `None`, so a poisoned row
    * surfaces as null metadata rather than failing the task (same
    * contract as [[imageDecode]]). */
  def wavDecode(bytes: Array[Byte]): Option[WavMeta] = {
    if (bytes == null || bytes.length < 44) return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    try {
      if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var off = 12
      var fmtTag = -1; var channels = 0; var rate = 0; var bits = 0
      var dataOff = -1; var dataLen = 0
      while (off + 8 <= bytes.length) {
        val id = tag(off)
        val sz = bb.getInt(off + 4)
        if (sz < 0 || off + 8 + sz > bytes.length) return None
        id match {
          case "fmt " =>
            if (sz < 16) return None
            fmtTag = bb.getShort(off + 8) & 0xffff
            channels = bb.getShort(off + 10) & 0xffff
            rate = bb.getInt(off + 12)
            bits = bb.getShort(off + 22) & 0xffff
          case "data" =>
            dataOff = off + 8; dataLen = sz
          case _ => // skip unknown chunks (LIST, fact, ...)
        }
        off += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      if (fmtTag != 1 || dataOff < 0 || channels <= 0 || rate <= 0 ||
        (bits != 8 && bits != 16)) return None
      val bytesPerSample = channels * bits / 8
      val n = dataLen / bytesPerSample
      val feat = new Array[Float](4)
      if (n > 0) {
        val sumSq = new Array[Double](4)
        val cnt = new Array[Long](4)
        var i = 0
        while (i < n) {
          val win = math.min(3, (i * 4) / n)
          var c = 0
          var acc = 0.0
          while (c < channels) {
            val v =
              if (bits == 16)
                bb.getShort(dataOff + i * bytesPerSample + c * 2) / 32768.0
              else
                ((bytes(dataOff + i * bytesPerSample + c) & 0xff) - 128) / 128.0
            acc += v * v
            c += 1
          }
          sumSq(win) += acc / channels
          cnt(win) += 1
          i += 1
        }
        var w = 0
        while (w < 4) {
          feat(w) =
            if (cnt(w) == 0) 0f else math.sqrt(sumSq(w) / cnt(w)).toFloat
          w += 1
        }
      }
      Some(WavMeta(rate, channels, bits, n.toLong, feat))
    } catch { case _: Exception => None }
  }

  /** Audio decode boundary — same partition-sizing and per-partition
    * batch shape as [[decode]], emitting [[audioSchema]]. WAV payloads
    * decode for real through [[wavDecode]]; corrupt/unsupported payloads
    * yield null metadata. */
  def decodeAudio(media: DataFrame,
                  targetBytesPerPartition: Long = 256L << 20,
                  numPartitions: Option[Int] = None): DataFrame = {
    val df = media.select("media_id", "payload", "mime")
    sizedForDecode(df, targetBytesPerPartition, numPartitions)
      .mapPartitions { rows =>
      rows.map { r =>
        // positional: see decode (schema-less rows after elided exchange)
        val bytes = r.getAs[Array[Byte]](1)
        val mime = r.getString(2)
        val nb = if (bytes == null) 0L else bytes.length.toLong
        wavDecode(bytes) match {
          case Some(m) =>
            val durMs =
              if (m.sampleRate > 0) m.nSamples * 1000L / m.sampleRate else 0L
            Row(r.getLong(0), mime, nb, m.sampleRate, m.channels, m.bits,
              m.nSamples, durMs, m.feature.toSeq)
          case None =>
            Row(r.getLong(0), mime, nb, null, null, null, null, null, null)
        }
      }
    }(Encoders.row(audioSchema))
  }

  /** Deterministic WAV test fixture, generated ON THE EXECUTORS: one
    * PCM16 mono sine per input row — 8 kHz, `800 + (id%5)*160` samples,
    * `200 + (id%7)*50` Hz, amplitude 0.5 — written through a from-scratch
    * RIFF builder. Exists so [[decodeAudio]]'s WAV path is gated
    * end-to-end (encode -> decode recovers the planted rate/width/length
    * arithmetic; the RMS of a 0.5-amplitude sine pins the feature near
    * 0.5/sqrt(2) in the spec). */
  def syntheticWav(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val n = plantedSamples(id)
          val freq = 200.0 + (id % 7) * 50.0
          val rate = 8000
          val dataLen = n * 2
          val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
            .put("WAVE".getBytes("US-ASCII"))
            .put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
            .putShort(2).putShort(16)
            .put("data".getBytes("US-ASCII")).putInt(dataLen)
          var i = 0
          while (i < n) {
            val v = 0.5 * math.sin(2.0 * math.Pi * freq * i / rate)
            bb.putShort(math.round(v * 32767.0).toShort)
            i += 1
          }
          Row(id, bb.array(), "audio/wav")
        }
      }(Encoders.row(mediaSchema))

  /** The WAV fixture's planted sample count, shared with oracle math. */
  def plantedSamples(id: Long): Int = 800 + ((id % 5) * 160).toInt
}
