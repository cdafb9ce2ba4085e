package graft.io

import java.io.RandomAccessFile
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{Deflater, Inflater}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pure-JVM reader/writer for the UCSC BBI container formats — bigWig and
  * bigBed (reference `io/fileops.py:379-486` reads them via the pybbi /
  * pyBigWig C wrappers and `io/fileops.py:515-669` writes by shelling out
  * to UCSC binaries; this implementation needs only `java.util.zip`). The
  * container layout is the published Kent et al. 2010 format: a 64-byte
  * header, a chromosome-name B+ tree, zlib-compressed data sections, and
  * an R-tree interval index over the sections.
  *
  * Scale shape: the driver reads only the (small) header + trees; data
  * sections are decoded DISTRIBUTED — the R-tree leaf list parallelizes
  * across executors and each task random-access-reads just its block byte
  * ranges (the path must be executor-visible: local FS here, a shared
  * mount on a cluster). A region fetch prunes to the R-tree leaves
  * overlapping the query before any data byte is read, mirroring the
  * reference's indexed fetch. The writer is a bounded driver-side sink
  * (one binary file is inherently single-writer; the reference's
  * `to_bigwig` materializes the frame the same way) with a row-count
  * guard, and emits version-4 files with zoomLevels=0.
  *
  * Both byte orders are read (the magic number discriminates); the writer
  * can emit either, which is how the big-endian read path is spec'd. */
private[graft] object Bbi {
  val BigWigMagic = 0x888FFC26
  val BigBedMagic = 0x8789F2EB
  val ChromTreeMagic = 0x78CA8C91
  val RTreeMagic = 0x2468ACE0

  case class Header(magic: Int, version: Int, zoomLevels: Int,
      chromTreeOffset: Long, fullDataOffset: Long, fullIndexOffset: Long,
      fieldCount: Int, definedFieldCount: Int, autoSqlOffset: Long,
      totalSummaryOffset: Long, uncompressBufSize: Int, bigEndian: Boolean)

  /** One R-tree leaf item: the file extent of a data section and the
    * (chromIx, base) bounds it covers. */
  case class BlockRef(startChromIx: Int, startBase: Long, endChromIx: Int,
      endBase: Long, offset: Long, size: Long)

  case class ZoomHeader(reduction: Long, dataOffset: Long, indexOffset: Long)

  case class Meta(header: Header, chroms: Seq[(Int, String, Long)],
      blocks: Seq[BlockRef], zooms: Seq[ZoomHeader] = Nil)

  def u32(bb: ByteBuffer): Long = bb.getInt & 0xFFFFFFFFL

  private def readAt(raf: RandomAccessFile, off: Long, len: Int,
                     order: ByteOrder): ByteBuffer = {
    val a = new Array[Byte](len)
    raf.seek(off); raf.readFully(a)
    ByteBuffer.wrap(a).order(order)
  }

  def readMeta(path: String, expectMagic: Int): Meta = {
    val raf = new RandomAccessFile(path, "r")
    try {
      var order = ByteOrder.LITTLE_ENDIAN
      var bb = readAt(raf, 0, 64, order)
      if (bb.getInt(0) != expectMagic) {
        order = ByteOrder.BIG_ENDIAN
        bb = readAt(raf, 0, 64, order)
        require(bb.getInt(0) == expectMagic,
          f"$path: not a ${if (expectMagic == BigWigMagic) "bigWig" else "bigBed"} file (magic 0x${bb.order(ByteOrder.LITTLE_ENDIAN).getInt(0)}%08x)")
      }
      val h = Header(bb.getInt, bb.getShort & 0xFFFF, bb.getShort & 0xFFFF,
        bb.getLong, bb.getLong, bb.getLong, bb.getShort & 0xFFFF,
        bb.getShort & 0xFFFF, bb.getLong, bb.getLong, bb.getInt,
        order == ByteOrder.BIG_ENDIAN)
      // zoom headers sit immediately after the fixed header (24 bytes each)
      val zooms = if (h.zoomLevels == 0) Nil else {
        val zb = readAt(raf, 64, 24 * h.zoomLevels, order)
        Seq.fill(h.zoomLevels) {
          val red = u32(zb); zb.getInt
          ZoomHeader(red, zb.getLong, zb.getLong)
        }
      }
      Meta(h, readChromTree(raf, h.chromTreeOffset, order),
        readRTree(raf, h.fullIndexOffset, order), zooms)
    } finally raf.close()
  }

  private def readChromTree(raf: RandomAccessFile, off: Long,
                            order: ByteOrder): Seq[(Int, String, Long)] = {
    val hd = readAt(raf, off, 32, order)
    require(hd.getInt == ChromTreeMagic, "bad chromosome B+ tree magic")
    hd.getInt // blockSize
    val keySize = hd.getInt
    hd.getInt // valSize (8)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    def node(nodeOff: Long): Unit = {
      val nh = readAt(raf, nodeOff, 4, order)
      val isLeaf = nh.get() != 0
      nh.get()
      val count = nh.getShort & 0xFFFF
      if (isLeaf) {
        val items = readAt(raf, nodeOff + 4, count * (keySize + 8), order)
        for (_ <- 0 until count) {
          val key = new Array[Byte](keySize); items.get(key)
          val name = new String(key.takeWhile(_ != 0), "US-ASCII")
          out += ((items.getInt, name, u32(items)))
        }
      } else {
        val items = readAt(raf, nodeOff + 4, count * (keySize + 8), order)
        val children = (0 until count).map { _ =>
          items.position(items.position() + keySize); items.getLong
        }
        children.foreach(node)
      }
    }
    node(off + 32)
    out.toSeq.map { case (id, name, size) => (id, name, size) }
  }

  private[graft] def readRTree(raf: RandomAccessFile, off: Long,
                               order: ByteOrder): Seq[BlockRef] = {
    val hd = readAt(raf, off, 48, order)
    require(hd.getInt == RTreeMagic, "bad R-tree magic")
    val out = scala.collection.mutable.ArrayBuffer.empty[BlockRef]
    def node(nodeOff: Long): Unit = {
      val nh = readAt(raf, nodeOff, 4, order)
      val isLeaf = nh.get() != 0
      nh.get()
      val count = nh.getShort & 0xFFFF
      if (isLeaf) {
        val items = readAt(raf, nodeOff + 4, count * 32, order)
        for (_ <- 0 until count)
          out += BlockRef(items.getInt, u32(items), items.getInt, u32(items),
            items.getLong, items.getLong)
      } else {
        val items = readAt(raf, nodeOff + 4, count * 24, order)
        val children = (0 until count).map { _ =>
          items.position(items.position() + 16); items.getLong
        }
        children.foreach(node)
      }
    }
    node(off + 48)
    out.toSeq
  }

  def inflate(raw: Array[Byte], hint: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(raw)
    val buf = new Array[Byte](math.max(hint, 1 << 14))
    val out = new java.io.ByteArrayOutputStream(math.max(hint, 64))
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput()) throw new java.io.EOFException(
        "truncated zlib data section")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length + 64)
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Leaf items overlapping the (chromIx, [qs, qe)) query. */
  def pruneBlocks(blocks: Seq[BlockRef], ix: Int, qs: Long,
                  qe: Long): Seq[BlockRef] =
    blocks.filter { b =>
      !(b.endChromIx < ix || b.startChromIx > ix ||
        (b.endChromIx == ix && b.endBase <= qs) ||
        (b.startChromIx == ix && b.startBase >= qe))
    }

  // ------------------------------------------------------------- writing

  class Buf(order: ByteOrder) {
    private var bb = ByteBuffer.allocate(1 << 12).order(order)
    private def ensure(n: Int): Unit = if (bb.remaining() < n) {
      val bigger = ByteBuffer.allocate(math.max(bb.capacity * 2,
        bb.capacity + n)).order(order)
      bb.flip(); bigger.put(bb); bb = bigger
    }
    def u8(v: Int): this.type = { ensure(1); bb.put(v.toByte); this }
    def u16(v: Int): this.type = { ensure(2); bb.putShort(v.toShort); this }
    def u32(v: Long): this.type = { ensure(4); bb.putInt(v.toInt); this }
    def u64(v: Long): this.type = { ensure(8); bb.putLong(v); this }
    def f32(v: Float): this.type = { ensure(4); bb.putFloat(v); this }
    def f64(v: Double): this.type = { ensure(8); bb.putDouble(v); this }
    def bytes(a: Array[Byte]): this.type = { ensure(a.length); bb.put(a); this }
    def size: Int = bb.position()
    def toArray: Array[Byte] = { val a = new Array[Byte](bb.position()); bb.duplicate().flip().get(a); a }
  }

  /** Chromosome B+ tree: blockSize is sized to hold every chrom in one
    * leaf (valid — blockSize is the per-node capacity bound). Keys are
    * zero-padded to the longest name, in byte-sorted order. */
  def chromTreeBytes(chroms: Seq[(String, Int, Long)],
                     order: ByteOrder): Array[Byte] = {
    val keySize = math.max(1, if (chroms.isEmpty) 1 else chroms.map(_._1.length).max)
    val b = new Buf(order)
    b.u32(ChromTreeMagic).u32(math.max(256, chroms.size).toLong)
      .u32(keySize.toLong).u32(8L).u64(chroms.size.toLong).u64(0L)
    b.u8(1).u8(0).u16(chroms.size)
    chroms.sortBy(_._1).foreach { case (name, id, size) =>
      b.bytes(java.util.Arrays.copyOf(name.getBytes("US-ASCII"), keySize))
      b.u32(id.toLong).u32(size)
    }
    b.toArray
  }

  /** R-tree over the section extents: one leaf item per section, block
    * size 256, one or two levels (up to 65536 sections — combined with
    * the writer row cap this is never the binding limit). */
  def rTreeBytes(items: Seq[BlockRef], indexOffset: Long, endFileOffset: Long,
                 order: ByteOrder): Array[Byte] = {
    val blockSize = 256
    require(items.size <= blockSize * blockSize,
      s"too many data sections for a 2-level R-tree: ${items.size}")
    val b = new Buf(order)
    // upper bounds are max-(chromIx, base), not the last item's: nested
    // extents mean a later section can close before an earlier one
    def maxEndOf(g: Seq[BlockRef]): (Long, Long) =
      g.map(i => (i.endChromIx.toLong, i.endBase)).max
    val (sIx, sBase, eIx, eBase) =
      if (items.isEmpty) (0L, 0L, 0L, 0L)
      else {
        val (mIx, mBase) = maxEndOf(items)
        (items.head.startChromIx.toLong, items.head.startBase, mIx, mBase)
      }
    b.u32(RTreeMagic).u32(blockSize.toLong).u64(items.size.toLong)
      .u32(sIx).u32(sBase).u32(eIx).u32(eBase)
      .u64(endFileOffset).u32(1L).u32(0L)
    val groups = items.grouped(blockSize).toSeq
    def leafBytes(g: Seq[BlockRef]): Int = 4 + g.size * 32
    if (groups.size <= 1) {
      val g = groups.headOption.getOrElse(Nil)
      b.u8(1).u8(0).u16(g.size)
      g.foreach { it =>
        b.u32(it.startChromIx.toLong).u32(it.startBase)
          .u32(it.endChromIx.toLong).u32(it.endBase)
          .u64(it.offset).u64(it.size)
      }
    } else {
      // root internal node, then the leaf nodes laid out sequentially
      val rootBytes = 4 + groups.size * 24
      var childOff = indexOffset + 48 + rootBytes
      b.u8(0).u8(0).u16(groups.size)
      groups.foreach { g =>
        val (mIx, mBase) = maxEndOf(g)
        b.u32(g.head.startChromIx.toLong).u32(g.head.startBase)
          .u32(mIx).u32(mBase)
          .u64(childOff)
        childOff += leafBytes(g)
      }
      groups.foreach { g =>
        b.u8(1).u8(0).u16(g.size)
        g.foreach { it =>
          b.u32(it.startChromIx.toLong).u32(it.startBase)
            .u32(it.endChromIx.toLong).u32(it.endBase)
            .u64(it.offset).u64(it.size)
        }
      }
    }
    b.toArray
  }

  def headerBytes(magic: Int, zoomLevels: Int, chromTreeOffset: Long,
                  fullDataOffset: Long, fullIndexOffset: Long, fieldCount: Int,
                  definedFieldCount: Int, totalSummaryOffset: Long,
                  uncompressBufSize: Int, order: ByteOrder): Array[Byte] = {
    val b = new Buf(order)
    b.u32(magic & 0xFFFFFFFFL).u16(4).u16(zoomLevels)
      .u64(chromTreeOffset).u64(fullDataOffset).u64(fullIndexOffset)
      .u16(fieldCount).u16(definedFieldCount).u64(0L)
      .u64(totalSummaryOffset).u32(uncompressBufSize.toLong).u64(0L)
    b.toArray
  }

  /** (validCount, min, max, sum, sumSquares) over covered bases. */
  def summaryBytes(rows: Seq[(Long, Long, Double)],
                   order: ByteOrder): Array[Byte] = {
    var (n, mn, mx, s, ss) = (0L, Double.MaxValue, Double.MinValue, 0.0, 0.0)
    rows.foreach { case (st, en, v) =>
      val len = en - st
      n += len; s += v * len; ss += v * v * len
      if (v < mn) mn = v
      if (v > mx) mx = v
    }
    if (rows.isEmpty) { mn = 0.0; mx = 0.0 }
    val b = new Buf(order)
    b.u64(n).f64(mn).f64(mx).f64(s).f64(ss)
    b.toArray
  }

  /** Shared driver-side assembly: header + zoom headers + summary +
    * chrom tree + data sections + R-tree + per-level zoom sections with
    * their own R-trees, with offsets resolved in one pass. Each zoom
    * level is (reduction, sections, recordCount). */
  def writeFile(path: String, magic: Int, fieldCount: Int,
                definedFieldCount: Int,
                chroms: Seq[(String, Int, Long)],
                sections: Seq[(BlockRef, Array[Byte])], dataCount: Long,
                summary: Array[Byte], compress: Boolean,
                order: ByteOrder,
                zooms: Seq[(Long, Seq[(BlockRef, Array[Byte])], Long)] = Nil)
      : Unit = {
    // sections are independent — deflate them across driver cores (the
    // sink stays bounded-single-writer at the FILE level, but the zlib
    // CPU, the dominant write cost on large section counts, fans out;
    // deflate() builds a fresh Deflater per call so this is race-free)
    def pack(ss: Seq[(BlockRef, Array[Byte])]) = {
      val arr = ss.toArray
      val out = new Array[(BlockRef, Array[Byte], Int)](arr.length)
      java.util.stream.IntStream.range(0, arr.length).parallel().forEach {
        i =>
          val (ref, raw) = arr(i)
          out(i) = (ref, if (compress) deflate(raw) else raw, raw.length)
      }
      out.toSeq
    }
    val packed = pack(sections)
    val zPacked = zooms.map { case (red, ss, n) => (red, pack(ss), n) }
    val uncompressBufSize =
      if (!compress) 0
      else (packed ++ zPacked.flatMap(_._2))
        .foldLeft(0) { case (m, (_, _, rawLen)) => math.max(m, rawLen) }
    val chromTree = chromTreeBytes(chroms, order)
    val totalSummaryOffset = 64L + 24L * zooms.size
    val chromTreeOffset = totalSummaryOffset + summary.length
    val fullDataOffset = chromTreeOffset + chromTree.length
    var off = fullDataOffset + 8
    def place(ps: Seq[(BlockRef, Array[Byte], Int)]) = ps.map {
      case (ref, bytes, _) =>
        val r = ref.copy(offset = off, size = bytes.length.toLong)
        off += bytes.length
        (r, bytes)
    }
    val placed = place(packed)
    val fullIndexOffset = off
    val rTree = rTreeBytes(placed.map(_._1), fullIndexOffset,
      endFileOffset = fullIndexOffset, order = order)
    off += rTree.length
    // zoom levels: u32 record count, sections, then that level's R-tree
    val zPlaced = zPacked.map { case (red, ps, n) =>
      val dataOffset = off
      off += 4
      val pl = place(ps)
      val indexOffset = off
      val zt = rTreeBytes(pl.map(_._1), indexOffset,
        endFileOffset = indexOffset, order = order)
      off += zt.length
      (red, dataOffset, indexOffset, n, pl, zt)
    }
    val header = headerBytes(magic, zooms.size, chromTreeOffset,
      fullDataOffset, fullIndexOffset, fieldCount, definedFieldCount,
      totalSummaryOffset, uncompressBufSize, order)
    val raf = new RandomAccessFile(path, "rw")
    try {
      raf.setLength(0)
      raf.write(header)
      zPlaced.foreach { case (red, dOff, iOff, _, _, _) =>
        val zh = new Buf(order)
        zh.u32(red).u32(0L).u64(dOff).u64(iOff)
        raf.write(zh.toArray)
      }
      raf.write(summary)
      raf.write(chromTree)
      val cnt = ByteBuffer.allocate(8).order(order)
      cnt.putLong(dataCount)
      raf.write(cnt.array())
      placed.foreach { case (_, bytes) => raf.write(bytes) }
      raf.write(rTree)
      zPlaced.foreach { case (_, _, _, n, pl, zt) =>
        val c = ByteBuffer.allocate(4).order(order)
        c.putInt(n.toInt)
        raf.write(c.array())
        pl.foreach { case (_, bytes) => raf.write(bytes) }
        raf.write(zt)
      }
    } finally raf.close()
  }

  /** Bounded-collect guard for the single-file sinks: ONE execution —
    * `limit(maxRows+1).collect()` returns every row when the input is
    * within bounds (and, over an ordered input, in order: Spark plans
    * ordered limits as TakeOrderedAndProject), and the +1 row proves an
    * overflow without a separate count() pass that would re-run the
    * whole upstream query. */
  def collectGuarded(df: DataFrame, maxRows: Long): Array[Row] = {
    val rows = df.limit((maxRows + 1).toInt).collect()
    require(rows.length <= maxRows,
      s"bigWig/bigBed writer: input exceeds $maxRows rows; a BBI file is " +
        "a single-writer binary sink. Write bedGraph/chrom-partitioned " +
        "parquet for larger relations, or raise maxRows explicitly.")
    rows
  }
}

/** bigWig: data sections carry (start, end, float value) runs. Reads all
  * three wig encodings (1 = bedGraph, 2 = varStep, 3 = fixedStep); writes
  * type 1. */
object BigWig {
  import Bbi._

  private val schema = StructType(Seq(
    StructField("chrom", StringType), StructField("start", LongType),
    StructField("end", LongType), StructField("value", DoubleType)))

  private[graft] def decodeSections(bytes: Array[Byte],
      bigEndian: Boolean): Seq[(Int, Long, Long, Double)] = {
    val bb = ByteBuffer.wrap(bytes).order(
      if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Double)]
    while (bb.remaining() >= 24) {
      val chromId = bb.getInt
      val chromStart = u32(bb)
      u32(bb) // chromEnd
      val itemStep = u32(bb)
      val itemSpan = u32(bb)
      val typ = bb.get() & 0xFF
      bb.get()
      val n = bb.getShort & 0xFFFF
      var i = 0
      while (i < n) {
        typ match {
          case 1 =>
            val s = u32(bb); val e = u32(bb)
            out += ((chromId, s, e, bb.getFloat.toDouble))
          case 2 =>
            val s = u32(bb)
            out += ((chromId, s, s + itemSpan, bb.getFloat.toDouble))
          case 3 =>
            val s = chromStart + i * itemStep
            out += ((chromId, s, s + itemSpan, bb.getFloat.toDouble))
          case t => throw new IllegalStateException(s"unknown wig section type $t")
        }
        i += 1
      }
    }
    out.toSeq
  }

  /** Read a bigWig into (chrom, start, end, value); an optional region
    * prunes R-tree leaves before any data block is read and returns the
    * unclipped overlapping runs (the reference fetch shape —
    * `io/fileops.py:379-430`). */
  def read(spark: SparkSession, path: String,
           chrom: Option[String] = None, start: Option[Long] = None,
           end: Option[Long] = None): DataFrame = {
    val meta = readMeta(path, BigWigMagic)
    val byName = meta.chroms.map(c => c._2 -> c._1).toMap
    val blocks = chrom match {
      case None => meta.blocks
      case Some(c) => byName.get(c) match {
        case None => Nil
        case Some(ix) => pruneBlocks(meta.blocks, ix,
          start.getOrElse(0L), end.getOrElse(Long.MaxValue))
      }
    }
    val names = meta.chroms.map(c => c._1 -> c._2).toMap
    val bigEndian = meta.header.bigEndian
    val compressed = meta.header.uncompressBufSize > 0
    val bufHint = meta.header.uncompressBufSize
    val sc = spark.sparkContext
    val bn = sc.broadcast(names)
    val slices = math.max(1, math.min(blocks.size, sc.defaultParallelism))
    val rows = sc.parallelize(blocks, slices).mapPartitions { it =>
      val raf = new RandomAccessFile(path, "r")
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => raf.close()))
      it.flatMap { b =>
        val raw = new Array[Byte](b.size.toInt)
        raf.seek(b.offset); raf.readFully(raw)
        val bytes = if (compressed) inflate(raw, bufHint) else raw
        decodeSections(bytes, bigEndian).map { case (cid, s, e, v) =>
          Row(bn.value(cid), s, e, v)
        }
      }
    }
    var df = spark.createDataFrame(rows, schema)
    chrom.foreach(c => df = df.filter(col("chrom") === c))
    start.foreach(s => df = df.filter(col("end") > s))
    end.foreach(e => df = df.filter(col("start") < e))
    df
  }

  /** Aggregate base runs into reduction-width zoom summary bins:
    * (chromId, binStart, binEnd, validCount, min, max, sum, sumSq) with
    * per-base accounting, the BBI zoom semantics. */
  private def zoomRecords(rows: Seq[(String, Long, Long, Double)],
      id: Map[String, Int], reduction: Long)
      : Seq[(Int, Long, Long, Long, Double, Double, Double, Double)] = {
    val acc = scala.collection.mutable.LinkedHashMap
      .empty[(Int, Long), (Long, Double, Double, Double, Double)]
    rows.foreach { case (c, s, e, v) =>
      val cid = id(c)
      var k = s / reduction
      while (k * reduction < e) {
        val ov = math.min(e, (k + 1) * reduction) - math.max(s, k * reduction)
        if (ov > 0) {
          val (n, mn, mx, su, sq) =
            acc.getOrElse((cid, k), (0L, v, v, 0.0, 0.0))
          acc((cid, k)) = (n + ov, math.min(mn, v), math.max(mx, v),
            su + v * ov, sq + v * v * ov)
        }
        k += 1
      }
    }
    acc.toSeq.map { case ((cid, k), (n, mn, mx, su, sq)) =>
      (cid, k * reduction, (k + 1) * reduction, n, mn, mx, su, sq)
    }.sortBy(r => (r._1, r._2))
  }

  /** Write (chrom, start, end, value) as a version-4 bigWig (type-1
    * sections). `zoomReductions` adds browser-grade multi-resolution
    * summary levels (32-byte zoom records + per-level R-tree); empty =
    * zoomLevels 0. `chromSizes` defaults to each chrom's max end. Bounded
    * driver-side sink — see [[Bbi.collectGuarded]]. */
  def write(df: DataFrame, path: String,
            chromSizes: Map[String, Long] = Map.empty,
            compress: Boolean = true, itemsPerSection: Int = 256,
            maxRows: Long = 1L << 24, bigEndian: Boolean = false,
            zoomReductions: Seq[Long] = Nil): Unit = {
    val order = if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
    val rows = collectGuarded(
      df.select(col("chrom").cast("string"), col("start").cast("long"),
        col("end").cast("long"), col("value").cast("double"))
        .orderBy(col("chrom"), col("start"), col("end")), maxRows)
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val chromNames = rows.map(_._1).distinct.sorted
    val id = chromNames.zipWithIndex.toMap
    val sizes = chromNames.map { c =>
      (c, id(c), chromSizes.getOrElse(c,
        rows.iterator.filter(_._1 == c).map(_._3).max))
    }
    val sections = rows.grouped(itemsPerSection).toSeq
      .flatMap(g => g.groupBy(_._1).toSeq.sortBy(s => id(s._1)).map(_._2))
      .map { g =>
        val cid = id(g.head._1)
        // max end, not last end: rows sort by (start, end), so a nested
        // interval can close before an earlier long one — the R-tree leaf
        // bound must cover the section's true extent or pruning drops it
        val maxEnd = g.iterator.map(_._3).max
        val b = new Buf(order)
        b.u32(cid.toLong).u32(g.head._2).u32(maxEnd)
          .u32(0L).u32(0L).u8(1).u8(0).u16(g.length)
        g.foreach { case (_, s, e, v) => b.u32(s).u32(e).f32(v.toFloat) }
        (BlockRef(cid, g.head._2, cid, maxEnd, 0L, 0L), b.toArray)
      }
    val zooms = zoomReductions.sorted.map { red =>
      val recs = zoomRecords(rows.toSeq, id, red)
      val zSections = recs.grouped(itemsPerSection).toSeq
        .flatMap(g => g.groupBy(_._1).toSeq.sortBy(_._1).map(_._2))
        .map { g =>
          val cid = g.head._1
          val maxEnd = g.iterator.map(_._3).max
          val b = new Buf(order)
          g.foreach { case (c, s, e, n, mn, mx, su, sq) =>
            b.u32(c.toLong).u32(s).u32(e).u32(n)
              .f32(mn.toFloat).f32(mx.toFloat).f32(su.toFloat).f32(sq.toFloat)
          }
          (BlockRef(cid, g.head._2, cid, maxEnd, 0L, 0L), b.toArray)
        }
      (red, zSections, recs.size.toLong)
    }
    writeFile(path, BigWigMagic, 0, 0, sizes, sections,
      dataCount = sections.size.toLong,
      summary = summaryBytes(rows.toSeq.map(r => (r._2, r._3, r._4)), order),
      compress = compress, order = order, zooms = zooms)
  }

  /** Read a zoom level's summary bins: the level with the largest
    * reduction <= `reduction` (browser pick rule), as (chrom, start, end,
    * valid_count, min, max, sum, sum_sq). Region pruning goes through the
    * level's own R-tree. */
  def readZoom(spark: SparkSession, path: String, reduction: Long,
               chrom: Option[String] = None, start: Option[Long] = None,
               end: Option[Long] = None): DataFrame = {
    val meta = readMeta(path, BigWigMagic)
    require(meta.zooms.nonEmpty, s"$path has no zoom levels")
    val level = meta.zooms.filter(_.reduction <= reduction) match {
      case Seq() => meta.zooms.minBy(_.reduction)
      case fit => fit.maxBy(_.reduction)
    }
    val raf = new RandomAccessFile(path, "r")
    val blocks = try {
      val all = readRTree(raf, level.indexOffset,
        if (meta.header.bigEndian) ByteOrder.BIG_ENDIAN
        else ByteOrder.LITTLE_ENDIAN)
      val byName = meta.chroms.map(c => c._2 -> c._1).toMap
      chrom match {
        case None => all
        case Some(c) => byName.get(c) match {
          case None => Nil
          case Some(ix) => pruneBlocks(all, ix,
            start.getOrElse(0L), end.getOrElse(Long.MaxValue))
        }
      }
    } finally raf.close()
    val names = meta.chroms.map(c => c._1 -> c._2).toMap
    val bigEndian = meta.header.bigEndian
    val compressed = meta.header.uncompressBufSize > 0
    val bufHint = meta.header.uncompressBufSize
    val sc = spark.sparkContext
    val bn = sc.broadcast(names)
    val slices = math.max(1, math.min(blocks.size, sc.defaultParallelism))
    val zschema = StructType(Seq(
      StructField("chrom", StringType), StructField("start", LongType),
      StructField("end", LongType), StructField("valid_count", LongType),
      StructField("min", DoubleType), StructField("max", DoubleType),
      StructField("sum", DoubleType), StructField("sum_sq", DoubleType)))
    val rows = sc.parallelize(blocks, slices).mapPartitions { it =>
      val raf2 = new RandomAccessFile(path, "r")
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => raf2.close()))
      it.flatMap { b =>
        val raw = new Array[Byte](b.size.toInt)
        raf2.seek(b.offset); raf2.readFully(raw)
        val bytes = if (compressed) inflate(raw, bufHint) else raw
        val bb = ByteBuffer.wrap(bytes).order(
          if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        while (bb.remaining() >= 32) {
          out += Row(bn.value(bb.getInt), u32(bb), u32(bb), u32(bb),
            bb.getFloat.toDouble, bb.getFloat.toDouble,
            bb.getFloat.toDouble, bb.getFloat.toDouble)
        }
        out
      }
    }
    var df = spark.createDataFrame(rows, zschema)
    chrom.foreach(c => df = df.filter(col("chrom") === c))
    start.foreach(s => df = df.filter(col("end") > s))
    end.foreach(e => df = df.filter(col("start") < e))
    df
  }
}

/** bigBed: data sections carry (chromId, start, end, rest'\0') records,
  * `rest` being the tab-joined BED fields past the coordinate triple. */
object BigBed {
  import Bbi._

  private val schema = StructType(Seq(
    StructField("chrom", StringType), StructField("start", LongType),
    StructField("end", LongType), StructField("rest", StringType)))

  private[graft] def decodeSections(bytes: Array[Byte],
      bigEndian: Boolean): Seq[(Int, Long, Long, String)] = {
    val bb = ByteBuffer.wrap(bytes).order(
      if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, String)]
    while (bb.remaining() >= 12) {
      val cid = bb.getInt
      val s = u32(bb); val e = u32(bb)
      val sb = new java.lang.StringBuilder()
      var c = bb.get()
      while (c != 0) { sb.append(c.toChar); c = bb.get() }
      out += ((cid, s, e, sb.toString))
    }
    out.toSeq
  }

  def read(spark: SparkSession, path: String,
           chrom: Option[String] = None, start: Option[Long] = None,
           end: Option[Long] = None): DataFrame = {
    val meta = readMeta(path, BigBedMagic)
    val byName = meta.chroms.map(c => c._2 -> c._1).toMap
    val blocks = chrom match {
      case None => meta.blocks
      case Some(c) => byName.get(c) match {
        case None => Nil
        case Some(ix) => pruneBlocks(meta.blocks, ix,
          start.getOrElse(0L), end.getOrElse(Long.MaxValue))
      }
    }
    val names = meta.chroms.map(c => c._1 -> c._2).toMap
    val bigEndian = meta.header.bigEndian
    val compressed = meta.header.uncompressBufSize > 0
    val bufHint = meta.header.uncompressBufSize
    val sc = spark.sparkContext
    val bn = sc.broadcast(names)
    val slices = math.max(1, math.min(blocks.size, sc.defaultParallelism))
    val rows = sc.parallelize(blocks, slices).mapPartitions { it =>
      val raf = new RandomAccessFile(path, "r")
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => raf.close()))
      it.flatMap { b =>
        val raw = new Array[Byte](b.size.toInt)
        raf.seek(b.offset); raf.readFully(raw)
        val bytes = if (compressed) inflate(raw, bufHint) else raw
        decodeSections(bytes, bigEndian).map { case (cid, s, e, rest) =>
          Row(bn.value(cid), s, e, rest)
        }
      }
    }
    var df = spark.createDataFrame(rows, schema)
    chrom.foreach(c => df = df.filter(col("chrom") === c))
    start.foreach(s => df = df.filter(col("end") > s))
    end.foreach(e => df = df.filter(col("start") < e))
    df
  }

  /** Write (chrom, start, end[, rest]) as a bigBed; extra columns beyond
    * the triple are tab-joined into `rest`. */
  def write(df: DataFrame, path: String,
            chromSizes: Map[String, Long] = Map.empty,
            compress: Boolean = true, itemsPerSection: Int = 256,
            maxRows: Long = 1L << 24, bigEndian: Boolean = false): Unit = {
    val order = if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
    val extras = df.columns.filterNot(Set("chrom", "start", "end")).toSeq
    val restCol =
      if (extras.isEmpty) lit("")
      else concat_ws("\t", extras.map(c => col(c).cast("string")): _*)
    val rows = collectGuarded(
      df.select(col("chrom").cast("string"), col("start").cast("long"),
        col("end").cast("long"), restCol.as("rest"))
        .orderBy(col("chrom"), col("start"), col("end")), maxRows)
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val chromNames = rows.map(_._1).distinct.sorted
    val id = chromNames.zipWithIndex.toMap
    val sizes = chromNames.map { c =>
      (c, id(c), chromSizes.getOrElse(c,
        rows.iterator.filter(_._1 == c).map(_._3).max))
    }
    val sections = rows.grouped(itemsPerSection).toSeq
      .flatMap(g => g.groupBy(_._1).toSeq.sortBy(s => id(s._1)).map(_._2))
      .map { g =>
        val cid = id(g.head._1)
        val maxEnd = g.iterator.map(_._3).max // see BigWig.write
        val b = new Buf(order)
        g.foreach { case (_, s, e, rest) =>
          b.u32(cid.toLong).u32(s).u32(e)
          b.bytes(rest.getBytes("US-ASCII")).u8(0)
        }
        (BlockRef(cid, g.head._2, cid, maxEnd, 0L, 0L), b.toArray)
      }
    val fieldCount = 3 + (if (rows.forall(_._4.isEmpty)) 0
      else rows.iterator.map(_._4.count(_ == '\t') + 1).max)
    writeFile(path, BigBedMagic, fieldCount, math.min(fieldCount, 12), sizes,
      sections, dataCount = rows.length.toLong,
      summary = summaryBytes(rows.toSeq.map(r => (r._2, r._3, 1.0)), order),
      compress = compress, order = order)
  }
}
