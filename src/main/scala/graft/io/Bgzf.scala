package graft.io

import java.io.RandomAccessFile
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{CRC32, Deflater, Inflater}

/** BGZF — the blocked-gzip framing under tabix/BAM (SAM spec §4.1): a
  * concatenation of independent gzip members, each carrying its total
  * compressed size in a "BC" extra subfield so readers can seek to any
  * block boundary. Positions inside the stream are 48:16 *virtual
  * offsets*: `(compressedBlockOffset << 16) | withinBlockOffset`. Needs
  * only `java.util.zip` (raw-deflate mode + CRC32). */
private[graft] object Bgzf {

  val MaxBlockData = 65280 // uncompressed payload cap per block (spec)

  /** The fixed 28-byte end-of-file marker block. */
  val Eof: Array[Byte] = Array(
    0x1f, 0x8b, 0x08, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00, 0xff, 0x06, 0x00,
    0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00).map(_.toByte)

  def virtualOffset(coffset: Long, uoffset: Int): Long =
    (coffset << 16) | (uoffset & 0xFFFFL)
  def vCoffset(v: Long): Long = v >>> 16
  def vUoffset(v: Long): Int = (v & 0xFFFF).toInt

  /** Read ONE block at `coffset`; returns (uncompressed bytes, compressed
    * block length). */
  def readBlock(raf: RandomAccessFile, coffset: Long): (Array[Byte], Int) = {
    val head = new Array[Byte](18)
    raf.seek(coffset); raf.readFully(head)
    val bb = ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN)
    require((bb.get(0) & 0xFF) == 0x1f && (bb.get(1) & 0xFF) == 0x8b,
      f"not a gzip member at offset $coffset")
    require((bb.get(3) & 0x04) != 0, "gzip member without FEXTRA: not BGZF")
    val xlen = bb.getShort(10) & 0xFFFF
    // scan extra subfields for BC (the spec requires it somewhere in extra)
    val extra = new Array[Byte](xlen)
    raf.seek(coffset + 12); raf.readFully(extra)
    val eb = ByteBuffer.wrap(extra).order(ByteOrder.LITTLE_ENDIAN)
    var bsize = -1
    while (bsize < 0 && eb.remaining() >= 4) {
      val si1 = eb.get() & 0xFF; val si2 = eb.get() & 0xFF
      val slen = eb.getShort & 0xFFFF
      if (si1 == 66 && si2 == 67 && slen == 2) bsize = (eb.getShort & 0xFFFF) + 1
      else eb.position(eb.position() + slen)
    }
    require(bsize > 0, "BGZF BC subfield missing")
    val cdataLen = bsize - 12 - xlen - 8
    val cdata = new Array[Byte](cdataLen)
    raf.seek(coffset + 12 + xlen); raf.readFully(cdata)
    val tail = new Array[Byte](8)
    raf.readFully(tail)
    val isize = ByteBuffer.wrap(tail).order(ByteOrder.LITTLE_ENDIAN).getInt(4)
    val out = new Array[Byte](isize)
    if (isize > 0) {
      val inf = new Inflater(true)
      inf.setInput(cdata)
      var off = 0
      while (off < isize && !inf.finished()) off += inf.inflate(out, off, isize - off)
      inf.end()
      require(off == isize, s"short BGZF block at $coffset")
    }
    (out, bsize)
  }

  /** Decompress the byte range [vBeg, vEnd) given as virtual offsets —
    * exactly what a tabix chunk addresses. */
  def readRange(raf: RandomAccessFile, vBeg: Long, vEnd: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1 << 16)
    var coff = vCoffset(vBeg)
    var first = true
    var done = false
    while (!done) {
      val (data, clen) = readBlock(raf, coff)
      val from = if (first) vUoffset(vBeg) else 0
      val to =
        if (coff == vCoffset(vEnd)) vUoffset(vEnd)
        else data.length
      if (to > from) out.write(data, from, to - from)
      done = coff == vCoffset(vEnd) || (coff + clen > vCoffset(vEnd)) ||
        data.isEmpty
      coff += clen
      first = false
    }
    out.toByteArray
  }

  /** Decompress a whole BGZF file (used for the small .tbi index). */
  def readAll(path: String): Array[Byte] = {
    val raf = new RandomAccessFile(path, "r")
    try {
      val out = new java.io.ByteArrayOutputStream(1 << 16)
      var coff = 0L
      while (coff < raf.length()) {
        val (data, clen) = readBlock(raf, coff)
        out.write(data)
        coff += clen
      }
      out.toByteArray
    } finally raf.close()
  }

  /** Streaming BGZF writer tracking virtual offsets: call [[tell]] before
    * appending a record to learn its virtual start. */
  final class Writer(path: String) {
    private val raf = new RandomAccessFile(path, "rw")
    raf.setLength(0)
    private var coffset = 0L
    private val buf = new java.io.ByteArrayOutputStream(MaxBlockData)

    def tell: Long = virtualOffset(coffset, buf.size())

    def write(bytes: Array[Byte]): Unit = {
      var off = 0
      while (off < bytes.length) {
        val n = math.min(MaxBlockData - buf.size(), bytes.length - off)
        buf.write(bytes, off, n)
        off += n
        if (buf.size() >= MaxBlockData) flushBlock()
      }
    }

    private def flushBlock(): Unit = if (buf.size() > 0) {
      val data = buf.toByteArray
      buf.reset()
      val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(data); d.finish()
      val cbuf = new Array[Byte](data.length + 64)
      val cout = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
      while (!d.finished()) cout.write(cbuf, 0, d.deflate(cbuf))
      d.end()
      val cdata = cout.toByteArray
      val crc = new CRC32(); crc.update(data)
      val bsize = 12 + 6 + cdata.length + 8
      val bb = ByteBuffer.allocate(bsize).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(0x1f.toByte).put(0x8b.toByte).put(8.toByte).put(4.toByte)
        .putInt(0).put(0.toByte).put(0xff.toByte)
        .putShort(6.toShort) // XLEN
        .put(66.toByte).put(67.toByte).putShort(2.toShort)
        .putShort((bsize - 1).toShort)
        .put(cdata)
        .putInt(crc.getValue.toInt).putInt(data.length)
      raf.write(bb.array())
      coffset += bsize
    }

    def close(): Unit = {
      flushBlock()
      raf.write(Eof)
      raf.close()
    }
  }
}
