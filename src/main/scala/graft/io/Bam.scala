package graft.io

import java.io.RandomAccessFile
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pure-JVM BAM reader/writer (SAM spec §4) over [[Bgzf]] — the reference
  * reads alignments via pysam (`io/fileops.py:256-283`) into the 12
  * `BAM_FIELDS` columns (`io/schemas.py:156-169`); this produces the same
  * relation. The `.bai` sidecar (SAM spec §5.2) reuses the tabix binning
  * scheme over an UNcompressed container, so region queries resolve to
  * record-aligned virtual-offset chunks exactly like [[Tabix]]: driver
  * parses header + index, chunk decompression distributes one task per
  * chunk group.
  *
  * Mirrored reference quirks: `POS`/`PNEXT` are pysam's 0-based ints,
  * `RNEXT` is the numeric mate ref id, and `CIGAR` is nulled when
  * `MAPQ == 0` (fileops.py:270). CRAM is out of scope (reference
  * delegates to htslib codecs). */
object Bam {

  private val CigarOps = "MIDNSHP=X"
  private val SeqCode = "=ACMGRSVTWYHKDBN"

  val schema: StructType = StructType(Seq(
    StructField("qname", StringType), StructField("flag", LongType),
    StructField("rname", StringType), StructField("pos", LongType),
    StructField("mapq", LongType), StructField("cigar", StringType),
    StructField("rnext", LongType), StructField("pnext", LongType),
    StructField("tlen", LongType), StructField("seq", StringType),
    StructField("qual", StringType), StructField("tags", StringType)))

  case class HeaderInfo(text: String, refs: Vector[(String, Long)])

  /** Decompress just enough leading blocks to parse the BAM header. */
  def readHeader(path: String): HeaderInfo = {
    val raf = new RandomAccessFile(path, "r")
    try {
      var buf = Array.empty[Byte]
      var coff = 0L
      def need(n: Int): Unit =
        while (buf.length < n && coff < raf.length()) {
          val (data, clen) = Bgzf.readBlock(raf, coff)
          buf = buf ++ data
          coff += clen
        }
      need(12)
      val bb = () => ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
      require(bb().getInt(0) == 0x014D4142, s"$path: bad BAM magic") // "BAM\1"
      val lText = bb().getInt(4)
      need(8 + lText + 4)
      val headerText = new String(buf, 8, lText, "US-ASCII")
      var pos = 8 + lText
      val nRef = bb().getInt(pos); pos += 4
      val refs = Vector.newBuilder[(String, Long)]
      for (_ <- 0 until nRef) {
        need(pos + 4)
        val lName = bb().getInt(pos); pos += 4
        need(pos + lName + 4)
        val name = new String(buf, pos, lName - 1, "US-ASCII"); pos += lName
        val lRef = bb().getInt(pos) & 0xFFFFFFFFL; pos += 4
        refs += ((name, lRef))
      }
      HeaderInfo(headerText.takeWhile(_ != 0), refs.result())
    } finally raf.close()
  }

  // -------------------------------------------------------- .bai sidecar

  case class BaiRef(bins: Map[Int, Vector[Tabix.Chunk]], linear: Vector[Long])

  def readBai(path: String): Vector[BaiRef] = {
    val raf = new RandomAccessFile(path, "r")
    try {
      val all = new Array[Byte](raf.length().toInt)
      raf.readFully(all)
      val bb = ByteBuffer.wrap(all).order(ByteOrder.LITTLE_ENDIAN)
      require(bb.getInt == 0x01494142, s"$path: bad BAI magic") // "BAI\1"
      val nRef = bb.getInt
      Vector.tabulate(nRef) { _ =>
        val nBin = bb.getInt
        val bins = (0 until nBin).flatMap { _ =>
          val bin = bb.getInt
          val nChunk = bb.getInt
          val chunks = Vector.fill(nChunk)(Tabix.Chunk(bb.getLong, bb.getLong))
          // 37450 is the spec's unmapped-count pseudo-bin, not an interval bin
          if (bin == 37450) None else Some(bin -> chunks)
        }.toMap
        val nIntv = bb.getInt
        BaiRef(bins, Vector.fill(nIntv)(bb.getLong))
      }
    } finally raf.close()
  }

  def writeBai(path: String, refs: Seq[BaiRef]): Unit = {
    val b = new Bbi.Buf(ByteOrder.LITTLE_ENDIAN)
    b.u32(0x01494142L).u32(refs.size.toLong)
    refs.foreach { r =>
      b.u32(r.bins.size.toLong)
      r.bins.toSeq.sortBy(_._1).foreach { case (bin, chunks) =>
        b.u32(bin.toLong).u32(chunks.size.toLong)
        chunks.foreach(c => b.u64(c.beg).u64(c.end))
      }
      b.u32(r.linear.size.toLong)
      r.linear.foreach(b.u64)
    }
    val raf = new RandomAccessFile(path, "rw")
    try { raf.setLength(0); raf.write(b.toArray) } finally raf.close()
  }

  // ------------------------------------------------------ record codec

  /** Reference-consumed length from a CIGAR string (M/D/N/=/X). */
  def cigarRefLen(cigar: String): Long = {
    var i = 0; var n = 0L; var total = 0L
    while (i < cigar.length) {
      val c = cigar.charAt(i)
      if (c.isDigit) n = n * 10 + (c - '0')
      else {
        if ("MDN=X".indexOf(c) >= 0) total += n
        n = 0
      }
      i += 1
    }
    total
  }

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Decode the records in `bytes` (record-aligned, as .bai chunks are). */
  private[graft] def decodeRecords(bytes: Array[Byte],
      refNames: Map[Int, String]): Iterator[Row] = new Iterator[Row] {
    private val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def hasNext: Boolean = bb.remaining() >= 4
    def next(): Row = {
      val blockSize = bb.getInt
      val endPos = bb.position() + blockSize
      val refId = bb.getInt
      val pos = bb.getInt.toLong
      val lReadName = bb.get() & 0xFF
      val mapq = (bb.get() & 0xFF).toLong
      bb.getShort // bin
      val nCigar = bb.getShort & 0xFFFF
      val flag = (bb.getShort & 0xFFFF).toLong
      val lSeq = bb.getInt
      val nextRefId = bb.getInt
      val nextPos = bb.getInt.toLong
      val tlen = bb.getInt.toLong
      val nameBytes = new Array[Byte](lReadName); bb.get(nameBytes)
      val qname = new String(nameBytes, 0, lReadName - 1, "US-ASCII")
      val sb = new StringBuilder
      for (_ <- 0 until nCigar) {
        val op = bb.getInt
        sb.append(op >>> 4).append(CigarOps.charAt(op & 0xF))
      }
      val cigar = if (sb.isEmpty) null else sb.toString
      val seqBytes = new Array[Byte]((lSeq + 1) / 2); bb.get(seqBytes)
      val seq =
        if (lSeq == 0) null
        else {
          val s = new StringBuilder(lSeq)
          var i = 0
          while (i < lSeq) {
            val b = seqBytes(i / 2) & 0xFF
            s.append(SeqCode.charAt(if (i % 2 == 0) b >>> 4 else b & 0xF))
            i += 1
          }
          s.toString
        }
      val qualBytes = new Array[Byte](lSeq); bb.get(qualBytes)
      val qual =
        if (lSeq == 0 || (qualBytes.nonEmpty && qualBytes(0) == -1)) null
        else new String(qualBytes.map(q => (q + 33).toByte), "US-ASCII")
      // tags until record end, rendered as a JSON object like the
      // reference's json.dumps(dict(tags)) (fileops.py:260-263)
      val tags = new StringBuilder("{")
      var first = true
      while (bb.position() < endPos) {
        val tag = s"${bb.get().toChar}${bb.get().toChar}"
        val t = bb.get().toChar
        def jval(vt: Char): String = vt match {
          case 'A' => "\"" + jsonEscape(bb.get().toChar.toString) + "\""
          case 'c' => bb.get().toString
          case 'C' => (bb.get() & 0xFF).toString
          case 's' => bb.getShort.toString
          case 'S' => (bb.getShort & 0xFFFF).toString
          case 'i' => bb.getInt.toString
          case 'I' => (bb.getInt & 0xFFFFFFFFL).toString
          case 'f' => bb.getFloat.toString
          case 'Z' | 'H' =>
            val s = new StringBuilder
            var c = bb.get()
            while (c != 0) { s.append(c.toChar); c = bb.get() }
            "\"" + jsonEscape(s.toString) + "\""
          case 'B' =>
            val sub = bb.get().toChar
            val n = bb.getInt
            (0 until n).map(_ => jval(sub)).mkString("[", ", ", "]")
          case other => throw new IllegalStateException(s"bad tag type $other")
        }
        val v = jval(t)
        if (!first) tags.append(", ")
        tags.append("\"").append(tag).append("\": ").append(v)
        first = false
      }
      tags.append("}")
      bb.position(endPos)
      Row(qname, flag, refNames.getOrElse(refId, null), pos, mapq,
        if (mapq != 0L) cigar else null, // reference quirk fileops.py:270
        nextRefId.toLong, nextPos, tlen, seq, qual, tags.toString)
    }
  }

  // ------------------------------------------------------------- reading

  /** Read a BAM into the reference's 12-column relation; with a region,
    * only the .bai-named chunks are decompressed (distributed). */
  def read(spark: SparkSession, path: String, chrom: Option[String] = None,
           start: Option[Long] = None, end: Option[Long] = None,
           indexPath: Option[String] = None): DataFrame = {
    val header = readHeader(path)
    val bai = readBai(indexPath.getOrElse(path + ".bai"))
    val names = header.refs.zipWithIndex.map { case ((n, _), i) => i -> n }.toMap
    val qBeg = start.getOrElse(0L)
    val qEnd = end.getOrElse(Long.MaxValue >> 1)
    def chunksOf(r: Int, beg: Long, e: Long): Seq[Tabix.Chunk] = {
      val idx = Tabix.Index(Tabix.Bed, Vector(""),
        Vector(Tabix.RefIndex(bai(r).bins, bai(r).linear)))
      Tabix.queryChunks(idx, 0, beg, e)
    }
    val work: Seq[(Int, Long, Long)] = chrom match {
      case Some(c) =>
        val refId = header.refs.indexWhere(_._1 == c)
        if (refId < 0) Nil
        else chunksOf(refId, qBeg, qEnd).map(k => (refId, k.beg, k.end))
      case None =>
        bai.indices.flatMap { r =>
          val all = bai(r).bins.values.flatten.toVector.sortBy(_.beg)
          all.foldLeft(Vector.empty[Tabix.Chunk]) { (acc, c) =>
            acc.lastOption match {
              case Some(last) if c.beg <= last.end =>
                acc.init :+ Tabix.Chunk(last.beg, math.max(last.end, c.end))
              case _ => acc :+ c
            }
          }.map(k => (r, k.beg, k.end))
        }
    }
    val sc = spark.sparkContext
    val bn = sc.broadcast(names)
    val slices = math.max(1, math.min(work.size, sc.defaultParallelism))
    val rows = sc.parallelize(work, slices).flatMap { case (_, vb, ve) =>
      val raf = new RandomAccessFile(path, "r")
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => raf.close()))
      decodeRecords(Bgzf.readRange(raf, vb, ve), bn.value)
    }
    var df = spark.createDataFrame(rows, schema)
    chrom.foreach(c => df = df.filter(col("rname") === c))
    if (start.isDefined || end.isDefined) {
      val refLen = udfFreeRefLen(col("cigar"))
      start.foreach(s => df = df.filter(col("pos") + refLen > s))
      end.foreach(e => df = df.filter(col("pos") < e))
    }
    df
  }

  /** Reference-consumed CIGAR length as a codegen'd Column: sum of op
    * lengths whose op letter consumes reference (M/D/N/=/X), via
    * regexp extraction — no UDF. Null/absent CIGAR counts 1 base (the
    * record still occupies its position for overlap purposes). */
  private def udfFreeRefLen(cigar: org.apache.spark.sql.Column) =
    coalesce(aggregate(
      regexp_extract_all(cigar, lit("(\\d+)[MDN=X]"), lit(1)),
      lit(0L), (acc, x) => acc + x.cast("long")), lit(1L))

  // ------------------------------------------------------------- writing

  /** Write the 12-column relation as BAM + .bai. Unknown/absent fields
    * follow SAM conventions (`*` seq/qual → l_seq 0, qual 0xFF); the
    * `tags` column is NOT serialized (read-back yields `{}`) — auxiliary
    * tags are an output-side affordance in the reference too. Bounded
    * driver-side sink. */
  def write(df: DataFrame, path: String,
            chromSizes: Map[String, Long] = Map.empty,
            maxRows: Long = 1L << 24): Unit = {
    val cols = schema.fieldNames
    val prepared = df.select(cols.map(c => col(c)): _*)
      .orderBy(col("rname"), col("pos"))
    val rows = Bbi.collectGuarded(prepared, maxRows)
    val refNames = rows.map(_.getString(2)).filter(_ != null).distinct.sorted
    val refId = refNames.zipWithIndex.toMap
    val refs = refNames.map { c =>
      (c, chromSizes.getOrElse(c, rows.iterator
        .filter(r => r.getString(2) == c)
        .map(r => r.getLong(3) + math.max(1L,
          cigarRefLen(Option(r.getString(5)).getOrElse("")))).max))
    }
    val w = new Bgzf.Writer(path)
    val binChunks = scala.collection.mutable.LinkedHashMap
      .empty[Int, (scala.collection.mutable.Map[Int, Vector[Tabix.Chunk]],
        scala.collection.mutable.ArrayBuffer[Long])]
    try {
      // header block: magic, SAM text, refs
      val text = "@HD\tVN:1.6\tSO:coordinate\n" + refs.map { case (n, l) =>
        s"@SQ\tSN:$n\tLN:$l\n"
      }.mkString
      val hb = new Bbi.Buf(ByteOrder.LITTLE_ENDIAN)
      hb.u32(0x014D4142L).u32(text.length.toLong)
        .bytes(text.getBytes("US-ASCII"))
      hb.u32(refs.size.toLong)
      refs.foreach { case (n, l) =>
        hb.u32((n.length + 1).toLong).bytes((n + "\u0000").getBytes("US-ASCII"))
        hb.u32(l)
      }
      w.write(hb.toArray)
      rows.foreach { r =>
        val rname = r.getString(2)
        val rid = if (rname == null) -1 else refId(rname)
        val pos = r.getLong(3)
        val cigar = Option(r.getString(5)).getOrElse("")
        val qname = r.getString(0)
        val seq = Option(r.getString(9)).filter(_ != "*").getOrElse("")
        val qual = Option(r.getString(10)).filter(_ != "*").getOrElse("")
        val refLen = math.max(1L, cigarRefLen(cigar))
        val b = new Bbi.Buf(ByteOrder.LITTLE_ENDIAN)
        b.u32(rid.toLong).u32(pos)
        b.u8(qname.length + 1).u8(r.getLong(4).toInt)
        b.u16(Tabix.reg2bin(pos, pos + refLen))
        val cigOps = "(\\d+)([MIDNSHP=X])".r.findAllMatchIn(cigar).toSeq
        b.u16(cigOps.size)
        b.u16(r.getLong(1).toInt)
        b.u32(seq.length.toLong)
        b.u32(r.getLong(6)).u32(r.getLong(7)).u32(r.getLong(8))
        b.bytes((qname + "\u0000").getBytes("US-ASCII"))
        cigOps.foreach(m =>
          b.u32((m.group(1).toLong << 4) | CigarOps.indexOf(m.group(2).charAt(0))))
        var i = 0
        while (i < seq.length) {
          val hi = SeqCode.indexOf(seq.charAt(i).toUpper).max(0)
          val lo = if (i + 1 < seq.length)
            SeqCode.indexOf(seq.charAt(i + 1).toUpper).max(0) else 0
          b.u8((hi << 4) | lo)
          i += 2
        }
        if (seq.nonEmpty) {
          if (qual.isEmpty) (0 until seq.length).foreach(_ => b.u8(0xFF))
          else qual.foreach(q => b.u8(q - 33))
        }
        val payload = b.toArray
        val rec = new Bbi.Buf(ByteOrder.LITTLE_ENDIAN)
        rec.u32(payload.length.toLong).bytes(payload)
        if (rid >= 0) {
          val vb = w.tell
          w.write(rec.toArray)
          val ve = w.tell
          val bin = Tabix.reg2bin(pos, pos + refLen)
          val (bins, lin) = binChunks.getOrElseUpdate(rid,
            (scala.collection.mutable.Map.empty,
              scala.collection.mutable.ArrayBuffer.empty))
          val prev = bins.getOrElse(bin, Vector.empty)
          bins(bin) = prev.lastOption match {
            case Some(last) if last.end == vb => prev.init :+ Tabix.Chunk(last.beg, ve)
            case _ => prev :+ Tabix.Chunk(vb, ve)
          }
          val winLast = ((pos + refLen - 1) >> 14).toInt
          while (lin.size <= winLast) lin += 0L
          var wdx = (pos >> 14).toInt
          while (wdx <= winLast) {
            if (lin(wdx) == 0L || vb < lin(wdx)) lin(wdx) = vb
            wdx += 1
          }
        } else w.write(rec.toArray)
      }
    } finally w.close()
    val baiRefs = refNames.indices.map { r =>
      binChunks.get(r) match {
        case None => BaiRef(Map.empty, Vector.empty)
        case Some((bins, lin)) =>
          var last = 0L
          val filled = lin.map(v => if (v == 0L) last else { last = v; v })
          BaiRef(bins.toMap, filled.toVector)
      }
    }
    writeBai(path + ".bai", baiRefs)
  }
}
