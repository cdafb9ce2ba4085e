package graft.io

import java.io.RandomAccessFile
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tabix — region-indexed bgzip'd TSV (the format the reference reads via
  * pysam, `io/fileops.py:163-217`; published as Li 2011 and SAM spec
  * §5.1.3): the data file is BGZF-compressed text and the `.tbi` sidecar
  * is the UCSC 5-level binning index plus a 16 kb linear index over
  * virtual offsets.
  *
  * Scale shape mirrors [[BigWig]]: the driver reads only the (small)
  * `.tbi`; a region query resolves to record-aligned chunk ranges which
  * decompress DISTRIBUTED, each task inflating just its blocks. The
  * writer is a bounded driver-side sink (single compressed file +
  * sidecar) that emits both the BGZF data and the index. */
object Tabix {

  /** `.tbi` header knobs (SAM spec table): `format` low bits 0=generic,
    * 1=SAM, 2=VCF; flag 0x10000 = coordinates are BED-style 0-based
    * half-open. Columns are 1-based; `colEnd == 0` means "no end column"
    * (end = beg + 1). */
  case class Config(format: Int, colSeq: Int, colBeg: Int, colEnd: Int,
                    meta: Char = '#', skip: Int = 0) {
    def zeroBased: Boolean = (format & 0x10000) != 0
  }
  val Bed = Config(0x10000, 1, 2, 3)
  val Gff = Config(0, 1, 4, 5)
  val Vcf = Config(2, 1, 2, 0)

  case class Chunk(beg: Long, end: Long)
  case class RefIndex(bins: Map[Int, Vector[Chunk]], linear: Vector[Long])
  case class Index(config: Config, names: Vector[String],
                   refs: Vector[RefIndex])

  // ------------------------------------------------- UCSC binning scheme

  /** Smallest bin fully containing [beg, end) (SAM spec reg2bin). */
  def reg2bin(beg: Long, end0: Long): Int = {
    val end = end0 - 1
    if (beg >> 14 == end >> 14) (4681 + (beg >> 14)).toInt
    else if (beg >> 17 == end >> 17) (585 + (beg >> 17)).toInt
    else if (beg >> 20 == end >> 20) (73 + (beg >> 20)).toInt
    else if (beg >> 23 == end >> 23) (9 + (beg >> 23)).toInt
    else if (beg >> 26 == end >> 26) (1 + (beg >> 26)).toInt
    else 0
  }

  /** All bins overlapping [beg, end) (SAM spec reg2bins). */
  def reg2bins(beg: Long, end0: Long): Seq[Int] = {
    val end = end0 - 1
    val out = Vector.newBuilder[Int]
    out += 0
    (1 + (beg >> 26) to 1 + (end >> 26)).foreach(b => out += b.toInt)
    (9 + (beg >> 23) to 9 + (end >> 23)).foreach(b => out += b.toInt)
    (73 + (beg >> 20) to 73 + (end >> 20)).foreach(b => out += b.toInt)
    (585 + (beg >> 17) to 585 + (end >> 17)).foreach(b => out += b.toInt)
    (4681 + (beg >> 14) to 4681 + (end >> 14)).foreach(b => out += b.toInt)
    out.result()
  }

  // --------------------------------------------------------- .tbi codec

  def readIndex(path: String): Index = {
    val bb = ByteBuffer.wrap(Bgzf.readAll(path)).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.getInt == 0x01494254, s"$path: bad tabix magic") // "TBI\1"
    val nRef = bb.getInt
    val config = Config(bb.getInt, bb.getInt, bb.getInt, bb.getInt,
      bb.getInt.toChar, bb.getInt)
    val lNm = bb.getInt
    val nameBytes = new Array[Byte](lNm); bb.get(nameBytes)
    val names = new String(nameBytes, "US-ASCII").split('\u0000')
      .toVector.filter(_.nonEmpty)
    val refs = Vector.tabulate(nRef) { _ =>
      val nBin = bb.getInt
      val bins = (0 until nBin).map { _ =>
        val bin = bb.getInt
        val nChunk = bb.getInt
        bin -> Vector.fill(nChunk)(Chunk(bb.getLong, bb.getLong))
      }.toMap
      val nIntv = bb.getInt
      RefIndex(bins, Vector.fill(nIntv)(bb.getLong))
    }
    Index(config, names, refs)
  }

  def writeIndex(path: String, idx: Index): Unit = {
    val b = new Bbi.Buf(ByteOrder.LITTLE_ENDIAN)
    b.u32(0x01494254L).u32(idx.refs.size.toLong)
    b.u32(idx.config.format.toLong).u32(idx.config.colSeq.toLong)
      .u32(idx.config.colBeg.toLong).u32(idx.config.colEnd.toLong)
      .u32(idx.config.meta.toLong).u32(idx.config.skip.toLong)
    val nm = idx.names.map(_ + "\u0000").mkString.getBytes("US-ASCII")
    b.u32(nm.length.toLong).bytes(nm)
    idx.refs.foreach { r =>
      b.u32(r.bins.size.toLong)
      r.bins.toSeq.sortBy(_._1).foreach { case (bin, chunks) =>
        b.u32(bin.toLong).u32(chunks.size.toLong)
        chunks.foreach(c => b.u64(c.beg).u64(c.end))
      }
      b.u32(r.linear.size.toLong)
      r.linear.foreach(b.u64)
    }
    val w = new Bgzf.Writer(path)
    try w.write(b.toArray) finally w.close()
  }

  // ------------------------------------------------------------- reading

  /** (beg, end) of a parsed line under `config`, half-open 0-based. */
  private def lineInterval(fields: Array[String], c: Config): (Long, Long) = {
    val rawBeg = fields(c.colBeg - 1).toLong
    val beg = if (c.zeroBased) rawBeg else rawBeg - 1
    val end =
      if (c.colEnd == 0 || c.colEnd > fields.length) beg + 1
      else if (c.zeroBased) fields(c.colEnd - 1).toLong
      else fields(c.colEnd - 1).toLong
    (beg, end)
  }

  /** The binning scheme's coordinate ceiling (2^29): bin enumeration for
    * open-ended queries clamps here instead of walking 2^46 bins. */
  val MaxCoord: Long = 1L << 29

  /** Chunk ranges to decompress for a region, pruned by the linear index
    * and coalesced when adjacent. */
  def queryChunks(idx: Index, refId: Int, beg0: Long, end0: Long): Seq[Chunk] = {
    val ref = idx.refs(refId)
    val beg = math.min(beg0, MaxCoord - 1)
    val end = math.max(beg + 1, math.min(end0, MaxCoord))
    val minLin =
      if (ref.linear.isEmpty) 0L
      else ref.linear((beg >> 14).toInt.min(ref.linear.size - 1))
    val raw = reg2bins(beg, end).flatMap(ref.bins.get).flatten
      .filter(_.end > minLin)
      .sortBy(_.beg)
    raw.foldLeft(Vector.empty[Chunk]) { (acc, c) =>
      acc.lastOption match {
        case Some(last) if c.beg <= last.end =>
          acc.init :+ Chunk(last.beg, math.max(last.end, c.end))
        case _ => acc :+ c
      }
    }
  }

  /** Read a tabix-indexed file into a DataFrame. With a region, only the
    * chunks the index names are decompressed (distributed, one task per
    * chunk group); without one, every indexed record streams out. The
    * optional `schema` preset types columns via [[Schemas]]; otherwise
    * columns come back as the index's generic `c1..cn` strings. */
  def read(spark: SparkSession, path: String, chrom: Option[String] = None,
           start: Option[Long] = None, end: Option[Long] = None,
           schema: Option[String] = None,
           indexPath: Option[String] = None): DataFrame = {
    val idx = readIndex(indexPath.getOrElse(path + ".tbi"))
    val qBeg = start.getOrElse(0L)
    val qEnd = end.getOrElse(Long.MaxValue >> 1)
    val work: Seq[(Int, Seq[Chunk])] = chrom match {
      case Some(c) =>
        val refId = idx.names.indexOf(c)
        if (refId < 0) Nil
        else Seq(refId -> queryChunks(idx, refId, qBeg, qEnd))
      case None =>
        // full scan: every chunk of every bin, coalesced — no bin walk
        idx.refs.indices.map { r =>
          val all = idx.refs(r).bins.values.flatten.toVector.sortBy(_.beg)
          r -> all.foldLeft(Vector.empty[Chunk]) { (acc, c) =>
            acc.lastOption match {
              case Some(last) if c.beg <= last.end =>
                acc.init :+ Chunk(last.beg, math.max(last.end, c.end))
              case _ => acc :+ c
            }
          }
        }
    }
    val flat = work.flatMap { case (r, cs) => cs.map(c => (r, c.beg, c.end)) }
    val cfg = idx.config
    val sc = spark.sparkContext
    val slices = math.max(1, math.min(flat.size, sc.defaultParallelism))
    val lines = sc.parallelize(flat, slices).flatMap { case (_, vb, ve) =>
      val raf = new RandomAccessFile(path, "r")
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => raf.close()))
      val text = new String(Bgzf.readRange(raf, vb, ve), "UTF-8")
      text.split('\n').iterator.filter(_.nonEmpty)
        .filterNot(_.startsWith(cfg.meta.toString))
        .filter { l =>
          val f = l.split('\t')
          chrom.forall(f(cfg.colSeq - 1) == _) && {
            val (b, e) = lineInterval(f, cfg)
            b < qEnd && e > qBeg
          }
        }
    }
    import spark.implicits._
    val ds = spark.createDataset(lines)
    val reader = spark.read.option("sep", "\t").option("nullValue", ".")
    schema match {
      case Some(name) => reader.schema(Schemas(name)).csv(ds)
      case None => reader.csv(ds)
    }
  }

  // ------------------------------------------------------------- writing

  /** Write `df` as a BGZF TSV + `.tbi` sidecar. Rows are sorted by
    * (chrom-first-appearance? no — name order) then begin; the index
    * records one chunk per maximal run of consecutive records per bin.
    * Bounded driver-side sink — see [[Bbi.collectGuarded]]. */
  def write(df: DataFrame, path: String, config: Config = Bed,
            maxRows: Long = 1L << 24,
            headerLines: Seq[String] = Nil): Unit = {
    val cols = df.columns
    require(cols.length >= math.max(config.colSeq,
      math.max(config.colBeg, math.max(config.colEnd, 1))),
      "fewer columns than the tabix config addresses")
    require(headerLines.forall(_.startsWith(config.meta.toString)),
      s"header lines must start with the meta char '${config.meta}'")
    val tsv = Bbi.collectGuarded(
      df.select(concat_ws("\t", cols.map(c => col(c).cast("string")): _*)
          .as("line"),
        col(cols(config.colSeq - 1)).cast("string").as("__c"),
        col(cols(config.colBeg - 1)).cast("long").as("__b"))
        .orderBy(col("__c"), col("__b")), maxRows)
      .map(r => (r.getString(0), r.getString(1)))
    val w = new Bgzf.Writer(path)
    val names = Vector.newBuilder[String]
    var seen = Set.empty[String]
    val perRef = scala.collection.mutable.LinkedHashMap
      .empty[String, (scala.collection.mutable.Map[Int, Vector[Chunk]],
        scala.collection.mutable.ArrayBuffer[Long])]
    try {
      // header lines precede the first indexed record: no chunk ever
      // addresses them, and the in-chunk meta filter is belt-and-braces
      headerLines.foreach(h => w.write((h + "\n").getBytes("UTF-8")))
      tsv.foreach { case (line, chromName) =>
        if (!seen(chromName)) { seen += chromName; names += chromName }
        val vb = w.tell
        w.write((line + "\n").getBytes("UTF-8"))
        val ve = w.tell
        val f = line.split('\t')
        val (b, e) = lineInterval(f, config)
        val bin = reg2bin(b, e)
        val (bins, lin) = perRef.getOrElseUpdate(chromName,
          (scala.collection.mutable.Map.empty, scala.collection.mutable.ArrayBuffer.empty))
        val prev = bins.getOrElse(bin, Vector.empty)
        bins(bin) = prev.lastOption match {
          case Some(last) if last.end == vb =>
            prev.init :+ Chunk(last.beg, ve)
          case _ => prev :+ Chunk(vb, ve)
        }
        val winLast = ((e - 1) >> 14).toInt
        while (lin.size <= winLast) lin += 0L
        var wdx = (b >> 14).toInt
        while (wdx <= winLast) {
          if (lin(wdx) == 0L || vb < lin(wdx)) lin(wdx) = vb
          wdx += 1
        }
      }
    } finally w.close()
    val nameSeq = names.result()
    val refs = nameSeq.map { c =>
      val (bins, lin) = perRef(c)
      // htslib-style fill: empty windows inherit the previous offset
      var last = 0L
      val filled = lin.map { v =>
        if (v == 0L) last else { last = v; v }
      }.toVector
      RefIndex(bins.toMap, filled)
    }
    writeIndex(path + ".tbi", Index(config, nameSeq, refs))
  }
}
