package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.io.{Bbi, BigBed, BigWig}

/** DataSource V2 connectors for the BBI container family — the
  * [[TabixSource]] posture applied to the binary signal formats:
  * `spark.read.format("bigwig")` yields (chrom, start, end, value),
  * `format("bigbed")` yields (chrom, start, end, rest). The ScanBuilder
  * parses only the header + chrom B+ tree + R-tree on the driver;
  * region predicates (chrom equality + begin/end bounds, BBI is 0-based
  * half-open) prune R-tree leaf blocks BEFORE any data byte is read,
  * and each input partition decodes a run of leaf blocks on an
  * executor. Accepted predicates are enforced exactly in the reader
  * (unclipped overlapping runs — the reference fetch shape), and
  * `pruneColumns` narrows the emitted rows.
  */
sealed abstract class BbiSourceBase extends TableProvider
    with DataSourceRegister {
  protected def magic: Int
  protected def fixedSchema: StructType

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    fixedSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = Option(opts.get("path")).getOrElse(
      throw new IllegalArgumentException(
        s"${shortName()} source needs a load path"))
    new BbiTable(path, magic, fixedSchema, shortName())
  }
}

class BigWigSource extends BbiSourceBase {
  override def shortName(): String = "bigwig"
  override protected def magic: Int = Bbi.BigWigMagic
  override protected val fixedSchema: StructType = StructType(Seq(
    StructField("chrom", StringType), StructField("start", LongType),
    StructField("end", LongType), StructField("value", DoubleType)))
}

class BigBedSource extends BbiSourceBase {
  override def shortName(): String = "bigbed"
  override protected def magic: Int = Bbi.BigBedMagic
  override protected val fixedSchema: StructType = StructType(Seq(
    StructField("chrom", StringType), StructField("start", LongType),
    StructField("end", LongType), StructField("rest", StringType)))
}

private[graft] class BbiTable(path: String, magic: Int,
                              tableSchema: StructType, fmt: String)
    extends Table with SupportsRead {
  override def name(): String = s"$fmt:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val sb = new BbiScanBuilder(path, magic, tableSchema, fmt)
    Option(options.get("region")).foreach(sb.seedRegion)
    sb
  }
}

private[graft] class BbiScanBuilder(path: String, magic: Int,
                                    tableSchema: StructType, fmt: String)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  // driver-side: header + chrom tree + R-tree only, never data blocks
  private val meta = Bbi.readMeta(path, magic)

  private var chrom: Option[String] = None
  private var qBeg: Long = 0L
  private var qEnd: Long = Long.MaxValue
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = tableSchema

  /** Seed the region from an `option("region", "chr1:1,000-2M")` load
    * option (the [[graft.core.Region]] UCSC grammar); composes with the
    * Catalyst-predicate path — the intersection wins. */
  private[sources] def seedRegion(spec: String): this.type = {
    val r = graft.core.Region.parseString(spec)
    chrom = Some(r.chrom)
    r.start.foreach(s => qBeg = math.max(qBeg, s))
    r.end.foreach(e => qEnd = math.min(qEnd, e))
    this
  }

  private def asLong(v: Any): Option[Long] = v match {
    case i: Int => Some(i.toLong)
    case l: Long => Some(l)
    case s: Short => Some(s.toLong)
    case _ => None
  }

  // Saturating +-1: an accepted filter is NOT re-evaluated by Spark, so
  // a wrap at Long.MaxValue/MinValue would silently invert the region
  // into an empty query instead of a degenerate-but-correct one.
  private def satAdd(v: Long, d: Long): Long = {
    val r = v + d
    if (d > 0 && r < v) Long.MaxValue
    else if (d < 0 && r > v) Long.MinValue else r
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition {
      case EqualTo("chrom", v: String)
        if chrom.isEmpty || chrom.contains(v) => chrom = Some(v); true
      // BBI coordinates are 0-based half-open — bounds carry over directly
      case LessThan("start", v) if asLong(v).isDefined =>
        qEnd = math.min(qEnd, asLong(v).get); true
      case LessThanOrEqual("start", v) if asLong(v).isDefined =>
        qEnd = math.min(qEnd, satAdd(asLong(v).get, 1)); true
      case GreaterThan("end", v) if asLong(v).isDefined =>
        qBeg = math.max(qBeg, asLong(v).get); true
      case GreaterThanOrEqual("end", v) if asLong(v).isDefined =>
        qBeg = math.max(qBeg, satAdd(asLong(v).get, -1)); true
      // every decoded record carries all four fields — null guards hold
      // by format, and accepting them keeps pruning effective
      case IsNotNull(a) if tableSchema.fieldNames.contains(a) => true
      case _ => false
    }
    accepted = ok
    rest
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new BbiScan(path, meta, required, fmt, chrom, qBeg, qEnd, accepted)
}

private[graft] class BbiScan(path: String, meta: Bbi.Meta,
                             required: StructType, fmt: String,
                             chrom: Option[String], qBeg: Long, qEnd: Long,
                             accepted: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"$fmt $path region=${chrom.getOrElse("*")}:[$qBeg,$qEnd) " +
      s"pushed=[${accepted.mkString(", ")}]"

  private val byName = meta.chroms.map(c => c._2 -> c._1).toMap
  private val cid: Option[Int] = chrom.map(c => byName.getOrElse(c, -1))

  override def planInputPartitions(): Array[InputPartition] = {
    val blocks = cid match {
      case None => meta.blocks
      case Some(-1) => Nil
      case Some(ix) => Bbi.pruneBlocks(meta.blocks, ix, qBeg, qEnd)
    }
    if (blocks.isEmpty) return Array.empty
    val slices = math.max(1, math.min(blocks.size,
      SparkSession.active.sparkContext.defaultParallelism))
    val per = (blocks.size + slices - 1) / slices
    blocks.grouped(per)
      .map(g => BbiPartition(g.map(b => (b.offset, b.size)).toArray)
        : InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    BbiReaderFactory(path, fmt == "bigwig", meta.header.bigEndian,
      meta.header.uncompressBufSize,
      meta.chroms.map(c => c._1 -> c._2).toMap,
      cid, qBeg, qEnd, required.fieldNames)
}

private[graft] case class BbiPartition(extents: Array[(Long, Long)])
    extends InputPartition

private[graft] case class BbiReaderFactory(
    path: String, isWig: Boolean, bigEndian: Boolean, bufHint: Int,
    names: Map[Int, String], cid: Option[Int], qBeg: Long, qEnd: Long,
    requiredNames: Array[String]) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[BbiPartition]
    // slot -> source field: 0 chrom, 1 start, 2 end, 3 payload
    val proj: Array[Int] = requiredNames.map {
      case "chrom" => 0
      case "start" => 1
      case "end" => 2
      case _ => 3
    }
    new PartitionReader[InternalRow] {
      private val raf = new java.io.RandomAccessFile(path, "r")
      private val compressed = bufHint > 0
      private val records: Iterator[(Int, Long, Long, Any)] =
        p.extents.iterator.flatMap { case (off, size) =>
          val raw = new Array[Byte](size.toInt)
          raf.seek(off); raf.readFully(raw)
          val bytes = if (compressed) Bbi.inflate(raw, bufHint) else raw
          if (isWig) BigWig.decodeSections(bytes, bigEndian)
            .map { case (c, s, e, v) => (c, s, e, v: Any) }
          else BigBed.decodeSections(bytes, bigEndian)
            .map { case (c, s, e, r) => (c, s, e, r: Any) }
        }
      private var row: InternalRow = _

      override def next(): Boolean = {
        row = null
        while (row == null && records.hasNext) {
          val (c, s, e, payload) = records.next()
          if (cid.forall(_ == c) && s < qEnd && e > qBeg) {
            val out = new GenericInternalRow(proj.length)
            var i = 0
            while (i < proj.length) {
              out.update(i, proj(i) match {
                case 0 => UTF8String.fromString(names(c))
                case 1 => java.lang.Long.valueOf(s)
                case 2 => java.lang.Long.valueOf(e)
                case _ => payload match {
                  case d: Double => java.lang.Double.valueOf(d)
                  case r: String => UTF8String.fromString(r)
                }
              })
              i += 1
            }
            row = out
          }
        }
        row != null
      }

      override def get(): InternalRow = row
      override def close(): Unit = raf.close()
    }
  }
}
