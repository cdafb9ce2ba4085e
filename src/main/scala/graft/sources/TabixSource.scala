package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.io.{Bgzf, Schemas, Tabix}

/** DataSource V2 connector over the engine's tabix container: makes a
  * BGZF + `.tbi` pair a first-class Spark table —
  * `spark.read.format("tabix").load(path)` — instead of a function-call
  * reader ([[graft.io.Tables.readTabix]] stays for the
  * region-argument ergonomics; both share [[Tabix]]'s codec).
  *
  * The Spark-first part is pushdown: Catalyst hands the scan its
  * predicates and required columns, and
  *  - an `EqualTo` on the sequence column plus range bounds on the
  *    begin/end columns become a tabix REGION QUERY — planning reads
  *    only the sidecar index on the driver and emits one input
  *    partition per coalesced chunk run, so executors touch only the
  *    BGZF blocks the index names (`.explain` shows the accepted
  *    predicates under `PushedFilters`, enforced exactly in the reader
  *    so Spark does not re-evaluate them);
  *  - `pruneColumns` narrows parsing to the projected fields
  *    (`ReadSchema` shrinks accordingly).
  *
  * Schema comes from `option("preset", ...)` ([[Schemas]] — bed3..bed12,
  * bedGraph, gff, vcf, ...) or `option("ddl", "chrom string, ...")`.
  * Coordinate conventions follow the index's embedded [[Tabix.Config]]
  * (0-based BED vs 1-based GFF/VCF), exactly like the function reader.
  */
class TabixSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "tabix"

  private def schemaFor(options: CaseInsensitiveStringMap): StructType =
    Option(options.get("ddl")).map(StructType.fromDDL).orElse(
      Option(options.get("preset")).map(Schemas(_))).getOrElse(
      throw new IllegalArgumentException(
        "tabix source needs option(\"preset\", <schema preset>) or " +
          "option(\"ddl\", <schema DDL>)"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    schemaFor(options)

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = Option(opts.get("path")).getOrElse(
      throw new IllegalArgumentException("tabix source needs a load path"))
    new TabixTable(path, Option(opts.get("index")), schema)
  }
}

private[graft] class TabixTable(path: String, indexPath: Option[String],
                                  tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"tabix:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val sb = new TabixScanBuilder(path, indexPath, tableSchema)
    Option(options.get("region")).foreach(sb.seedRegion)
    sb
  }
}

private[graft] class TabixScanBuilder(path: String,
                                        indexPath: Option[String],
                                        tableSchema: StructType)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  // driver-side: header + binning index only, never data blocks
  private val idx = Tabix.readIndex(indexPath.getOrElse(path + ".tbi"))
  private val cfg = idx.config

  private def fieldName(pos1: Int): Option[String] =
    if (pos1 >= 1 && pos1 <= tableSchema.length)
      Some(tableSchema(pos1 - 1).name) else None
  private val seqField = fieldName(cfg.colSeq)
  private val begField = fieldName(cfg.colBeg)
  private val endField = fieldName(cfg.colEnd)
  // GFF/VCF-style 1-based begin vs BED 0-based half-open: the index's
  // query space is 0-based half-open, so 1-based begin columns shift by
  // -1 (the Tabix.lineInterval rule; end columns carry over unshifted).
  private val oneBased = !cfg.zeroBased

  private var chrom: Option[String] = None
  private var qBeg: Long = 0L
  private var qEnd: Long = Tabix.MaxCoord
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = tableSchema

  /** Seed the region from an `option("region", "chr1:1,000-2M")` load
    * option (the engine's UCSC grammar, [[graft.core.Region]]) — the
    * ergonomic twin of the Catalyst-predicate path; both compose (the
    * intersection wins). Called by [[TabixTable]]. */
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

  // Saturating coordinate shift: accepted filters are not re-evaluated
  // by Spark, so a Long.MaxValue/MinValue wrap would silently invert the
  // region into an empty query (see BbiSource for the same guard).
  private def satAdd(v: Long, d: Long): Long = {
    val r = v + d
    if (d > 0 && r < v) Long.MaxValue
    else if (d < 0 && r > v) Long.MinValue else r
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition {
      case EqualTo(a, v: String) if seqField.contains(a) &&
        (chrom.isEmpty || chrom.contains(v)) => chrom = Some(v); true
      // interval-overlap bounds in the file's coordinate convention;
      // translated to the index's 0-based half-open query space
      case LessThan(a, v) if begField.contains(a) && asLong(v).isDefined =>
        val x = satAdd(asLong(v).get, if (oneBased) -1L else 0L)
        qEnd = math.min(qEnd, x); true
      case LessThanOrEqual(a, v) if begField.contains(a) && asLong(v).isDefined =>
        val x = satAdd(asLong(v).get, if (oneBased) 0L else 1L)
        qEnd = math.min(qEnd, x); true
      case GreaterThan(a, v) if endField.contains(a) && asLong(v).isDefined =>
        qBeg = math.max(qBeg, asLong(v).get); true
      case GreaterThanOrEqual(a, v) if endField.contains(a) && asLong(v).isDefined =>
        qBeg = math.max(qBeg, satAdd(asLong(v).get, -1L)); true
      // Catalyst's implied null guards: every record the reader emits has
      // a parsed (seq, beg, end) triple — the index is built on them —
      // so these hold by format and accepting them keeps the post-scan
      // Filter from pinning the coordinate columns into the read schema.
      case org.apache.spark.sql.sources.IsNotNull(a)
        if seqField.contains(a) || begField.contains(a) ||
          endField.contains(a) => true
      case _ => false
    }
    accepted = ok
    rest
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new TabixScan(path, indexPath, tableSchema, required, idx,
      chrom, qBeg, qEnd, accepted)
}

private[graft] class TabixScan(path: String, indexPath: Option[String],
                                 tableSchema: StructType,
                                 required: StructType, idx: Tabix.Index,
                                 chrom: Option[String], qBeg: Long, qEnd: Long,
                                 accepted: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"tabix $path region=${chrom.getOrElse("*")}:[$qBeg,$qEnd) " +
      s"pushed=[${accepted.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val work: Seq[Tabix.Chunk] = chrom match {
      case Some(c) =>
        val refId = idx.names.indexOf(c)
        if (refId < 0) Nil else Tabix.queryChunks(idx, refId, qBeg, qEnd)
      case None =>
        idx.refs.indices.flatMap { r =>
          val all = idx.refs(r).bins.values.flatten.toVector.sortBy(_.beg)
          all.foldLeft(Vector.empty[Tabix.Chunk]) { (acc, c) =>
            acc.lastOption match {
              case Some(last) if c.beg <= last.end =>
                acc.init :+ Tabix.Chunk(last.beg, math.max(last.end, c.end))
              case _ => acc :+ c
            }
          }
        }
    }
    work.map(c => TabixPartition(c.beg, c.end): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    TabixReaderFactory(path, tableSchema.json, required.fieldNames,
      idx.config, chrom, qBeg, qEnd)
}

private[graft] case class TabixPartition(vBeg: Long, vEnd: Long)
    extends InputPartition

private[graft] case class TabixReaderFactory(
    path: String, schemaJson: String, requiredNames: Array[String],
    cfg: Tabix.Config, chrom: Option[String], qBeg: Long, qEnd: Long)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TabixPartition]
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    // (source field position, target slot, type) for the pruned projection
    val proj: Array[(Int, Int, DataType)] = requiredNames.zipWithIndex.map {
      case (n, slot) => (schema.fieldIndex(n), slot, schema(n).dataType)
    }
    new PartitionReader[InternalRow] {
      private val raf = new java.io.RandomAccessFile(path, "r")
      private val lines: Iterator[String] = {
        val text = new String(Bgzf.readRange(raf, p.vBeg, p.vEnd), "UTF-8")
        text.split('\n').iterator.filter(_.nonEmpty)
          .filterNot(_.startsWith(cfg.meta.toString))
      }
      private var row: InternalRow = _

      // exactly Tabix.lineInterval: 1-based begin shifts by -1, end
      // (when present) carries over, no-end records span one position
      private def interval(f: Array[String]): (Long, Long) = {
        val rawBeg = f(cfg.colBeg - 1).toLong
        val b = if (cfg.zeroBased) rawBeg else rawBeg - 1
        val e = if (cfg.colEnd == 0 || cfg.colEnd > f.length) b + 1
                else f(cfg.colEnd - 1).toLong
        (b, e)
      }

      override def next(): Boolean = {
        row = null
        while (row == null && lines.hasNext) {
          val f = lines.next().split('\t')
          val inRegion = chrom.forall(f(cfg.colSeq - 1) == _) && {
            val (b, e) = interval(f)
            b < qEnd && e > qBeg
          }
          if (inRegion) {
            val out = new GenericInternalRow(proj.length)
            proj.foreach { case (src, slot, dt) =>
              val raw = if (src < f.length) f(src) else "."
              out.update(slot, if (raw == "." || raw.isEmpty) null
                else dt match {
                  case StringType  => UTF8String.fromString(raw)
                  case LongType    => java.lang.Long.valueOf(raw.toLong)
                  case IntegerType => java.lang.Integer.valueOf(raw.toInt)
                  case DoubleType  => java.lang.Double.valueOf(raw.toDouble)
                  case FloatType   => java.lang.Float.valueOf(raw.toFloat)
                  case t => throw new IllegalArgumentException(
                    s"tabix source: unsupported column type ${t.catalogString}")
                })
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
