package graft.io

import java.io.RandomAccessFile

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pairix-style 2D region queries over bgzip'd pairs files (the reference
  * reads them via pypairix, `io/fileops.py:183-235`: `query2D` plus
  * `#columns`/`#chromsize` header handling). pypairix's trick is indexing
  * the combined `chrom1|chrom2` key with 1D binning on `pos1` and
  * filtering `pos2` per record; this does the same over the engine's own
  * [[Tabix]] index container (sidecar `.px2t`). The on-disk data file is
  * a standard 4DN `.pairs` BGZF text file; the sidecar is this engine's
  * format (no external px2 files can exist in the sandbox to be
  * byte-compatible with — same round-trip posture as the other binary
  * formats).
  *
  * Coordinates: `.pairs` positions are 1-based points; query ranges here
  * are 0-based half-open over `pos-1`, matching the reference's
  * `parse_region` inputs. */
object Pairix {

  /** 1-based column positions of the pair coordinates (4DN `.pairs`
    * order: readID chrom1 pos1 chrom2 pos2 ...). */
  case class Cols(chrom1: Int, pos1: Int, chrom2: Int, pos2: Int)
  val PairsCols: Cols = Cols(2, 3, 4, 5)

  private def key(c1: String, c2: String) = s"$c1|$c2"

  /** Leading `#` header lines (driver-side, first blocks only). */
  def headerLines(path: String): Seq[String] = {
    val raf = new RandomAccessFile(path, "r")
    try {
      val out = Vector.newBuilder[String]
      var coff = 0L
      var done = false
      var carry = ""
      while (!done && coff < raf.length()) {
        val (data, clen) = Bgzf.readBlock(raf, coff)
        coff += clen
        if (data.isEmpty) done = true
        else {
          val text = carry + new String(data, "UTF-8")
          val parts = text.split("\n", -1)
          carry = parts.last
          parts.dropRight(1).foreach { l =>
            if (l.startsWith("#")) out += l else done = true
          }
        }
      }
      out.result().takeWhile(_.startsWith("#"))
    } finally raf.close()
  }

  /** Column names from a `#columns:` header line, if present. */
  def headerColumns(path: String): Option[Seq[String]] =
    headerLines(path).find(_.startsWith("#columns:"))
      .map(_.stripPrefix("#columns:").trim.split("\\s+").toSeq)

  /** Write a pairs relation as BGZF text + `.px2t` 2D index. Header lines
    * (`#columns:` is generated from the schema) are written first and are
    * not indexed. Bounded driver-side sink. */
  def write(df: DataFrame, path: String, cols: Cols = PairsCols,
            extraHeader: Seq[String] = Nil, maxRows: Long = 1L << 24): Unit = {
    val names = df.columns
    val c1 = col(names(cols.chrom1 - 1)).cast("string")
    val p1 = col(names(cols.pos1 - 1)).cast("long")
    val c2 = col(names(cols.chrom2 - 1)).cast("string")
    val rows = Bbi.collectGuarded(
      df.select(
        concat_ws("\t", names.map(c => col(c).cast("string")): _*).as("line"),
        concat(c1, lit("|"), c2).as("__k"), p1.as("__p"))
        .orderBy(col("__k"), col("__p")), maxRows)
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val w = new Bgzf.Writer(path)
    val keyNames = Vector.newBuilder[String]
    var seen = Set.empty[String]
    val perKey = scala.collection.mutable.LinkedHashMap
      .empty[String, (scala.collection.mutable.Map[Int, Vector[Tabix.Chunk]],
        scala.collection.mutable.ArrayBuffer[Long])]
    try {
      (Seq("## pairs format v1.0",
        "#columns: " + names.mkString(" ")) ++ extraHeader)
        .foreach(h => w.write((h + "\n").getBytes("UTF-8")))
      rows.foreach { case (line, k, pos1) =>
        if (!seen(k)) { seen += k; keyNames += k }
        val vb = w.tell
        w.write((line + "\n").getBytes("UTF-8"))
        val ve = w.tell
        val beg = pos1 - 1 // 1-based point -> 0-based [beg, beg+1)
        val bin = Tabix.reg2bin(beg, beg + 1)
        val (bins, lin) = perKey.getOrElseUpdate(k,
          (scala.collection.mutable.Map.empty,
            scala.collection.mutable.ArrayBuffer.empty))
        val prev = bins.getOrElse(bin, Vector.empty)
        bins(bin) = prev.lastOption match {
          case Some(last) if last.end == vb => prev.init :+ Tabix.Chunk(last.beg, ve)
          case _ => prev :+ Tabix.Chunk(vb, ve)
        }
        val win = (beg >> 14).toInt
        while (lin.size <= win) lin += 0L
        if (lin(win) == 0L || vb < lin(win)) lin(win) = vb
      }
    } finally w.close()
    val nameSeq = keyNames.result()
    val refs = nameSeq.map { k =>
      val (bins, lin) = perKey(k)
      var last = 0L
      val filled = lin.map(v => if (v == 0L) last else { last = v; v })
      Tabix.RefIndex(bins.toMap, filled.toVector)
    }
    Tabix.writeIndex(path + ".px2t",
      Tabix.Index(Tabix.Config(0x10000, cols.chrom1, cols.pos1, 0),
        nameSeq, refs))
  }

  /** 2D region query (`query2D`): block key `chrom1|chrom2`, `pos1` range
    * through the index, `pos2` range filtered per record. `region2`
    * defaults to `region1` like the reference. Columns are named from the
    * `#columns:` header when present. */
  def read(spark: SparkSession, path: String,
           chrom1: String, start1: Long, end1: Long,
           chrom2: Option[String] = None, start2: Option[Long] = None,
           end2: Option[Long] = None,
           cols: Cols = PairsCols): DataFrame = {
    val idx = Tabix.readIndex(path + ".px2t")
    val (qc2, qs2, qe2) =
      (chrom2.getOrElse(chrom1), start2.getOrElse(start1), end2.getOrElse(end1))
    val refId = idx.names.indexOf(key(chrom1, qc2))
    val chunks =
      if (refId < 0) Nil
      else Tabix.queryChunks(idx, refId, start1, end1)
    val flat = chunks.map(c => (c.beg, c.end))
    val sc = spark.sparkContext
    val slices = math.max(1, math.min(flat.size, sc.defaultParallelism))
    val lines = sc.parallelize(flat, slices).flatMap { case (vb, ve) =>
      val raf = new RandomAccessFile(path, "r")
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => raf.close()))
      val text = new String(Bgzf.readRange(raf, vb, ve), "UTF-8")
      text.split('\n').iterator.filter(_.nonEmpty).filterNot(_.startsWith("#"))
        .filter { l =>
          val f = l.split('\t')
          val b1 = f(cols.pos1 - 1).toLong - 1
          val b2 = f(cols.pos2 - 1).toLong - 1
          f(cols.chrom1 - 1) == chrom1 && f(cols.chrom2 - 1) == qc2 &&
            b1 >= start1 && b1 < end1 && b2 >= qs2 && b2 < qe2
        }
    }
    import spark.implicits._
    val reader = spark.read.option("sep", "\t")
    // schema from the #columns header keeps the shape stable even when
    // the query matches nothing (a schemaless csv of zero rows would
    // otherwise surface as a zero-COLUMN relation)
    headerColumns(path) match {
      case Some(ns) =>
        reader.schema(org.apache.spark.sql.types.StructType(ns.map(n =>
            org.apache.spark.sql.types.StructField(n,
              org.apache.spark.sql.types.StringType))))
          .csv(spark.createDataset(lines))
      case _ => reader.csv(spark.createDataset(lines))
    }
  }
}
