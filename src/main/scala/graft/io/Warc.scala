package graft.io

import java.io.{BufferedInputStream, ByteArrayInputStream, EOFException,
  InputStream}
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC / WET reader (ISO 28500 Web ARChive format — the container
  * Common Crawl ships, i.e. the de-facto source format of web-scale
  * pretraining corpora). From-scratch record walk over `java.util.zip`
  * only, same pure-JVM posture as the BGZF/BAM/BBI codecs.
  *
  * Format (public spec): a WARC file is a concatenation of records;
  * each record is a version line `WARC/1.x`, CRLF-terminated named
  * header lines, an empty line, exactly `Content-Length` bytes of
  * block, and a CRLF CRLF separator. `.warc.gz`/`.wet.gz` files are
  * concatenated gzip members (usually one per record), which
  * `GZIPInputStream` decodes transparently as one stream.
  *
  * Distribution model: a WARC file is NOT splittable without an
  * external index (records are variable-length and, in .gz form,
  * member boundaries are unknown), so the task unit is one file —
  * exactly how Common Crawl is laid out (~1 GB segment files, tens of
  * thousands per crawl): parallelism comes from the file count, which
  * is what a 100 TB crawl gives you (~100k files >> cores). The scan
  * side uses Spark's `binaryFile` source, so predicate pushdown on
  * path/size and the usual file listing parallelism apply; per-record
  * poison (malformed header, truncated block) ends that FILE's
  * iteration at the last good record, never the task.
  */
object Warc {

  val recordSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("record_index", IntegerType),
    StructField("record_id", StringType),
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType),
    StructField("block", BinaryType)))

  /** One parsed record: WARC headers of interest + the raw block. */
  final case class Rec(recordId: String, warcType: String, targetUri: String,
                       date: String, contentType: String, length: Long,
                       block: Array[Byte])

  private def readLine(in: InputStream): String = {
    val sb = new java.lang.StringBuilder(96)
    var c = in.read()
    if (c < 0) throw new EOFException
    while (c >= 0 && c != '\n') {
      if (c != '\r') sb.append(c.toChar)
      c = in.read()
    }
    sb.toString
  }

  private def readFully(in: InputStream, n: Long): Array[Byte] = {
    require(n <= Int.MaxValue, s"block of $n bytes")
    val out = new Array[Byte](n.toInt)
    var off = 0
    while (off < n) {
      val r = in.read(out, off, n.toInt - off)
      if (r < 0) throw new EOFException
      off += r
    }
    out
  }

  /** Sequential record walk over a (decompressed) WARC byte stream.
    * Malformed input ends the iteration at the last good record —
    * poison never throws out of the iterator. */
  def parseRecords(in0: InputStream): Iterator[Rec] = new Iterator[Rec] {
    private val in = new BufferedInputStream(in0, 1 << 16)
    private var nextRec: Rec = null
    private var done = false

    private def advance(): Unit = {
      if (done) return
      try {
        // skip inter-record CRLFs to the next version line
        var line = readLine(in)
        while (line.isEmpty) line = readLine(in)
        if (!line.startsWith("WARC/")) { done = true; return }
        var id = ""; var tpe = ""; var uri = ""; var date = ""
        var ctype = ""; var len = -1L
        var h = readLine(in)
        while (h.nonEmpty) {
          val i = h.indexOf(':')
          if (i > 0) {
            val k = h.substring(0, i).trim.toLowerCase
            val v = h.substring(i + 1).trim
            k match {
              case "warc-record-id" => id = v
              case "warc-type" => tpe = v
              case "warc-target-uri" => uri = v
              case "warc-date" => date = v
              case "content-type" => ctype = v
              case "content-length" => len = v.toLong
              case _ => ()
            }
          }
          h = readLine(in)
        }
        if (len < 0) { done = true; return }
        val block = readFully(in, len)
        nextRec = Rec(id, tpe, uri, date, ctype, len, block)
      } catch { case _: Exception => done = true }
    }

    override def hasNext: Boolean = {
      if (nextRec == null && !done) advance()
      nextRec != null
    }
    override def next(): Rec = {
      if (!hasNext) throw new NoSuchElementException
      val r = nextRec; nextRec = null; r
    }
  }

  private def maybeGunzip(bytes: Array[Byte]): InputStream = {
    val raw = new ByteArrayInputStream(bytes)
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f &&
        (bytes(1) & 0xff) == 0x8b)
      new GZIPInputStream(raw, 1 << 16) // multi-member: reads them all
    else raw
  }

  /** All records of every WARC(.gz) file under `path` —
    * [[recordSchema]], one task per file (see the class doc for why
    * that is the right distribution unit for this format). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val bin = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
    bin.mapPartitions { rows =>
      rows.flatMap { r =>
        val p = r.getString(0)
        parseRecords(maybeGunzip(r.getAs[Array[Byte]](1))).zipWithIndex
          .map { case (rec, i) =>
            Row(p, i, rec.recordId, rec.warcType, rec.targetUri, rec.date,
              rec.contentType, rec.length, rec.block)
          }
      }
    }(Encoders.row(recordSchema))
  }

  /** WET convenience view: the `conversion` records (extracted plain
    * text) decoded as UTF-8 — `(path, record_index, target_uri,
    * warc_date, text)`. The warcinfo/request/response records a full
    * WARC carries are filtered out, so this is the "give me the page
    * texts" reader a curation pipeline starts from. */
  def readWet(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
      .filter(col("warc_type") === "conversion")
      .select(col("path"), col("record_index"), col("target_uri"),
        col("warc_date"),
        decode(col("block"), "UTF-8").as("text"))
}
