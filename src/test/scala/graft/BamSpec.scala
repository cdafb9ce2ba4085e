package graft

import graft.io.Bam
import org.apache.spark.sql.functions._

/** BAM codec + .bai index semantics, same posture as the BBI/tabix specs:
  * structural pins of the published record layout plus full read-back
  * equality (no external samtools exists in the sandbox). */
class BamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_bam").toString
    s"$d/$name"
  }

  private def sample = Seq(
    ("r1", 0L, "chr1", 100L, 60L, "50M", -1L, -1L, 0L, "ACGTN", "IIII#", "{}"),
    ("r2", 16L, "chr1", 500L, 30L, "10M5D10M", -1L, -1L, 0L, null: String,
      null: String, "{}"),
    ("r3", 0L, "chr2", 10L, 7L, "8M", -1L, -1L, 0L, "GATTACAA", null: String,
      "{}"))
    .toDF("qname", "flag", "rname", "pos", "mapq", "cigar", "rnext", "pnext",
      "tlen", "seq", "qual", "tags")

  test("BAM round-trips records, header refs, seq/qual encodings") {
    val p = tmp("rt.bam")
    Bam.write(sample, p)
    val h = Bam.readHeader(p)
    assert(h.refs.map(_._1) == Vector("chr1", "chr2"))
    assert(h.text.contains("@SQ\tSN:chr1"))
    assertFrame(Bam.read(spark, p), rowsOf(sample),
      "qname", "flag", "rname", "pos", "mapq", "cigar", "rnext", "pnext",
      "tlen", "seq", "qual", "tags")
  }

  test("region queries resolve through .bai and use CIGAR reference " +
    "length for overlap (50M at 100 covers [100,150))") {
    val p = tmp("q.bam")
    Bam.write(sample, p)
    val hit = Bam.read(spark, p, Some("chr1"), Some(140L), Some(160L))
    assert(hit.select("qname").as[String].collect().toSeq == Seq("r1"))
    // past the read end: no hit
    assert(Bam.read(spark, p, Some("chr1"), Some(150L), Some(400L)).isEmpty)
    // the 10M5D10M read consumes 25 reference bases
    assert(Bam.cigarRefLen("10M5D10M") == 25L)
    assert(Bam.read(spark, p, Some("chr1"), Some(520L), Some(521L))
      .select("qname").as[String].collect().toSeq == Seq("r2"))
    assert(Bam.read(spark, p, Some("nope")).isEmpty)
  }

  test("MAPQ=0 nulls CIGAR on read (reference fileops.py:270 parity)") {
    val p = tmp("mq0.bam")
    Bam.write(Seq(("r0", 0L, "chr1", 5L, 0L, "10M", -1L, -1L, 0L,
      null: String, null: String, "{}"))
      .toDF("qname", "flag", "rname", "pos", "mapq", "cigar", "rnext",
        "pnext", "tlen", "seq", "qual", "tags"), p)
    val row = Bam.read(spark, p).head()
    assert(row.getAs[Any]("cigar") == null && row.getAs[Long]("mapq") == 0L)
  }

  test("auxiliary tag block decodes to the reference's JSON dict shape") {
    // hand-built record: block_size + fixed fields + name 'x\0' + tags
    // NM:i:5, MD:Z:10A5, XB:B:c,[1,-2]
    val b = java.nio.ByteBuffer.allocate(256)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(0) // placeholder block_size
    b.putInt(0).putInt(42) // refID, pos
    b.put(2.toByte).put(60.toByte).putShort(0.toShort) // l_name, mapq, bin
    b.putShort(0.toShort).putShort(0.toShort) // n_cigar, flag
    b.putInt(0) // l_seq
    b.putInt(-1).putInt(-1).putInt(0) // next_ref, next_pos, tlen
    b.put('x'.toByte).put(0.toByte)
    b.put('N'.toByte).put('M'.toByte).put('i'.toByte).putInt(5)
    b.put('M'.toByte).put('D'.toByte).put('Z'.toByte)
      .put("10A5".getBytes("US-ASCII")).put(0.toByte)
    b.put('X'.toByte).put('B'.toByte).put('B'.toByte).put('c'.toByte)
      .putInt(2).put(1.toByte).put((-2).toByte)
    val len = b.position()
    b.putInt(0, len - 4)
    val rec = java.util.Arrays.copyOf(b.array(), len)
    val row = Bam.decodeRecords(rec, Map(0 -> "chr1")).next()
    assert(row.getString(0) == "x") // qname
    assert(row.getString(11) ==     // tags
      """{"NM": 5, "MD": "10A5", "XB": [1, -2]}""")
  }
}
