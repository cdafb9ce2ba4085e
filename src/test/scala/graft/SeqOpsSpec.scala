package graft

import graft.seq.SeqOps
import org.apache.spark.sql.functions._

/** Sequence-store operators (reference `extras.py:170-355`). */
class SeqOpsSpec extends SparkSpec {
  import spark.implicits._

  // chr1 = "ACGTACGTNN" + "GATCGATCGG" (20 bp, chunked at 8 to force
  // boundary-spanning slices and a cross-chunk GATC at offset 14..18)
  private def fastaFile: String = {
    val p = java.nio.file.Files.createTempFile("graft-seq", ".fa")
    java.nio.file.Files.writeString(p,
      ">chr1 description to strip\nACGTACGT\nNNGATCGA\nTCGG\n>chr2\nGGGG\n")
    p.toString
  }

  test("readFasta chunks records with headers stripped") {
    val chunks = SeqOps.readFasta(spark, fastaFile, chunkSize = 8)
    assertFrame(chunks.select($"chrom", $"cstart", $"cend", $"seq"), Seq(
      Seq("chr1", 0L, 8L, "ACGTACGT"), Seq("chr1", 8L, 16L, "NNGATCGA"),
      Seq("chr1", 16L, 20L, "TCGG"), Seq("chr2", 0L, 4L, "GGGG")),
      "chrom", "cstart", "cend", "seq")
  }

  test("readFasta guards the driver parse with a size cap that points at " +
    "the persisted-parquet path") {
    val e = intercept[IllegalArgumentException] {
      SeqOps.readFasta(spark, fastaFile, maxBytes = 10L)
    }
    assert(e.getMessage.contains("parquet"))
    // at/under the cap parses normally
    assert(SeqOps.readFasta(spark, fastaFile, chunkSize = 8,
      maxBytes = 1L << 20).count() == 4)
  }

  test("seq_gc / frac_gc / frac_mapped match hand-computed values " +
    "(extras.py:220-355)") {
    val chunks = SeqOps.readFasta(spark, fastaFile, chunkSize = 8)
    // interval [4,12) = "ACGT" + "NNGA": 4 mapped-ignored N=2, gc=3 (C,G,G)
    val iv = Seq(("chr1", 4L, 12L)).toDF("chrom", "start", "end")
    val gc = SeqOps.fracGc(iv, chunks, mappedOnly = true, binSize = 4)
      .select($"frac_gc").head.getDouble(0)
    assert(math.abs(gc - 3.0 / 6.0) < 1e-12)
    val gcAll = SeqOps.fracGc(iv, chunks, mappedOnly = false, binSize = 4)
      .select($"frac_gc").head.getDouble(0)
    assert(math.abs(gcAll - 3.0 / 8.0) < 1e-12)
    val mapped = SeqOps.fracMapped(iv, chunks, binSize = 4)
      .select($"frac_mapped").head.getDouble(0)
    assert(math.abs(mapped - 6.0 / 8.0) < 1e-12)
    // pure-N interval: frac_gc null under mappedOnly
    val nOnly = Seq(("chr1", 8L, 10L)).toDF("chrom", "start", "end")
    assert(SeqOps.fracGc(nOnly, chunks, binSize = 4)
      .select($"frac_gc").head.isNullAt(0))
  }

  test("digest splits at sites incl. chunk-boundary matches " +
    "(extras.py:170-218)") {
    val chunks = SeqOps.readFasta(spark, fastaFile, chunkSize = 8)
    // chr1 GATC at 10 and (cross-chunk 14..18) 14; cuts at match starts
    val frags = SeqOps.digest(chunks, "GATC", cutOffset = 0, bucketSize = 8)
    assertFrame(frags.filter($"chrom" === "chr1"), Seq(
      Seq("chr1", 0L, 10L), Seq("chr1", 10L, 14L), Seq("chr1", 14L, 20L)),
      "chrom", "start", "end")
    // chr2 has no site -> one whole fragment
    assertFrame(frags.filter($"chrom" === "chr2"), Seq(Seq("chr2", 0L, 4L)),
      "chrom", "start", "end")
  }
}
