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

  test("intervals entirely off the sequence store cover nothing: " +
    "frac_mapped 0.0, frac_gc null (sf1 regression: broadcast-branch " +
    "left-join miss must not count end-start as covered)") {
    val chunks = SeqOps.readFasta(spark, fastaFile, chunkSize = 8)
    // beyond chr1's 20 bp, plus a chrom absent from the store; both the
    // broadcast path (tiny store => Auto resolves BroadcastRight) and an
    // on-genome control in one relation
    val iv = Seq(("chr1", 100L, 140L), ("chr9", 0L, 10L), ("chr1", 4L, 12L))
      .toDF("chrom", "start", "end")
    val fm = SeqOps.fracMapped(iv, chunks, binSize = 4)
      .select($"chrom", $"start", $"frac_mapped").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> Option(r.get(2))).toMap
    assert(fm(("chr1", 100L)) == Some(0.0))
    assert(fm(("chr9", 0L)) == Some(0.0))
    assert(fm(("chr1", 4L)).exists(v =>
      math.abs(v.asInstanceOf[Double] - 6.0 / 8.0) < 1e-12))
    val fg = SeqOps.fracGc(iv, chunks, binSize = 4)
      .select($"chrom", $"start", $"frac_gc").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> Option(r.get(2))).toMap
    assert(fg(("chr1", 100L)).isEmpty)
    assert(fg(("chr9", 0L)).isEmpty)
  }

  // the reference suite's own two-record genome (tests/test_data/test.fa
  // + test.chrom.sizes): chrTESTX "AtGcN" (5 bp), chrTEST2 "NGATCNN" (7 bp)
  private def refFastaFile: String = {
    val p = java.nio.file.Files.createTempFile("graft-ref", ".fa")
    java.nio.file.Files.writeString(p, ">chrTESTX\nAtGcN\n>chrTEST2\nNGATCNN\n")
    p.toString
  }

  test("reference test.fa parity: binnify bin counts " +
    "(tests/test_extras.py:70-82)") {
    val cs = Seq(("chrTESTX", 5L), ("chrTEST2", 7L)).toDF("chrom", "length")
    assert(graft.ops.Extras.binnify(cs, 7L).count() == 2)  // max size: 1/chrom
    assert(graft.ops.Extras.binnify(cs, 5L).count() == 3)  // min size: len+1
    assert(graft.ops.Extras.binnify(cs, 1L).count() == 12) // sum of lengths
  }

  test("reference test.fa parity: frac_mapped at binsize 1/5/7 " +
    "(tests/test_extras.py:96-126)") {
    val cs = Seq(("chrTESTX", 5L), ("chrTEST2", 7L)).toDF("chrom", "length")
    val chunks = SeqOps.readFasta(spark, refFastaFile, chunkSize = 4)
    def fm(binsize: Long): Map[(String, Long), Double] =
      SeqOps.fracMapped(graft.ops.Extras.binnify(cs, binsize), chunks,
        binSize = 4)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3))
        .toMap
    assert(fm(1L) == Map(
      ("chrTESTX", 0L) -> 1.0, ("chrTESTX", 1L) -> 1.0, ("chrTESTX", 2L) -> 1.0,
      ("chrTESTX", 3L) -> 1.0, ("chrTESTX", 4L) -> 0.0,
      ("chrTEST2", 0L) -> 0.0, ("chrTEST2", 1L) -> 1.0, ("chrTEST2", 2L) -> 1.0,
      ("chrTEST2", 3L) -> 1.0, ("chrTEST2", 4L) -> 1.0, ("chrTEST2", 5L) -> 0.0,
      ("chrTEST2", 6L) -> 0.0))
    assert(fm(5L) == Map(("chrTESTX", 0L) -> 0.8, ("chrTEST2", 0L) -> 0.8,
      ("chrTEST2", 5L) -> 0.0))
    assert(fm(7L) == Map(("chrTESTX", 0L) -> 0.8, ("chrTEST2", 0L) -> 4.0 / 7))
  }

  test("reference test.fa parity: frac_gc mapped_only true/false; " +
    "all-N bin is null only under mapped_only (tests/test_extras.py:128-191)") {
    val cs = Seq(("chrTESTX", 5L), ("chrTEST2", 7L)).toDF("chrom", "length")
    val chunks = SeqOps.readFasta(spark, refFastaFile, chunkSize = 4)
    def fg(binsize: Long, mappedOnly: Boolean): Map[(String, Long), Option[Double]] =
      SeqOps.fracGc(graft.ops.Extras.binnify(cs, binsize), chunks,
        mappedOnly = mappedOnly, binSize = 4)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // mapped_only=True ignores N; an interval of only N is NaN -> null here
    assert(fg(5L, mappedOnly = true) == Map(
      ("chrTESTX", 0L) -> Some(0.5), ("chrTEST2", 0L) -> Some(0.5),
      ("chrTEST2", 5L) -> None))
    assert(fg(7L, mappedOnly = true) == Map(
      ("chrTESTX", 0L) -> Some(0.5), ("chrTEST2", 0L) -> Some(0.5)))
    // mapped_only=False counts N in the denominator; the all-N bin is 0
    assert(fg(5L, mappedOnly = false) == Map(
      ("chrTESTX", 0L) -> Some(0.4), ("chrTEST2", 0L) -> Some(0.4),
      ("chrTEST2", 5L) -> Some(0.0)))
    assert(fg(7L, mappedOnly = false) == Map(
      ("chrTESTX", 0L) -> Some(0.4), ("chrTEST2", 0L) -> Some(2.0 / 7)))
  }

  test("reference seq_gc scalar table (tests/test_extras.py:193-206)") {
    val rows = Seq("AT", "NNN", "NGnC", "GTCA", "nnnNgTCa").toDF("s")
      .select(SeqOps.seqGc(col("s")).as("m"),
        SeqOps.seqGc(col("s"), mappedOnly = false).as("a"))
      .collect()
    assert(rows(0).getDouble(0) == 0.0)           // "AT"
    assert(rows(1).isNullAt(0))                   // "NNN" -> NaN there, null here
    assert(rows(2).getDouble(0) == 1.0)           // "NGnC"
    assert(rows(3).getDouble(0) == 0.5)           // "GTCA"
    assert(rows(4).getDouble(1) == 0.25)          // "nnnNgTCa", mapped_only=False
  }

  test("reference digest parity: DpnII boundary lands at Biopython " +
    "search()+1 (tests/test_extras.py:84-93 asserts chrTEST2 end==3)") {
    val chunks = SeqOps.readFasta(spark, refFastaFile, chunkSize = 4)
    // reference cut coordinate = 0-based site start + enzyme.fst5 + 2;
    // DpnII (^GATC, fst5=0) on NGATCNN: site at 1 -> boundary 3
    val dpn = SeqOps.digest(chunks, "GATC", cutOffset = 2, bucketSize = 4)
    assertFrame(dpn, Seq(Seq("chrTESTX", 0L, 5L),
      Seq("chrTEST2", 0L, 3L), Seq("chrTEST2", 3L, 7L)),
      "chrom", "start", "end")
    // HindIII (A^AGCTT): no sites in either record -> shapes unchanged
    val hind = SeqOps.digest(chunks, "AAGCTT", cutOffset = 3, bucketSize = 4)
    assertFrame(hind, Seq(Seq("chrTESTX", 0L, 5L), Seq("chrTEST2", 0L, 7L)),
      "chrom", "start", "end")
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

  test("enzyme-name digest matches the explicit site+offset call " +
    "(extras.py:188-201 name resolution)") {
    val chunks = SeqOps.readFasta(spark, refFastaFile, chunkSize = 4)
    val byName = SeqOps.digest(chunks, "DpnII")
    val explicit = SeqOps.digest(chunks, "GATC", cutOffset = 2)
    assert(rowsOf(byName) == rowsOf(explicit))
    // case-insensitive, and MboI is an isoschizomer of DpnII
    assert(rowsOf(SeqOps.digest(chunks, "mboi")) == rowsOf(explicit))
    val e = intercept[IllegalArgumentException](SeqOps.digest(chunks, "NoSuchZyme"))
    assert(e.getMessage.contains("Unknown enzyme name"))
  }

  test("IUPAC-N sites and the Arima cocktail cut at both enzymes' sites") {
    // seq: GACTC has HinfI site GANTC at 0 (boundary 0+3=3, interior);
    //      GATC at 6 (DpnII boundary 6+2=8)
    val df = Seq(("chrA", 0L, 11L, "GACTCAGATCA")).toDF("chrom", "cstart", "cend", "seq")
    assertFrame(SeqOps.digest(df, "HinfI"),
      Seq(Seq("chrA", 0L, 3L), Seq("chrA", 3L, 11L)), "chrom", "start", "end")
    assertFrame(SeqOps.digest(df, "Arima"),
      Seq(Seq("chrA", 0L, 3L), Seq("chrA", 3L, 8L), Seq("chrA", 8L, 11L)),
      "chrom", "start", "end")
    // N never matches past the end of the sequence: site starting at the
    // last base is out of bounds, not a wildcard hit
    val tail = Seq(("chrB", 0L, 5L, "AGANT")).toDF("chrom", "cstart", "cend", "seq")
    assertFrame(SeqOps.digest(tail, "HinfI"), Seq(Seq("chrB", 0L, 5L)),
      "chrom", "start", "end")
  }

  test("degenerate IUPAC classes match their base sets and nothing else") {
    // StyI CCWWGG (W = A|T, boundary site+4): CCAAGG and CCTTGG cut,
    // CCGGGG must not (G is outside W)
    val df = Seq(
      ("w1", 0L, 10L, "TCCAAGGTTT"),
      ("w2", 0L, 10L, "TCCTTGGTTT"),
      ("w3", 0L, 10L, "TCCGGGGTTT")).toDF("chrom", "cstart", "cend", "seq")
    assertFrame(SeqOps.digest(df, "StyI"),
      Seq(Seq("w1", 0L, 5L), Seq("w1", 5L, 10L),
        Seq("w2", 0L, 5L), Seq("w2", 5L, 10L),
        Seq("w3", 0L, 10L)),
      "chrom", "start", "end")
    // HincII GTYRAC (Y = C|T, R = A|G; boundary = site start + fst5+2 =
    // +5, the same reference search()+1 convention the DpnII parity
    // test pins): Y/R combinations cut, a non-Y third base does not
    val h = Seq(
      ("h1", 0L, 8L, "AGTCAACA"), ("h2", 0L, 8L, "AGTTGACA"),
      ("h3", 0L, 8L, "AGTAAACA")).toDF("chrom", "cstart", "cend", "seq")
    assertFrame(SeqOps.digest(h, "HincII"),
      Seq(Seq("h1", 0L, 6L), Seq("h1", 6L, 8L),
        Seq("h2", 0L, 6L), Seq("h2", 6L, 8L),
        Seq("h3", 0L, 8L)),
      "chrom", "start", "end")
    // degenerate site crossing a chunk boundary still cuts once
    val x = Seq(("cx", 0L, 4L, "AGTC"), ("cx", 4L, 8L, "AACA"))
      .toDF("chrom", "cstart", "cend", "seq")
    assertFrame(SeqOps.digest(x, "HincII"),
      Seq(Seq("cx", 0L, 6L), Seq("cx", 6L, 8L)), "chrom", "start", "end")
    // non-IUPAC site characters are rejected loudly
    val e = intercept[IllegalArgumentException] {
      SeqOps.digestSites(df, Seq(("GAXC", 2)))
    }
    assert(e.getMessage.contains("non-IUPAC"))
  }

  test("r14 catalog entries resolve with fst5+2 offsets (spot checks)") {
    // EcoRV GAT^ATC blunt: boundary site+5
    assertFrame(SeqOps.digest(
        Seq(("v", 0L, 10L, "TGATATCTTT")).toDF("chrom", "cstart", "cend", "seq"),
        "EcoRV"),
      Seq(Seq("v", 0L, 6L), Seq("v", 6L, 10L)), "chrom", "start", "end")
    // NotI GC^GGCCGC 8-cutter: boundary site+4
    assertFrame(SeqOps.digest(
        Seq(("n", 0L, 12L, "TGCGGCCGCTTT")).toDF("chrom", "cstart", "cend", "seq"),
        "NotI"),
      Seq(Seq("n", 0L, 5L), Seq("n", 5L, 12L)), "chrom", "start", "end")
    // BglI GCCNNNN^NGGC: interior N run, boundary site+9
    assertFrame(SeqOps.digest(
        Seq(("b", 0L, 14L, "TGCCAAAAAGGCTT")).toDF("chrom", "cstart", "cend", "seq"),
        "BglI"),
      Seq(Seq("b", 0L, 10L), Seq("b", 10L, 14L)), "chrom", "start", "end")
    // case-insensitive resolve + unknown name lists the catalog
    assert(graft.seq.Enzymes.resolve("ecorv") ==
      graft.seq.Enzymes.resolve("EcoRV"))
    val e = intercept[IllegalArgumentException](graft.seq.Enzymes.resolve("NopeI"))
    assert(e.getMessage.contains("Unknown enzyme"))
  }

  test("r15 catalog tranche: whole-catalog invariants + spot checks") {
    // every entry parses under the matcher's alphabet and its offset
    // stays within the engine convention's reachable band [0, len+2]
    // (fst5 ranges 0..len for type IIP cuts, so offset = fst5+2 must
    // land in [2, len+2]; the original r3 entries also allow 0)
    graft.seq.Enzymes.catalog.foreach { case (name, specs) =>
      specs.foreach { case (site, off) =>
        assert(site.nonEmpty && site.forall("ACGTNRYSWKMBDHV".contains(_)),
          s"$name site '$site' outside the IUPAC alphabet")
        assert(off >= 0 && off <= site.length + 2,
          s"$name offset $off outside [0, ${site.length + 2}]")
      }
    }
    // isoschizomers must carry identical cut specs
    for (group <- Seq(
        Seq("DpnII", "MboI", "Sau3AI"), Seq("CviQI", "Csp6I"),
        Seq("HpaII", "MspI"), Seq("XhoI", "PaeR7I"),
        Seq("MluCI", "Tsp509I"), Seq("XmaI", "TspMI"),
        Seq("ClaI", "BspDI"), Seq("AfeI" /* = Eco47III site */)))
      assert(group.map(graft.seq.Enzymes.resolve).distinct.size == 1,
        s"isoschizomers disagree: $group")
    // same site, different cut: the GGCGCC family must NOT collapse
    assert(Seq("KasI", "NarI", "SfoI", "PluTI")
      .map(graft.seq.Enzymes.resolve).distinct.size == 4)
    // TaqI T^CGA (fst5=1 -> boundary site+3)
    assertFrame(SeqOps.digest(
        Seq(("t", 0L, 8L, "ATCGATTT")).toDF("chrom", "cstart", "cend", "seq"),
        "TaqI"),
      Seq(Seq("t", 0L, 4L), Seq("t", 4L, 8L)), "chrom", "start", "end")
    // MluCI ^AATT (fst5=0 -> boundary site+2, the DpnII-class shift)
    assertFrame(SeqOps.digest(
        Seq(("m", 0L, 8L, "GAATTCGG")).toDF("chrom", "cstart", "cend", "seq"),
        "MluCI"),
      Seq(Seq("m", 0L, 3L), Seq("m", 3L, 8L)), "chrom", "start", "end")
    // BstXI CCANNNNNN^TGG: 6-N interior run, boundary site+10
    assertFrame(SeqOps.digest(
        Seq(("x", 0L, 15L, "TCCAGGGGGGTGGAA"))
          .toDF("chrom", "cstart", "cend", "seq"),
        "BstXI"),
      Seq(Seq("x", 0L, 11L), Seq("x", 11L, 15L)), "chrom", "start", "end")
    // SgrAI CR^CCGGYG: R/Y degenerate 8-cutter, boundary site+4;
    // CACCGGTG cuts (R=A, Y=T), CTCCGGTG must not (T outside R)
    assertFrame(SeqOps.digest(
        Seq(("s1", 0L, 10L, "TCACCGGTGT"), ("s2", 0L, 10L, "TCTCCGGTGT"))
          .toDF("chrom", "cstart", "cend", "seq"),
        "SgrAI"),
      Seq(Seq("s1", 0L, 5L), Seq("s1", 5L, 10L), Seq("s2", 0L, 10L)),
      "chrom", "start", "end")
  }
}
