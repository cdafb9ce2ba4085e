package graft

import java.io.ByteArrayInputStream

import org.apache.spark.sql.functions._

import graft.io.Warc

/** WARC/WET reader: record walk (headers, byte-exact blocks), gzip
  * multi-member decode, conversion filtering, and poison tolerance. */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def rec(tpe: String, uri: String, len: Option[Int],
                  body: Array[Byte]): Array[Byte] = {
    val h = new StringBuilder
    h ++= "WARC/1.0\r\n"
    h ++= s"WARC-Type: $tpe\r\n"
    if (uri != null) h ++= s"WARC-Target-URI: $uri\r\n"
    h ++= "WARC-Date: 2026-01-01T00:00:00Z\r\n"
    h ++= s"WARC-Record-ID: <urn:uuid:$tpe>\r\n"
    h ++= "Content-Type: text/plain\r\n"
    h ++= s"Content-Length: ${len.getOrElse(body.length)}\r\n\r\n"
    h.toString.getBytes("UTF-8") ++ body ++ "\r\n\r\n".getBytes("UTF-8")
  }

  test("parseRecords: headers, byte-exact block slicing, block content " +
      "with CRLFs does not confuse the walk") {
    val b1 = "first body".getBytes("UTF-8")
    val b2 = "crlf\r\ninside\r\n\r\nstill one block".getBytes("UTF-8")
    val bytes = rec("conversion", "u1", None, b1) ++
      rec("conversion", "u2", None, b2)
    val rs = Warc.parseRecords(new ByteArrayInputStream(bytes)).toList
    assert(rs.map(_.targetUri) == List("u1", "u2"))
    assert(rs(0).block.sameElements(b1))
    assert(rs(1).block.sameElements(b2))
    assert(rs.forall(_.warcType == "conversion"))
  }

  test("poison: a truncated final record yields the good prefix; a " +
      "record missing Content-Length ends the walk without throwing") {
    val good = rec("conversion", "ok", None, "fine".getBytes)
    val truncated = rec("conversion", "bad", Some(100), "short".getBytes)
    val rs = Warc.parseRecords(
      new ByteArrayInputStream(good ++ truncated)).toList
    assert(rs.map(_.targetUri) == List("ok"))
    val noLen = ("WARC/1.0\r\nWARC-Type: conversion\r\n\r\n").getBytes
    val rs2 = Warc.parseRecords(
      new ByteArrayInputStream(good ++ noLen)).toList
    assert(rs2.map(_.targetUri) == List("ok"))
  }

  test("UTF-8 header values: a multibyte WARC-Target-URI survives") {
    val uri = "http://例え.jp/ünïcode"
    val bytes = rec("conversion", uri, None, "body".getBytes("UTF-8"))
    val rs = Warc.parseRecords(new ByteArrayInputStream(bytes)).toList
    assert(rs.map(_.targetUri) == List(uri))
  }

  test("member index + readIndexed: one archive fans out over N>1 " +
      "tasks and equals the whole-file reader record for record") {
    val dir = java.nio.file.Files.createTempDirectory("warcidx").toString
    def gzip(b: Array[Byte]) = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    // 12 records, each its own gzip member (the Common Crawl layout);
    // member 5 carries a gzip FNAME field so the header walk's
    // optional-field paths are exercised
    val members = (0 until 12).map { i =>
      val raw = rec("conversion", s"http://m/$i", None,
        s"body $i ${"x" * (i * 13)}".getBytes("UTF-8"))
      if (i == 5) {
        val b = gzip(raw)
        // splice an FNAME: set FLG bit 3 and insert a zero-terminated
        // name after the 10-byte fixed header
        b(3) = (b(3) | 8).toByte
        b.take(10) ++ ("five.warc".getBytes("ISO-8859-1") :+ 0.toByte) ++
          b.drop(10)
      } else gzip(raw)
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/big.warc.gz"),
      members.flatten.toArray)
    val allRows = Warc.buildMemberIndex(spark, s"$dir/big.warc.gz")
      .orderBy("member_index")
      .as[(String, Int, Long, Long, Int, Boolean)].collect()
    val (summary, idxRows) = (allRows.head, allRows.tail)
    assert(idxRows.length == 12)
    assert(idxRows.forall(_._5 == 1), "one record per member")
    // offsets tile the file exactly
    val fileLen = new java.io.File(s"$dir/big.warc.gz").length()
    assert(idxRows.map(r => (r._3, r._4)).sliding(2).forall {
      case Array((o1, l1), (o2, _)) => o1 + l1 == o2
      case _ => true
    })
    assert(idxRows.last._3 + idxRows.last._4 == fileLen)
    // clean-walk summary row: all bytes accounted, 12 members, clean EOF
    assert(summary._2 == -1 && summary._3 == fileLen && summary._4 == 0L &&
      summary._5 == 12 && summary._6, s"bad summary $summary")
    val idx = Warc.buildMemberIndex(spark, s"$dir/big.warc.gz")
    val viaIndex = Warc.readIndexed(spark, idx, numTasks = 4)
    assert(viaIndex.rdd.getNumPartitions == 4)
    val whole = Warc.read(spark, s"$dir/big.warc.gz")
    assert(viaIndex.exceptAll(whole).isEmpty &&
      whole.exceptAll(viaIndex).isEmpty)
    assert(viaIndex.count() == 12)
  }

  test("member index surfaces mid-archive corruption: truncation " +
      "summary row, clean prefix still readable") {
    val dir = java.nio.file.Files.createTempDirectory("warccorrupt").toString
    def gzip(b: Array[Byte]) = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    val members = (0 until 8).map(i => gzip(
      rec("conversion", s"http://c/$i", None, s"body $i".getBytes("UTF-8"))))
    val clean = members.take(5)
    val cleanLen = clean.map(_.length.toLong).sum
    // member 5's gzip magic smashed: the walk must stop THERE and the
    // summary row must carry the unaccounted tail, not read as complete
    val corrupted = members(5).clone()
    corrupted(0) = 0x00
    val bytes = clean.flatMap(_.toSeq) ++ corrupted.toSeq ++
      members.drop(6).flatMap(_.toSeq)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/bad.warc.gz"), bytes.toArray)
    val fileLen = new java.io.File(s"$dir/bad.warc.gz").length()
    val idx = Warc.buildMemberIndex(spark, s"$dir/bad.warc.gz")
    val summary = idx.filter($"member_index" === -1)
      .as[(String, Int, Long, Long, Int, Boolean)].head()
    assert(!summary._6, "corrupt archive must NOT report clean_eof")
    assert(summary._3 == cleanLen, "bytes cleanly indexed = clean prefix")
    assert(summary._4 == fileLen - cleanLen && summary._4 > 0,
      "unaccounted tail bytes must be visible")
    assert(summary._5 == 5, "five clean members before the corruption")
    // the clean prefix is still readable through the index
    val recs = Warc.readIndexed(spark, idx, numTasks = 2)
    assert(recs.count() == 5)
  }

  test("read fail-fasts on a file past the whole-file byte limit with " +
      "a message naming the indexed reader") {
    val dir = java.nio.file.Files.createTempDirectory("warcbig").toString
    // a sparse file LOOKS huge to the listing without costing disk
    val f = new java.io.RandomAccessFile(s"$dir/huge.warc", "rw")
    f.setLength(Warc.MaxWholeFileBytes + 1)
    f.close()
    val e = intercept[IllegalArgumentException] {
      Warc.read(spark, s"$dir/huge.warc")
    }
    assert(e.getMessage.contains("readIndexed"))
  }

  test("read + readWet over files: gzip multi-member, conversion " +
      "filter, UTF-8 decode") {
    val dir = java.nio.file.Files.createTempDirectory("warcspec").toString
    val plain = rec("warcinfo", null, None, "sw: x\r\n".getBytes) ++
      rec("conversion", "http://p/1", None, "plain text é".getBytes("UTF-8"))
    // two SEPARATE gzip members concatenated — the Common Crawl layout
    def gzip(b: Array[Byte]) = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    val gzBytes = gzip(rec("conversion", "http://g/1", None,
      "member one".getBytes)) ++
      gzip(rec("conversion", "http://g/2", None, "member two".getBytes))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/a.wet"), plain)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/b.wet.gz"), gzBytes)
    val all = Warc.read(spark, s"$dir/*")
    assert(all.count() == 4)
    val wet = Warc.readWet(spark, s"$dir/*")
      .select($"target_uri", $"text").as[(String, String)].collect().toMap
    assert(wet == Map(
      "http://p/1" -> "plain text é",
      "http://g/1" -> "member one",
      "http://g/2" -> "member two"))
    // record_index is per file, counting every record type
    val idx = Warc.read(spark, s"$dir/a.wet")
      .select($"warc_type", $"record_index").as[(String, Int)]
      .collect().toMap
    assert(idx == Map("warcinfo" -> 0, "conversion" -> 1))
  }
}
