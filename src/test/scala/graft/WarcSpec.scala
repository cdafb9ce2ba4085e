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
