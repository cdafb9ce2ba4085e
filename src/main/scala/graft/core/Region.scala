package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A scalar genomic query range — the reference's only "query language".
  *
  * Parses UCSC-style strings like `"chr5:10,100,000-30M"` with humanized
  * k/M/G suffixes and missing start/end inference. Pure driver-side Scala
  * port of the grammar at reference `core/stringops.py:15-24,67-143,172-249`;
  * produces a plain Catalyst `Column` predicate so region selection stays
  * pushdown-friendly (no UDF).
  */
final case class Region(chrom: String, start: Option[Long], end: Option[Long]) {

  /** Fill missing coordinates: absent start -> 0; absent end -> chromsize
    * when known (reference `stringops.py:235-249`). */
  def resolve(chromsizes: Map[String, Long] = Map.empty,
              checkBounds: Boolean = true): Region = {
    val clen = chromsizes.get(chrom)
    if (chromsizes.nonEmpty && clen.isEmpty)
      throw new IllegalArgumentException(s"Unknown sequence label: $chrom")
    val s = start.getOrElse(0L)
    val e = end.orElse(clen)
    e.foreach { ee =>
      if (ee < s) throw new IllegalArgumentException("End cannot be less than start")
    }
    if (checkBounds && (s < 0 || (clen.nonEmpty && e.nonEmpty && e.get > clen.get)))
      throw new IllegalArgumentException(
        s"Genomic range out of bounds: [$s, ${e.getOrElse("")})")
    Region(chrom, Some(s), e)
  }

  /** Overlap predicate against the coordinate triple of `cols`.
    *
    * Matches reference `select` semantics (`ops.py:29-66`): interval
    * overlaps the region under half-open logic, with zero-length points
    * promoted so a point sitting exactly at the region start is selected —
    * including by a zero-length QUERY at the same coordinate (the
    * reference's explicit point-at-query-start disjunct, `ops.py:64`,
    * which plain promotion misses because the query's own upper bound is
    * empty; tests/test_ops_select.py:180-182). */
  def predicate(cols: ColSpec = ColSpec.default): Column = {
    val chromOk = cols.chromCol === lit(chrom)
    val lower = start match {
      case Some(s) => cols.promotedEnd > lit(s)
      case None    => lit(true)
    }
    val upper = end match {
      case Some(e) => cols.startCol < lit(e)
      case None    => lit(true)
    }
    val pointAtStart = start match {
      case Some(s) => cols.startCol === cols.endCol && cols.startCol === lit(s)
      case None    => lit(false)
    }
    chromOk && ((lower && upper) || pointAtStart)
  }

  def toUcscString: String =
    s"$chrom:${start.getOrElse(0L)}-${end.map(_.toString).getOrElse("")}"
}

object Region {

  private val Humanized = """([0-9,]+(?:\.[0-9]*)?)\s*([A-Za-z]+)?""".r

  /** `"10,100,000"` / `"30M"` / `"1.5kb"` -> Long (decimals beyond the
    * multiplier are dropped, as in reference `stringops.py:67-85`). */
  def parseHumanizedInt(tok: String): Long = tok.trim match {
    case Humanized(num, null) => num.replace(",", "").toDouble.toLong
    case Humanized(num, unit) =>
      val v = num.replace(",", "").toDouble
      val mult = unit.toUpperCase match {
        case "K" | "KB" => 1e3
        case "M" | "MB" => 1e6
        case "G" | "GB" => 1e9
        case u => throw new IllegalArgumentException(s"Unknown unit '$u'")
      }
      (v * mult).toLong
    case other => throw new IllegalArgumentException(s"Not a coordinate: '$other'")
  }

  /** Parse `"chrom[:start-[end]]"`; start/end may carry comma separators and
    * k/M/G suffixes. Reference grammar: `stringops.py:88-143`. */
  def parseString(s: String): Region = {
    val parts = s.split(":", 2)
    val chrom = parts(0).trim
    if (chrom.isEmpty)
      throw new IllegalArgumentException("Chromosome name cannot be empty")
    if (parts.length < 2) return Region(chrom, None, None)
    val range = parts(1).trim
    val idx = {
      // the hyphen separating start-end (coordinates themselves contain no '-')
      val i = range.indexOf('-')
      if (i < 0)
        throw new IllegalArgumentException(s"Expected HYPHEN in range: '$range'")
      i
    }
    val startTok = range.substring(0, idx).trim
    val endTok = range.substring(idx + 1).trim
    if (startTok.isEmpty)
      throw new IllegalArgumentException(s"Expected COORD in range: '$range'")
    val start = parseHumanizedInt(startTok)
    val end = if (endTok.isEmpty) None else Some(parseHumanizedInt(endTok))
    Region(chrom, Some(start), end)
  }

  def apply(s: String): Region = parseString(s)

  def isCompleteUcscString(s: String): Boolean =
    try parseString(s).end.nonEmpty
    catch { case _: IllegalArgumentException => false }
}
