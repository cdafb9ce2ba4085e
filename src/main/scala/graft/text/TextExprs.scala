package graft.text

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd text kernels without a Spark built-in equivalent — the
  * [[graft.ann.VecKernels]] posture for strings: a static JVM method
  * spliced into whole-stage codegen, never a UDF.
  */
object TextKernels {

  /** Unicode normalization via `java.text.Normalizer`. `form` is one of
    * NFC/NFD/NFKC/NFKD. Fast path: `isNormalized` avoids allocating for
    * already-normal text (virtually all of a real corpus). */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val str = s.toString
    val f = java.text.Normalizer.Form.valueOf(form)
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }

  /** Static language-ID tables: marker word -> bitmask of the
    * [[TextOps.LangMarkers]] languages containing it (shared markers
    * like de/pt `das` set both bits, preserving the per-language
    * regexp_count semantics), the language codes by declaration index,
    * and the longest marker length (a cheap run-length prefilter). */
  private lazy val (langMarkerBits, langCodes, langMaxMarker) = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    var maxLen = 0
    TextOps.LangMarkers.zipWithIndex.foreach { case ((_, ws), i) =>
      ws.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, Integer.valueOf(
          (if (prev == null) 0 else prev.intValue()) | (1 << i)))
        maxLen = math.max(maxLen, w.getBytes("UTF-8").length)
      }
    }
    (m, TextOps.LangMarkers.map(t => UTF8String.fromString(t._1)).toArray,
      maxLen)
  }

  private val und = UTF8String.fromString("und")

  /** Fused language ID — ONE lowercase + ONE byte scan instead of one
    * `regexp_count` NFA pass per language (12 passes; sf1's heaviest
    * pure-text query). Semantics are exactly the regexp cascade's:
    * `\b(marker)\b` over `lower(text)` with Java's ASCII `\b` matches
    * precisely the MAXIMAL `[a-zA-Z0-9_]` runs equal to a marker (a
    * marker is all-letters, so any run containing a digit/underscore
    * simply misses the table; both match ends sit on word/non-word
    * boundaries, and non-overlapping counting of maximal runs is
    * count-per-run). Multibyte UTF-8 continuation/lead bytes are all
    * >= 0x80, i.e. non-word — boundaries fall out byte-wise. Ties
    * resolve in declaration order; zero hits -> "und". */
  def langId(s: UTF8String): UTF8String = {
    val bytes = s.toLowerCase.getBytes
    val counts = new Array[Int](langCodes.length)
    var i = 0
    val n = bytes.length
    while (i < n) {
      val b = bytes(i)
      val isWord = (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') ||
        (b >= 'A' && b <= 'Z') || b == '_'
      if (!isWord) i += 1
      else {
        var j = i + 1
        var done = false
        while (j < n && !done) {
          val c = bytes(j)
          if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
              (c >= 'A' && c <= 'Z') || c == '_') j += 1
          else done = true
        }
        val len = j - i
        if (len <= langMaxMarker) {
          val bits = langMarkerBits.get(UTF8String.fromBytes(bytes, i, len))
          if (bits != null) {
            var v = bits.intValue()
            while (v != 0) {
              val k = java.lang.Integer.numberOfTrailingZeros(v)
              counts(k) += 1
              v &= v - 1
            }
          }
        }
        i = j
      }
    }
    var best = 0
    var bestIdx = -1
    var k = 0
    while (k < counts.length) {
      if (counts(k) > best) { best = counts(k); bestIdx = k }
      k += 1
    }
    if (bestIdx < 0) und else langCodes(bestIdx)
  }
}

/** `unicode_normalize(text, form)` as a native Catalyst expression —
  * Spark has no built-in Unicode normalization, and a Scala UDF here
  * would break whole-stage codegen in every text-cleaning projection.
  * The canonical pre-dedup step: byte-identical dedup keys require
  * canonically equivalent strings (e + COMBINING ACUTE vs U+00E9) to
  * hash identically.
  */
object UnigramKernel {
  /** Exact-Long Viterbi segmentation of one word against a piece ->
    * micro-log-prob table: maximize total score; ties per position by
    * fewer pieces, then longer last piece (all deterministic — the
    * DuckDB oracle replays the same argmin per position). Returns null
    * when no cover exists (a vocabulary holding every single character
    * never gets here). */
  def segment(s: UTF8String,
              vocab: java.util.HashMap[String, java.lang.Long],
              maxPieceLen: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val w = s.toString
    val n = w.length
    val NEG = java.lang.Long.MIN_VALUE / 4
    val score = new Array[Long](n + 1)
    val npieces = new Array[Int](n + 1)
    val lastLen = new Array[Int](n + 1)
    java.util.Arrays.fill(score, NEG)
    score(0) = 0L
    var p = 1
    while (p <= n) {
      var len = 1
      val maxL = math.min(maxPieceLen, p)
      while (len <= maxL) {
        if (score(p - len) != NEG) {
          val lp = vocab.get(w.substring(p - len, p))
          if (lp != null) {
            val sc = score(p - len) + lp.longValue()
            val np = npieces(p - len) + 1
            val better = sc > score(p) ||
              (sc == score(p) && (np < npieces(p) ||
                (np == npieces(p) && len > lastLen(p))))
            if (better) {
              score(p) = sc; npieces(p) = np; lastLen(p) = len
            }
          }
        }
        len += 1
      }
      p += 1
    }
    if (n > 0 && score(n) == NEG) return null
    val out = new Array[AnyRef](npieces(n))
    var pos = n
    var i = npieces(n) - 1
    while (pos > 0) {
      val l = lastLen(pos)
      out(i) = UTF8String.fromString(w.substring(pos - l, pos))
      pos -= l
      i -= 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `unigram_segment(word)` — exact Viterbi subword segmentation
  * against a dimension-sized piece inventory carried as a codegen
  * reference object (the broadcast-dimension pattern: a tokenizer
  * vocabulary is ~64k rows, model-sized, never corpus-sized). */
case class UnigramSegment(child: Expression,
                          vocab: Map[String, Long], maxPieceLen: Int)
    extends UnaryExpression {
  require(maxPieceLen >= 1)

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "unigram_segment"

  @transient private lazy val jVocab = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (k, v) => m.put(k, java.lang.Long.valueOf(v)) }
    m
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    UnigramKernel.segment(v.asInstanceOf[UTF8String], jVocab, maxPieceLen)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vref = ctx.addReferenceObj("unigramVocab", jVocab,
      "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.text.UnigramKernel.segment(
         |  $c, $vref, $maxPieceLen);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `lang_id(text)` as a native Catalyst expression — the fused
  * single-pass form of the 12-regexp marker cascade (see
  * [[TextKernels.langId]] for the equivalence argument). Null text
  * evaluates to null; [[TextOps.langId]] coalesces to "und" to match
  * the regexp cascade's null behavior. */
case class LangId(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    TextKernels.langId(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.TextKernels.langId($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unknown normalization form $form")

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    TextKernels.normalize(v.asInstanceOf[UTF8String], form)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.text.TextKernels.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
