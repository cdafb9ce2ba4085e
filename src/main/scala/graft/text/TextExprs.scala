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

/** Content-defined-chunking boundary kernel: ONE code-point walk per
  * document with a true polynomial rolling fingerprint (the Rabin
  * recipe behind LBFS/restic CDC), replacing the r11 md5-per-position
  * scan that was the suite's heaviest query (VERDICT r11 #3).
  *
  * Hash of the window ending at 1-based code-point position `p`:
  * `h(p) = sum_{j=0..w-1} cp(p-w+1+j) * P^(w-1-j) mod M` with
  * `P = 1000003`, `M = 2^31 - 1` — maintained incrementally as
  * `h' = ((h - cp_out * P^(w-1)) * P + cp_in) mod M`, one multiply
  * and one subtract per character instead of a 16-char md5. The
  * window sum form is what an external replay (the DuckDB oracle)
  * computes directly per position; the rolling update equals it by
  * ring arithmetic mod M. All terms stay under 2^53, so every engine
  * with exact 64-bit integers reproduces it bit-for-bit.
  *
  * A position is a boundary iff `p >= window`, `p < numChars` (a
  * boundary at the text end would duplicate the implicit final
  * bound), and `h(p) % divisor == 0`. Returns the ascending boundary
  * array; empty for docs shorter than the window (they become one
  * whole-document chunk downstream).
  */
object CdcKernel {
  private final val M = 2147483647L // 2^31 - 1 (Mersenne prime)
  private final val P = 1000003L

  /** Chunk spans `(start, end)` in 0-based code-point offsets, end
    * exclusive — the boundary positions of the rule above with the
    * implicit 0/length bounds already paired into consecutive spans,
    * so the caller explodes ONE array and never needs a per-doc
    * window or distinct. At least one span for any non-empty text. */
  def spans(s: UTF8String, window: Int, divisor: Int):
      org.apache.spark.sql.catalyst.util.ArrayData = {
    var pw = 1L // P^(window-1) mod M
    var e = 1
    while (e < window) { pw = pw * P % M; e += 1 }
    val bytes = s.getBytes
    val n = bytes.length
    val total = s.numChars().toLong
    val ring = new Array[Long](window)
    var h = 0L
    var pos = 0L
    var i = 0
    val bounds = new scala.collection.mutable.ArrayBuilder.ofLong
    bounds += 0L
    while (i < n) {
      val b0 = bytes(i) & 0xFF
      var cp = 0
      if (b0 < 0x80) { cp = b0; i += 1 }
      else if (b0 < 0xE0) {
        cp = ((b0 & 0x1F) << 6) | (bytes(i + 1) & 0x3F); i += 2
      } else if (b0 < 0xF0) {
        cp = ((b0 & 0x0F) << 12) | ((bytes(i + 1) & 0x3F) << 6) |
          (bytes(i + 2) & 0x3F); i += 3
      } else {
        cp = ((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3F) << 12) |
          ((bytes(i + 2) & 0x3F) << 6) | (bytes(i + 3) & 0x3F); i += 4
      }
      val slot = (pos % window).toInt
      // evict the code point leaving the window, then shift in the new
      // one; intermediates bounded by 2^21 * 2^31 < 2^53
      if (pos >= window) h = ((h - ring(slot) * pw) % M + M) % M
      h = (h * P + cp) % M
      ring(slot) = cp
      pos += 1
      if (pos >= window && pos < total && h % divisor == 0) bounds += pos
    }
    bounds += total
    val b = bounds.result()
    val out = new Array[Any](b.length - 1)
    var k = 0
    while (k < out.length) {
      out(k) = org.apache.spark.sql.catalyst.InternalRow(b(k), b(k + 1))
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `cdc_spans(text)` — the rolling-fingerprint chunk scan as a
  * codegen'd expression: a document's full chunk-span relation is ONE
  * projection output (an array of `(s, e)` structs), so chunk
  * extraction is expression + explode — no per-position explode, no
  * distinct, no window shuffle — see [[graft.text.Corpus.cdcChunks]].
  * Null for null text; empty input never reaches it (caller filters
  * empty docs, which emit no chunks). */
case class CdcSpans(child: Expression, window: Int, divisor: Int)
    extends UnaryExpression {
  require(window >= 2 && divisor >= 2, s"window=$window divisor=$divisor")

  override def dataType: DataType = {
    import org.apache.spark.sql.types._
    ArrayType(StructType(Seq(
      StructField("s", LongType, nullable = false),
      StructField("e", LongType, nullable = false))), containsNull = false)
  }
  override def prettyName: String = "cdc_spans"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    CdcKernel.spans(v.asInstanceOf[UTF8String], window, divisor)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.text.CdcKernel.spans($c, $window, $divisor)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
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
