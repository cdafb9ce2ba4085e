package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression guard for the BENCH_r13 artifact loss (VERDICT r13 #2):
  * the final stdout line must fit the driver's tail window WITHOUT ever
  * sacrificing a measured query to an oversized `skipped` map, and the
  * sidecar line must always carry the full maps. Pure-logic spec — no
  * SparkSession.
  */
class BenchEmitSpec extends AnyFunSuite {
  private val meta =
    """"sf":"sf0.1","partial":false,"canary_start_sec":1.2,""" +
      """"canary_end_sec":1.3,"wall_sec":432.1,"reps":2,"sf001_total_sec":null"""

  private def parse(line: String): ujsonLite.Obj = ujsonLite.parse(line)

  /** Minimal JSON reader sufficient for these assertions (no external
    * deps in the test classpath beyond scalatest).
    */
  private object ujsonLite {
    case class Obj(fields: Map[String, Any]) {
      def obj(k: String): Obj = fields(k).asInstanceOf[Obj]
      def num(k: String): Double = fields(k).asInstanceOf[Double]
      def str(k: String): String = fields(k).asInstanceOf[String]
      def has(k: String): Boolean = fields.contains(k)
    }
    def parse(s: String): Obj = {
      val it = new P(s); val v = it.value(); v.asInstanceOf[Obj]
    }
    private class P(s: String) {
      var i = 0
      def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
      def value(): Any = { ws(); s(i) match {
        case '{' => obj()
        case '"' => str()
        case 't' => i += 4; true
        case 'f' => i += 5; false
        case 'n' => i += 4; null
        case '[' => arr()
        case _   => num()
      }}
      def obj(): Obj = {
        i += 1; ws()
        val m = scala.collection.mutable.LinkedHashMap[String, Any]()
        if (s(i) == '}') { i += 1; return Obj(m.toMap) }
        while (true) {
          ws(); val k = str(); ws(); require(s(i) == ':'); i += 1
          m(k) = value(); ws()
          if (s(i) == ',') i += 1
          else { require(s(i) == '}', s"at $i: ${s(i)}"); i += 1; return Obj(m.toMap) }
        }
        Obj(m.toMap)
      }
      def arr(): List[Any] = {
        i += 1; ws()
        val b = scala.collection.mutable.ListBuffer[Any]()
        if (s(i) == ']') { i += 1; return b.toList }
        while (true) {
          b += value(); ws()
          if (s(i) == ',') i += 1
          else { require(s(i) == ']'); i += 1; return b.toList }
        }
        b.toList
      }
      def str(): String = {
        require(s(i) == '"'); i += 1
        val b = new StringBuilder
        while (s(i) != '"') {
          if (s(i) == '\\') { i += 1; b += (s(i) match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case c => c }) }
          else b += s(i)
          i += 1
        }
        i += 1; b.toString
      }
      def num(): Double = {
        val j = i
        while (i < s.length && "+-0123456789.eE".indexOf(s(i)) >= 0) i += 1
        s.substring(j, i).toDouble
      }
    }
  }

  test("r13 shape: 72 measured + 102 skips keeps every measured query on stdout") {
    val measured = (1 to 72).map(i => (f"iv_q_$i%03d", i * 0.37))
    val skipped = (1 to 102).map(i =>
      (f"skipped_query_with_a_long_name_$i%03d", "total_budget:main"))
    val (full, out) = Bench.buildFinalLines(measured, Nil, skipped, meta)
    assert(out.length <= 1700, s"stdout line ${out.length} chars")
    val j = parse(out)
    // every measured query must survive (collapse the SKIP map first):
    // with zero skips these 72 entries fit outright, so an oversized
    // skip map must not push any of them into agg_fast
    val (_, outNoSkips) = Bench.buildFinalLines(measured, Nil, Nil, meta)
    assert(!parse(outNoSkips).obj("queries").has("agg_fast"))
    val qs = j.obj("queries")
    assert(!qs.has("agg_fast"), "measured queries were evicted into agg_fast")
    assert(qs.fields.size == 72)
    // skipped collapsed to reason-counts
    assert(j.obj("skipped").num("total_budget") == 102.0)
    // the sidecar keeps the full skip map
    val jf = parse(full)
    assert(jf.obj("skipped").fields.size == 102)
    assert(jf.obj("queries").fields.size == 72)
  }

  test("huge suite still fits by collapsing fastest queries into agg_fast") {
    val measured = (1 to 400).map(i => (f"q_$i%03d_padpadpadpadpad", i * 0.11))
    val (full, out) = Bench.buildFinalLines(measured, Nil, Nil, meta)
    assert(out.length <= 1700)
    val j = parse(out)
    val qs = j.obj("queries")
    assert(qs.has("agg_fast"))
    // slowest-kept invariant: the slowest query must be present by name
    assert(qs.has("q_400_padpadpadpadpad"))
    assert(parse(full).obj("queries").fields.size == 400)
  }

  test("pinned gates are excluded from total and reported separately") {
    val measured = Seq(("iv_merge", 2.0), ("iv_overlap_inner", 4.0))
    val pinned = Seq(("evt_ingest_e2e", 83.8))
    val (_, out) = Bench.buildFinalLines(measured, pinned, Nil, meta)
    val j = parse(out)
    assert(j.num("value") == 6.0)
    assert(j.obj("pinned").num("evt_ingest_e2e") == 83.8)
    assert(j.num("n_queries") == 2.0)
    assert(!j.obj("queries").has("evt_ingest_e2e"))
  }

  test("empty run emits a parseable line") {
    val (full, out) = Bench.buildFinalLines(Nil, Nil, Nil, meta)
    assert(out.length <= 1700)
    assert(parse(out).num("value") == 0.0)
    assert(parse(full).num("n_queries") == 0.0)
  }

  // VERDICT r14 #1: consecutive weather-truncated driver runs must TILE
  // the suite rather than measure the same alphabetical prefix forever.
  test("pass-1 rotation: keys hours apart land a truncated run on a mostly-new prefix") {
    val suite = (0 until 175).map(i => f"q$i%03d")
    assert(Bench.rotated(suite, 0L) == suite)                   // legacy order
    assert(Bench.rotated(suite, 175L) == suite)                 // full wrap
    assert(Bench.rotated(suite, -1L).head == "q174")            // negative keys normalize
    assert(Bench.rotated(Seq.empty[String], 7L).isEmpty)
    assert(Bench.rotated(suite, 3L) == suite.drop(3) ++ suite.take(3))
    // the production key advances 101 positions per epoch hour: two
    // driver runs >= 6h apart measure prefixes that overlap on fewer
    // than half their elements even when both truncate at 83 queries
    // (the r14 driver shape)
    val hour = 474500L // arbitrary epoch hour
    val runA = Bench.rotated(suite, hour * 101L).take(83).toSet
    val runB = Bench.rotated(suite, (hour + 6L) * 101L).take(83).toSet
    assert((runB -- runA).size >= 40, s"only ${(runB -- runA).size} new")
  }

  test("probe A/B arm order is mirrored per rep pair (no late-arm bias)") {
    // AB | BA | AB | BA ... : within every rep pair one arm leads once
    // and trails once across consecutive pairs (VERDICT r15 #3: the old
    // odd=A scheme let arm B always run later/warmer)
    val arms = (1 to 8).map(Probe.armIsA)
    assert(arms == Seq(true, false, false, true, true, false, false, true))
    // balance: equal sample counts per arm at any even rep budget
    (2 to 32 by 2).foreach { n =>
      val as = (1 to n).count(Probe.armIsA)
      assert(as == n / 2, s"unbalanced arms at reps=$n: $as")
    }
    // warm-rep balance too: discarding reps 1-2 (cold) keeps the lead
    // position alternating among the remaining pairs
    val warm = (3 to 10).map(Probe.armIsA)
    assert(warm.count(identity) == 4)
  }
}
