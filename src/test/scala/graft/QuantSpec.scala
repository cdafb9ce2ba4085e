package graft

import org.apache.spark.sql.functions._

import graft.ann.Ann

/** Int8 symmetric quantization: arithmetic contract (rounding rule,
  * clamp, reconstruction error bound), quantized ranking quality, and
  * the exact-rerank second stage. */
class QuantSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = (0 until 300).map { i =>
    // deterministic pseudo-random floats in [-1, 1], varied magnitude
    val v = Array.tabulate(16) { d =>
      val h = ((i * 31 + d * 17) % 97) - 48
      (h / 48.0f) * (1.0f + (i % 5))
    }
    (i.toLong, v, i % 4)
  }.toDF("vec_id", "embedding", "label")

  test("quantization contract: values in [-127,127], max |x| maps to ±127, " +
    "reconstruction within scale/2 per element") {
    val q = Ann.quantizeInt8(vecs)
    val rows = q.select("embedding", "qvec", "qscale").collect()
      .map(r => (r.getSeq[Float](0).toArray, r.getSeq[Byte](1).toArray,
        r.getDouble(2)))
    rows.foreach { case (v, qv, s) =>
      assert(qv.length == v.length)
      val m = v.map(x => math.abs(x.toDouble)).max
      assert(math.abs(s - m / 127.0) < 1e-15)
      v.zip(qv).foreach { case (x, b) =>
        assert(b >= -127 && b <= 127)
        if (s > 0) // dequantized error <= half a quantization step
          assert(math.abs(b * s - x) <= s / 2 + 1e-12, s"x=$x b=$b s=$s")
      }
      // the max-magnitude element saturates the range exactly
      if (m > 0) assert(qv.map(b => math.abs(b.toInt)).max == 127)
    }
  }

  test("rounding is half-away-from-zero (SQL ROUND), not Math.round") {
    // x/scale = ±2.5 exactly: scale 1.0 from absmax 127
    val df = Seq((1L, Array(127.0f, 2.5f, -2.5f, 0.4f, -0.4f)))
      .toDF("vec_id", "embedding")
    val qv = Ann.quantizeInt8(df).select("qvec").head().getSeq[Byte](0)
    assert(qv == Seq[Byte](127, 3, -3, 0, 0))
  }

  test("zero and null vectors: all-zero quantizes to zeros; " +
    "null propagates") {
    val df = Seq((1L, Array(0.0f, 0.0f)), (2L, null))
      .toDF("vec_id", "embedding")
    val got = Ann.quantizeInt8(df)
      .select("vec_id", "qvec", "qscale").collect()
    val z = got.find(_.getLong(0) == 1L).get
    assert(z.getSeq[Byte](1) == Seq[Byte](0, 0))
    assert(z.getDouble(2) == 0.0)
    val n = got.find(_.getLong(0) == 2L).get
    assert(n.isNullAt(1) && n.isNullAt(2))
  }

  test("reconstructed dot tracks the exact dot within the quantization " +
    "error envelope") {
    val q = Ann.quantizeInt8(vecs)
    val a = q.select(col("vec_id").as("ida"), col("embedding").as("va"),
      col("qvec").as("qa"), col("qscale").as("sa"))
    val b = q.select(col("vec_id").as("idb"), col("embedding").as("vb"),
      col("qvec").as("qb"), col("qscale").as("sb"))
    val errs = a.join(b, col("ida") < col("idb"))
      .select(
        Ann.dot(col("va"), col("vb")).as("exact"),
        Ann.qdot(col("qa"), col("sa"), col("qb"), col("sb")).as("approx"),
        Ann.norm(col("va")).as("na"), Ann.norm(col("vb")).as("nb"))
      .select((abs(col("exact") - col("approx")) /
        (col("na") * col("nb"))).as("rel"))
      .agg(max("rel")).head().getDouble(0)
    // per-element error <= scale/2 => normalized dot error O(sqrt(d)/127)
    assert(errs < 0.05, s"relative dot error $errs")
  }

  test("quantized top-k has high overlap with exact top-k; exact rerank " +
    "recovers it") {
    val queries = vecs.filter($"vec_id" % 50 === 0)
    val exact = Ann.bruteForceTopK(vecs, queries, k = 5)
      .select("query_id", "neighbor_id")
    // quantized-on-normalized ranks by approximate cosine
    val unit = vecs.withColumn("embedding", Ann.l2Normalize($"embedding"))
    val uq = unit.filter($"vec_id" % 50 === 0)
    val quant = Ann.quantizedTopK(unit, uq, k = 5)
      .select("query_id", "neighbor_id")
    // the fixture is deliberately tie-heavy (16 dims, 97 discrete
    // residues) — near-equal cosines flip freely under int8; real
    // embedding distributions sit well above this floor
    val overlap = exact.intersect(quant).count().toDouble / exact.count()
    assert(overlap >= 0.7, s"quantized recall $overlap")
    // two-stage: quantized candidates + exact cosine rerank == exact
    val rr = Ann.quantizedTopK(unit, uq, k = 5,
        rerankWith = Some(vecs), rerankDepth = 40)
      .select("query_id", "neighbor_id")
    val rrOverlap = exact.intersect(rr).count().toDouble / exact.count()
    assert(rrOverlap >= 0.95, s"reranked recall $rrOverlap")
  }
}
