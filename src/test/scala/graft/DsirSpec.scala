package graft

import org.apache.spark.sql.functions._

import graft.text.{Corpus, Dsir}

/** DSIR importance weighting: featurization shape, exact-formula
  * agreement with a driver-side reference, planted-signal direction
  * (target-like documents outweigh dissimilar ones), and edge cases. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("featurize: unigrams + joined bigrams, counts conserved") {
    val df = Seq((1L, "aa bb aa"), (2L, "cc"), (3L, "")).toDF("id", "text")
    val f = Dsir.featurize(df, "id", "text", numBuckets = 1 << 20)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    // doc 1: 3 unigrams + 2 bigrams (aa_bb, bb_aa) = 5 features total
    assert(f.filter(_._1 == 1L).map(_._2).sum == 5L)
    // doc 2: 1 unigram, no bigram; doc 3: nothing
    assert(f.filter(_._1 == 2L).map(_._2).sum == 1L)
    assert(!f.exists(_._1 == 3L))
  }

  test("weights match a driver-side replay of the quantized formula") {
    val docs = Seq(
      (1L, "good clean prose here"),
      (2L, "spam junk words junk"),
      (3L, "good prose"),
      (4L, "")).toDF("doc_id", "text")
    val target = docs.filter($"doc_id" === 1L)
    val D = 64
    val got = Dsir.importanceWeights(docs, target, "doc_id", "text", D)
      .select($"doc_id", $"dsir_score", $"n_feat")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap

    // reference: same md5 bucketing via the engine's own featurize (the
    // bucketing itself is gated by txt_dsir/txt_feat_hash), manual
    // smoothing + quantized ratio + integer sum
    val feats = Dsir.featurize(docs, "doc_id", "text", D)
      .as[(Long, Long, Long)].collect()
    val ct = feats.filter(_._1 == 1L).groupBy(_._2)
      .map { case (b, xs) => b -> xs.map(_._3).sum }
    val cr = feats.groupBy(_._2).map { case (b, xs) => b -> xs.map(_._3).sum }
    val ttD = (ct.values.sum + D).toDouble
    val trD = (cr.values.sum + D).toDouble
    val lr = (ct.keySet ++ cr.keySet).map { b =>
      b -> math.round(math.log(
        (ct.getOrElse(b, 0L).toDouble + 1.0) * trD /
          ((cr.getOrElse(b, 0L).toDouble + 1.0) * ttD)) * 1e6)
    }.toMap
    val want = feats.groupBy(_._1).map { case (id, xs) =>
      id -> (xs.map(x => x._3 * lr(x._2)).sum, xs.map(_._3).sum)
    }
    assert(got(4L) == ((0L, 0L))) // featureless doc kept at 0
    want.foreach { case (id, sv) => assert(got(id) == sv, s"doc $id") }
  }

  test("planted signal: a target-like raw doc outweighs a dissimilar one") {
    val target = (1L to 20L)
      .map(i => (1000L + i, s"science article methods results discussion $i"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "science methods results analysis"),
      (2L, "buy cheap pills online casino winner")).toDF("doc_id", "text")
    val w = Dsir.importanceWeights(raw, target, "doc_id", "text", 2048)
      .select($"doc_id", $"dsir_score").as[(Long, Long)].collect().toMap
    assert(w(1L) > w(2L),
      s"target-like ${w(1L)} should outweigh dissimilar ${w(2L)}")
  }
}
