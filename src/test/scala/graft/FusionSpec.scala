package graft

import graft.text.Fusion

/** RRF fusion: exact contribution arithmetic, consensus ordering,
  * n_lists accounting, top-k cut and tiebreaks. */
class FusionSpec extends SparkSpec {
  import spark.implicits._

  private def rel(rows: (Long, Long, Int)*) =
    rows.toDF("query_id", "doc_id", "rank")

  test("exact nano-unit sums and consensus beats single-list") {
    // doc 10 is rank 2 in both lists; doc 20 is rank 1 in one only
    val a = rel((1L, 10L, 2), (1L, 20L, 1))
    val b = rel((1L, 10L, 2), (1L, 30L, 1))
    val f = Fusion.reciprocalRankFusion(Seq(a, b), k = 10)
      .as[(Long, Long, Long, Long, Int)].collect()
      .map(r => r._2 -> (r._3, r._4, r._5)).toMap
    val c1 = math.round(1e9 / 61) // rank 1
    val c2 = math.round(1e9 / 62) // rank 2
    assert(f(10L) == ((2 * c2, 2L, 1)), "consensus doc first")
    assert(f(20L) == ((c1, 1L, 2)), "tie on score -> doc_id asc")
    assert(f(30L) == ((c1, 1L, 3)))
  }

  test("top-k cut per query, queries independent") {
    val a = rel((1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 3), (2L, 9L, 1))
    val f = Fusion.reciprocalRankFusion(Seq(a), k = 2)
      .as[(Long, Long, Long, Long, Int)].collect()
    assert(f.count(_._1 == 1L) == 2 && f.count(_._1 == 2L) == 1)
    assert(!f.exists(r => r._1 == 1L && r._2 == 3L))
  }
}
