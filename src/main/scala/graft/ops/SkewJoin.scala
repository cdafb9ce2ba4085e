package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-salted equi-join — the "salting for skew" half of the scale
  * toolkit whose diagnostic half is [[graft.text.Corpus.keySkew]].
  *
  * A shuffle join hash-partitions both sides on the key, so one hot key
  * lands on ONE reduce task: a 100 TB fact table where 20% of rows share
  * a key runs its join 80% parallel and 20% on a single straggler.
  * AQE's skew-join splitter only helps sort-merge joins whose skewed
  * PARTITIONS can be subdivided — it cannot split a single key's hash
  * bucket for a hash join, and it never helps an aggregation-free hot
  * key that exceeds one task's memory. The classic fix is explicit:
  *
  *  1. profile the left side's key histogram (one map-side-combinable
  *     pass — the [[graft.text.Corpus.keySkew]] relation);
  *  2. rows whose key is HEAVY (share >= `minSharePpm` ppm, top
  *     `heavyTopK`) get a deterministic salt in `[0, saltFactor)` —
  *     a content hash, NOT a random number, so replays and retried
  *     tasks salt identically;
  *  3. the right side's heavy-key rows are replicated `saltFactor`
  *     times (once per salt value) so every (key, salt) probe finds its
  *     build rows — replication cost is `saltFactor * |heavy right
  *     rows|`, bounded by `heavyTopK * saltFactor` rows when the right
  *     side is key-unique (the dimension-join case);
  *  4. light keys take the plain join untouched; the two branches
  *     union. Semantics are EXACTLY the plain join's for `inner` and
  *     `left` (gated against a full replay oracle).
  *
  * The heavy-key relation is `heavyTopK`-bounded by construction (at
  * most `1e6 / minSharePpm` keys can clear the share bar), so
  * broadcasting it for the hot/cold routing is always dimension-sized.
  *
  * Reference: no counterpart (bioframe is single-process); the recipe
  * is the standard Spark/Flink skew mitigation, e.g. Spark AQE docs'
  * "salting" guidance and the two-phase aggregation folklore. */
object SkewJoin {

  /** Left-side heavy-key relation: the REAL key columns (typed tuples —
    * never a concatenated string, which would merge ("ab","c") with
    * ("a","bc") and NULL with "") plus `__cnt`, ordered by count
    * descending. Same integer-exact share arithmetic as `keySkew`.
    * NULL key components group and rank like any other value (a null
    * key CAN be heavy — in a left join its rows still shuffle).
    *
    * The counts relation is cut from its input lineage with
    * `localCheckpoint` (blocks are NOT replicated: on a real cluster an
    * executor loss during a long-lived caller forces recomputation to
    * fail rather than replay — acceptable for this bounded, cheap
    * profile, which a retry of the caller simply re-derives).
    *
    * @note BREAKING since r13: previously returned `Array[String]` of
    *       concatenated key strings; now returns the typed-key relation
    *       described above. The old shape was collision-prone (see
    *       first paragraph) and had no external callers in this repo —
    *       recover it with `.collect().map(_.mkString(""))` only
    *       if string keys are genuinely wanted. */
  def heavyKeys(left: DataFrame, keys: Seq[String], heavyTopK: Int,
                minSharePpm: Long): DataFrame = {
    require(keys.nonEmpty && heavyTopK >= 1 && minSharePpm >= 1)
    val counts = left.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
      .localCheckpoint()
    // coalesce: sum over ZERO groups is null (empty left input) — the
    // profile is then empty, not an NPE
    val total = counts.agg(coalesce(sum(col("__cnt")), lit(0L)))
      .head.getLong(0)
    counts
      .filter(col("__cnt") * 1000000L >= lit(total) * minSharePpm)
      .orderBy(col("__cnt").desc +: keys.map(k => col(k).asc): _*)
      .limit(heavyTopK)
  }

  /** Exact equi-join with heavy keys salted across `saltFactor`
    * partitions. `joinType` in {inner, left}; right-side columns must
    * not collide with left's outside `keys` (same contract as
    * `DataFrame.join(right, keys)`), and neither input may already
    * carry the internal `__salt` column (feeding a previous
    * `saltedJoin` output back in must drop it first — silently joining
    * on a stale salt would be wrong). Hot/cold routing is a broadcast
    * null-safe semi/anti join on the REAL key columns, so distinct
    * tuples never alias and null-keyed hot rows are salted too (they
    * match nothing, exactly like the plain join, but their shuffle
    * spreads over `saltFactor` buckets instead of one). */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int = 8, heavyTopK: Int = 64,
                 minSharePpm: Long = 10000L,
                 joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 2, s"saltFactor=$saltFactor")
    require(joinType == "inner" || joinType == "left",
      s"joinType must be inner|left, got $joinType")
    require(!left.columns.contains("__salt") &&
        !right.columns.contains("__salt"),
      "inputs must not carry a __salt column (drop it from a previous " +
        "saltedJoin output before re-joining)")
    val heavy = heavyKeys(left, keys, heavyTopK, minSharePpm)
    if (heavy.isEmpty) return left.join(right, keys, joinType)
    // renamed probe columns: `heavy` derives from `left`, so joining on
    // same-named attributes would be ambiguous against either input
    val probe = broadcast(heavy.select(keys.zipWithIndex.map {
      case (k, i) => col(k).as(s"__hk$i")
    }: _*))
    def routeCond(df: DataFrame): Column =
      keys.zipWithIndex.map { case (k, i) => df(k) <=> col(s"__hk$i") }
        .reduce(_ && _)
    // deterministic content salt: identical retried tasks, replayed
    // batches, and both plan branches agree on every row's salt
    val salt = pmod(xxhash64(left.columns.map(col): _*), lit(saltFactor))
      .cast("int")
    val hotLeft = left.join(probe, routeCond(left), "left_semi")
      .withColumn("__salt", salt)
    val coldLeft = left.join(probe, routeCond(left), "left_anti")
    val hotRight = right.join(probe, routeCond(right), "left_semi")
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    val joinKeys = keys :+ "__salt"
    hotLeft.join(hotRight, joinKeys, joinType).drop("__salt")
      .unionByName(coldLeft.join(right, keys, joinType))
  }
}
