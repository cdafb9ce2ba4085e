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
  * The heavy-key list is a `heavyTopK`-bounded collect (dimension-sized
  * by construction — it cannot exceed `1e6 / minSharePpm` keys).
  *
  * Reference: no counterpart (bioframe is single-process); the recipe
  * is the standard Spark/Flink skew mitigation, e.g. Spark AQE docs'
  * "salting" guidance and the two-phase aggregation folklore. */
object SkewJoin {

  /** Left-side key histogram with heavy flags — exposed so callers can
    * inspect what would be salted (same integer-exact share arithmetic
    * as `keySkew`). */
  def heavyKeys(left: DataFrame, keys: Seq[String], heavyTopK: Int,
                minSharePpm: Long): Array[String] = {
    require(keys.nonEmpty && heavyTopK >= 1 && minSharePpm >= 1)
    val keyStr = concat_ws("", keys.map(k => col(k).cast("string")): _*)
    val counts = left.groupBy(keyStr.as("__key"))
      .agg(count(lit(1)).as("__cnt"))
      .localCheckpoint()
    val total = counts.agg(sum(col("__cnt"))).head.getLong(0)
    counts
      .filter(col("__cnt") * 1000000L >= lit(total) * minSharePpm)
      .orderBy(col("__cnt").desc, col("__key").asc)
      .limit(heavyTopK)
      .select(col("__key")).collect().map(_.getString(0))
  }

  /** Exact equi-join with heavy keys salted across `saltFactor`
    * partitions. `joinType` in {inner, left}; right-side columns must
    * not collide with left's outside `keys` (same contract as
    * `DataFrame.join(right, keys)`). */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int = 8, heavyTopK: Int = 64,
                 minSharePpm: Long = 10000L,
                 joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 2, s"saltFactor=$saltFactor")
    require(joinType == "inner" || joinType == "left",
      s"joinType must be inner|left, got $joinType")
    val heavy = heavyKeys(left, keys, heavyTopK, minSharePpm)
    if (heavy.isEmpty) return left.join(right, keys, joinType)
    val keyStr = concat_ws("", keys.map(k => col(k).cast("string")): _*)
    val isHeavy = keyStr.isin(heavy.toSeq: _*)
    // deterministic content salt: identical retried tasks, replayed
    // batches, and both plan branches agree on every row's salt
    val salt = pmod(xxhash64(left.columns.map(col): _*), lit(saltFactor))
      .cast("int")
    val hotLeft = left.filter(isHeavy).withColumn("__salt", salt)
    val coldLeft = left.filter(!isHeavy)
    val hotRight = right.filter(isHeavy).withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    val joinKeys = keys :+ "__salt"
    hotLeft.join(hotRight, joinKeys, joinType).drop("__salt")
      .unionByName(coldLeft.join(right, keys, joinType))
  }
}
