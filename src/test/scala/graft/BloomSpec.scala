package graft

import org.apache.spark.sql.functions._

import graft.dedup.Bloom

/** Bloom-filter membership index: exactness of the prefilter+verify
  * composition, prefilter effectiveness, and the codegen'd constant-bloom
  * probe. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("probeNew is EXACT: dups killed, novel rows kept, across buckets") {
    val corpus = (0 until 1000).map(i => (i.toLong, s"doc-$i")).toDF("id", "k")
    // batch: 500 true dups (ids shifted) + 500 novel keys
    val batch = ((0 until 500).map(i => (10000L + i, s"doc-$i")) ++
      (0 until 500).map(i => (20000L + i, s"new-$i"))).toDF("id", "k")
    val index = Bloom.buildIndex(corpus, col("k"), numBuckets = 8,
      expectedItems = 10000L)
    assert(index.count() <= 8)
    val out = Bloom.probeNew(index, corpus.select(col("k")), batch, col("k"),
      numBuckets = 8)
    val got = out.select("id").as[Long].collect().sorted
    assert(got.toSeq == (0 until 500).map(20000L + _))
    // schema passthrough: the batch's own columns, nothing else
    assert(out.columns.toSeq == Seq("id", "k"))
  }

  test("bloom prefilter actually prunes: a disjoint batch mostly skips " +
    "the verify join (fpp-bounded maybe rate)") {
    val corpus = (0 until 5000).map(i => s"c-$i").toDF("k")
    val batch = (0 until 5000).map(i => s"b-$i").toDF("k")
    val index = Bloom.buildIndex(corpus, col("k"), numBuckets = 4,
      expectedItems = 5000L, fpp = 0.01)
    // count the might-contain rows directly through the literal probe
    val blooms = index.collect().map(r =>
      r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val maybes = blooms.map { case (b, blob) =>
      batch.withColumn("__h", xxhash64(col("k")))
        .filter(pmod(col("__h"), lit(4L)) === b)
        .filter(Bloom.mightContain(blob, col("__h")))
        .count()
    }.sum
    assert(maybes < 500, s"fpp blowout: $maybes of 5000 flagged maybe")
    // and the composition still returns every batch row
    assert(Bloom.probeNew(index, corpus, batch, col("k"), 4).count() == 5000)
  }

  test("mightContain literal probe: members always hit, plan stays " +
    "whole-stage-codegen") {
    // spark.range, not a LocalRelation: Spark folds filters over local
    // data eagerly, which would hide the codegen span this asserts on
    val df = spark.range(100).toDF("v")
      .withColumn("__h", xxhash64(col("v")))
    val bloom = df.agg(Bloom.bloomAgg(col("__h"), 100L, 0.01))
      .collect()(0).getAs[Array[Byte]](0)
    val probed = df.filter(Bloom.mightContain(bloom, col("__h")))
    assert(probed.count() == 100) // no false negatives, ever
    // "*(1) Filter might_contain..." — the * prefix is the
    // whole-stage-codegen marker in the plan string
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Filter might_contain"), plan.take(500))
  }

  test("persisted ingest index: append stays correct uncompacted, " +
    "compaction bounds rows per bucket and changes no answers") {
    val dir = java.nio.file.Files.createTempDirectory("bloomidx").toString
    val path = s"$dir/idx"
    val c0 = (0 until 300).map(i => s"c-$i").toDF("k")
    Bloom.writeIndex(c0, col("k"), path, numBuckets = 4,
      expectedItems = 10000L)
    // three ingest batches append (same sizing — merge requires it)
    (1 to 3).foreach { g =>
      val batch = (0 until 100).map(i => s"g$g-$i").toDF("k")
      Bloom.appendIndex(batch, col("k"), path, numBuckets = 4,
        expectedItems = 10000L)
    }
    val idx = spark.read.parquet(path)
    assert(idx.count() > 4) // multi-row buckets exist pre-compaction
    val corpus = (c0.as[String].collect() ++
      (1 to 3).flatMap(g => (0 until 100).map(i => s"g$g-$i"))).toSeq.toDF("k")
    val probe = ((0 until 50).map(i => s"c-$i") ++ // dup of base
      Seq("g2-7", "g3-99") ++ // dups of appended batches
      (0 until 50).map(i => s"x-$i")).toDF("k") // novel
    val before = Bloom.probeNew(idx, corpus, probe, col("k"), 4)
      .as[String].collect().sorted.toSeq
    assert(before == (0 until 50).map(i => s"x-$i").sorted)
    Bloom.compactIndex(spark, path)
    val compacted = spark.read.parquet(path)
    assert(compacted.count() <= 4) // one row per bucket
    val after = Bloom.probeNew(compacted, corpus, probe, col("k"), 4)
      .as[String].collect().sorted.toSeq
    assert(after == before)
  }

  test("probeNew is expression-only: the probe stage stays in codegen " +
    "(no SerializeFromObject / MapPartitions), cascade visible in plan") {
    val corpus = (0 until 200).map(i => s"doc-$i").toDF("k")
    // spark.range, not a LocalRelation: Spark folds filters over local
    // data eagerly, which would hide the probe plan this asserts on
    val batch = spark.range(200).select(concat(lit("probe-"), col("id"))
      .as("k"))
    val index = Bloom.buildIndex(corpus, col("k"), numBuckets = 4,
      expectedItems = 1000L)
    val out = Bloom.probeNew(index, corpus, batch, col("k"), numBuckets = 4)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SerializeFromObject"), plan.take(800))
    assert(!plan.contains("MapPartitions"), plan.take(800))
    assert(plan.contains("might_contain"), plan.take(800))
    assert(out.count() == 200)
  }

  test("probeNew tolerates caller columns named __h/__b/__ck " +
    "(temp names are collision-free, caller data passes through intact)") {
    val corpus = Seq("a", "b", "c").toDF("k")
    val batch = Seq(("a", 10L, 20L, "x"), ("z", 11L, 21L, "y"))
      .toDF("k", "__h", "__b", "__ck")
    val index = Bloom.buildIndex(corpus, col("k"), numBuckets = 4,
      expectedItems = 100L)
    val out = Bloom.probeNew(index, corpus, batch, col("k"), numBuckets = 4)
    val rows = out.collect()
    assert(rows.length == 1)
    assert(rows(0).getString(0) == "z" && rows(0).getLong(1) == 11L &&
      rows(0).getLong(2) == 21L && rows(0).getString(3) == "y")
    assert(out.columns.toSeq == Seq("k", "__h", "__b", "__ck"))
  }

  test("compactIndex is crash-safe: stale __compacting/__old leftovers " +
    "are reaped, the swap preserves answers, siblings are cleaned up") {
    val dir = java.nio.file.Files.createTempDirectory("bloomcrash").toString
    val path = s"$dir/idx"
    Bloom.writeIndex((0 until 100).map(i => s"c-$i").toDF("k"), col("k"),
      path, numBuckets = 4, expectedItems = 1000L)
    Bloom.appendIndex(Seq("extra-1", "extra-2").toDF("k"), col("k"), path,
      numBuckets = 4, expectedItems = 1000L)
    // plant leftovers of a hypothetical crashed prior compaction
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(path + "__compacting"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path + "__compacting", "junk"),
      Array[Byte](1, 2, 3))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(path + "__old"))
    val corpus = ((0 until 100).map(i => s"c-$i") ++
      Seq("extra-1", "extra-2")).toDF("k")
    val probe = Seq("c-5", "extra-2", "nope").toDF("k")
    val before = Bloom.probeNew(spark.read.parquet(path), corpus, probe,
      col("k"), 4).as[String].collect().sorted.toSeq
    assert(before == Seq("nope"))
    Bloom.compactIndex(spark, path)
    val after = Bloom.probeNew(spark.read.parquet(path), corpus, probe,
      col("k"), 4).as[String].collect().sorted.toSeq
    assert(after == before)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(path + "__compacting")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(path + "__old")))
  }

  test("bloomAgg raises the session runtime-bloom-filter caps so large " +
    "filters are not silently clamped") {
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bits0 = spark.conf.get(bitsKey).toLong
    val items0 = spark.conf.get(itemsKey).toLong
    try {
      // ask for a filter bigger than the 8 MB default cap
      val want = 20000000L // ~191.7M bits at 1% fpp > 67,108,864 default
      val df = spark.range(1000).toDF("v")
        .withColumn("__h", xxhash64(col("v")))
      val blob = df.agg(Bloom.bloomAgg(col("__h"), want, 0.01))
        .collect()(0).getAs[Array[Byte]](0)
      val expectBits =
        org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(want, 0.01)
      assert(spark.conf.get(bitsKey).toLong >= expectBits)
      assert(spark.conf.get(itemsKey).toLong >= want)
      // the blob is actually full-size (~bits/8), not clamped to 8 MB
      assert(blob.length.toLong * 8 >= expectBits,
        s"blob ${blob.length}B vs expected >= ${expectBits / 8}B")
    } finally {
      spark.conf.set(bitsKey, bits0.toString)
      spark.conf.set(itemsKey, items0.toString)
    }
  }

  test("empty corpus: every batch row is new; missing buckets probe false") {
    val corpus = Seq.empty[String].toDF("k")
    val batch = Seq("a", "b").toDF("k")
    val index = Bloom.buildIndex(corpus, col("k"), numBuckets = 4)
    assert(index.count() == 0)
    assert(Bloom.probeNew(index, corpus, batch, col("k"), 4).count() == 2)
  }
}
