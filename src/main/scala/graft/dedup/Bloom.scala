package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership index for ingest-time exact dedup — beyond the
  * reference (a single-host pandas library has no reason to exist at this
  * shape), this is the operator a 100 TB corpus needs so that "which of
  * these N new documents have we already seen?" does NOT cost a
  * corpus-wide join per batch.
  *
  * Shape: the corpus's key hashes are folded — once — into per-bucket
  * Bloom filters with Spark's native `bloom_filter_agg` (a map-side
  * combinable TypedImperativeAggregate; the shuffle carries B partially
  * built filters, never rows). The index is B rows of
  * `(bucket, bloom binary)` — bounded by construction
  * (`B * optimalNumOfBits(expected/B, fpp) / 8` bytes; ~180 MB for 1e10
  * keys at 1% fpp over 64 buckets) — so the PROBE side broadcasts it and
  * splits a batch per-partition into definitely-new rows (bloom says no:
  * no join, no shuffle — the common case for mostly-novel batches) and
  * might-be-dup rows, and only the latter (true dups + ~fpp of the new
  * rows) reach the exact verify join. The result is exact; the bloom only
  * decides who pays for verification.
  *
  * The single-filter fast path [[mightContain]] embeds the bloom blob as
  * a LITERAL in `BloomFilterMightContain`, which stays inside whole-stage
  * codegen (the expression requires a constant filter — the reason the
  * bucketed path probes via broadcast map + mapPartitions instead). */
object Bloom {

  import org.apache.spark.sql.graftbridge.Bridge.{column => colOf, catalystExpression => exprOf}

  /** Aggregate Column folding `hash` (must be BIGINT, e.g. `xxhash64`)
    * into one Bloom filter blob sized for `expectedItems` at `fpp`. */
  def bloomAgg(hash: Column, expectedItems: Long, fpp: Double): Column = {
    val bits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    colOf(new BloomFilterAggregate(exprOf(hash), Literal(expectedItems),
      Literal(bits)).toAggregateExpression())
  }

  /** Codegen'd membership probe against a CONSTANT bloom blob. */
  def mightContain(bloom: Array[Byte], hash: Column): Column =
    colOf(BloomFilterMightContain(Literal(bloom, BinaryType), exprOf(hash)))

  /** The index's bucket-and-hash key derivation, shared by build and
    * probe: `(xxhash64(key), pmod(hash, numBuckets))`. */
  private def keyed(df: DataFrame, keyCol: Column, numBuckets: Int,
                    hashName: String, bucketName: String): DataFrame =
    df.withColumn(hashName, xxhash64(keyCol))
      .withColumn(bucketName, pmod(col(hashName), lit(numBuckets.toLong)))

  /** Build the `(bucket, bloom)` index over `keyCol` of `corpus` — one
    * aggregation job, one bounded result. `expectedItems` is the TOTAL
    * corpus key count the filters are sized for (each bucket gets
    * `expected/numBuckets`); undersizing degrades fpp, never
    * correctness. */
  def buildIndex(corpus: DataFrame, keyCol: Column, numBuckets: Int = 64,
                 expectedItems: Long = 10000000L,
                 fpp: Double = 0.01): DataFrame = {
    require(numBuckets > 0 && expectedItems > 0)
    val perBucket = math.max(1L, expectedItems / numBuckets)
    keyed(corpus.select(keyCol.as("__key")), col("__key"), numBuckets,
        "__h", "bucket")
      .groupBy(col("bucket"))
      .agg(bloomAgg(col("__h"), perBucket, fpp).as("bloom"))
  }

  /** Exact "which batch rows are NEW vs the corpus", bloom-prefiltered.
    *
    * `index` is [[buildIndex]]'s output (collected and broadcast here —
    * bounded by construction); `corpusKeys` is a single-column relation
    * of the corpus's key values, consulted ONLY for the might-contain
    * rows (persist it bucketed/pre-hashed for repeated batches — the
    * same posture as the minhash incremental index). Returns the batch
    * rows whose `keyCol` value does not occur in `corpusKeys`, exactly:
    * hash collisions inside the bloom cost a verify-join row, never a
    * wrong answer, because the verify join compares the KEY VALUE, not
    * the hash. */
  def probeNew(index: DataFrame, corpusKeys: DataFrame, batch: DataFrame,
               keyCol: Column, numBuckets: Int = 64): DataFrame = {
    // a bucket may carry several rows (appended ingest batches,
    // [[appendIndex]]) — merge them here, so append stays a pure
    // parquet append and compaction is an optimization, not a
    // correctness step
    val blooms: Map[Long, Array[Byte]] = index
      .select(col("bucket").cast("long"), col("bloom"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (b, rows) =>
        val merged = BloomFilter.readFrom(rows.head.getAs[Array[Byte]](1))
        rows.tail.foreach(r =>
          merged.mergeInPlace(BloomFilter.readFrom(r.getAs[Array[Byte]](1))))
        val bos = new java.io.ByteArrayOutputStream()
        merged.writeTo(bos)
        b -> bos.toByteArray
      }
    val spark = batch.sparkSession
    val bBlooms = spark.sparkContext.broadcast(blooms)
    val keyedBatch = keyed(batch, keyCol, numBuckets, "__h", "__b")
    val flagged = keyedBatch.mapPartitions { rows =>
      // decode each bucket's blob once per (partition, bucket)
      val cache = scala.collection.mutable.HashMap.empty[Long, BloomFilter]
      rows.map { r =>
        val h = r.getLong(r.length - 2)
        val b = r.getLong(r.length - 1)
        val hit = bBlooms.value.get(b) match {
          case Some(blob) =>
            cache.getOrElseUpdate(b, BloomFilter.readFrom(blob))
              .mightContainLong(h)
          case None => false // bucket absent from index: corpus had no keys there
        }
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ hit)
      }
    }(org.apache.spark.sql.Encoders.row(
      keyedBatch.schema.add("__maybe", BooleanType, nullable = false)))
    val out = batch.columns
    val definitelyNew = flagged.filter(!col("__maybe"))
      .select(out.head, out.tail: _*)
    val verifiedNew = flagged.filter(col("__maybe"))
      .join(corpusKeys.select(corpusKeys.columns.head).toDF("__ck"),
        keyCol === col("__ck"), "left_anti")
      .select(out.head, out.tail: _*)
    definitelyNew.unionByName(verifiedNew)
  }

  // -------------------------------------------- persisted ingest index

  /** Write [[buildIndex]]'s output as the persisted index at `path`. */
  def writeIndex(corpus: DataFrame, keyCol: Column, path: String,
                 numBuckets: Int = 64, expectedItems: Long = 10000000L,
                 fpp: Double = 0.01): Unit =
    buildIndex(corpus, keyCol, numBuckets, expectedItems, fpp)
      .write.mode("overwrite").parquet(path)

  /** Fold an ingest batch's keys into the persisted index — a pure
    * parquet APPEND (new `(bucket, bloom)` rows; [[probeNew]] merges
    * multi-row buckets at load). `expectedItems`/`fpp`/`numBuckets` MUST
    * match the original [[writeIndex]] call: Spark's sketch only merges
    * filters of identical bit width, which these parameters determine.
    * Each appended row costs one blob; run [[compactIndex]] on the same
    * cadence as the minhash index compaction to re-bound the file count
    * under long-running ingest. */
  def appendIndex(batch: DataFrame, keyCol: Column, path: String,
                  numBuckets: Int = 64, expectedItems: Long = 10000000L,
                  fpp: Double = 0.01): Unit =
    buildIndex(batch, keyCol, numBuckets, expectedItems, fpp)
      .write.mode("append").parquet(path)

  /** Rewrite the persisted index with one merged blob per bucket.
    * Bucket blobs are dimension-sized by construction, so the merge runs
    * where [[probeNew]] already does that work — on the driver — and the
    * rewrite is atomic-enough for the batch cadence (overwrite of a
    * bounded relation). */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
                   path: String): Unit = {
    val merged = spark.read.parquet(path)
      .select(col("bucket").cast("long"), col("bloom"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (b, rows) =>
        val m = BloomFilter.readFrom(rows.head.getAs[Array[Byte]](1))
        rows.tail.foreach(r =>
          m.mergeInPlace(BloomFilter.readFrom(r.getAs[Array[Byte]](1))))
        val bos = new java.io.ByteArrayOutputStream()
        m.writeTo(bos)
        (b, bos.toByteArray)
      }.toSeq
    import spark.implicits._
    merged.toDF("bucket", "bloom")
      .write.mode("overwrite").parquet(path)
  }
}
