package graft.core

import org.apache.spark.sql.DataFrame

/** Parallelism pinning for barrier exchanges.
  *
  * An argless `repartition(col)` leaves the partition count to AQE, which
  * sizes it from shuffle BYTES (64 MB advisory). That is the wrong cost
  * model for a barrier whose downstream stage is CPU-bound — interpreted
  * higher-order lambdas over token arrays (minhash signatures, shingle
  * explosion) cost seconds per MB, so AQE collapses them onto 1-2 tasks:
  * measured 3.5s -> 110s on the minhash pipeline at sf0.1/local[32], with
  * run-to-run nondeterminism as the map-output size straddled the
  * advisory. An explicit partition count is always respected, and
  * `spark.sql.shuffle.partitions` is exactly the knob a cluster
  * deployment already tunes to its core count.
  */
object Par {
  def width(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
}
