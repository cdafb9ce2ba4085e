package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The shared order-free content signature: bit_xor of per-row
  * xxhash64 over every output column. ONE definition so per-query
  * signatures stay comparable across Bench, the bench tools, and any
  * future artifact (bit_xor, not sum: a sum of 64-bit hashes overflows
  * under ANSI mode; xxhash64 over all columns so Catalyst cannot prune
  * projection-only work out of a timing sink). Verify's aux-dump
  * signature intentionally differs (sorted columns over the WRITTEN
  * parquet, for the DuckDB compare) and is not this. */
object Sig {
  def sink(df: DataFrame): (Long, Long) = {
    val r = df.select(xxhash64(df.columns.map(col): _*).as("__h"))
      .agg(count(lit(1)).as("__n"), bit_xor(col("__h")).as("__sig"))
      .head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }
}
