package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extension surface (beyond reference parity — the
  * reference is a batch library, SURVEY §2.6/§7).
  *
  * Two classes of operator:
  *  - stateless interval transforms (region select, expand, bin
  *    assignment) stream as-is — they're pure `Column` expressions;
  *  - order-sensitive sweeps (merge/cluster, sessionize) need keyed state:
  *    `flatMapGroupsWithState` keyed by chrom/user with an event-time
  *    watermark.
  */
object StreamOps {

  /** Tumbling event-time window aggregation with watermark — works on both
    * batch and streaming frames. */
  def windowedEventCounts(events: DataFrame, tsCol: String = "ts",
                          window_ : String = "1 hour",
                          watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("value_sum"))

  /** Streaming bin assignment: stateless — each interval tagged with its
    * genome bin, ready for downstream stateful merge keyed by (chrom,bin). */
  def assignBins(intervals: DataFrame, binSize: Long): DataFrame =
    intervals.withColumn("bin",
      ((col("start") - pmod(col("start"), lit(binSize))) / lit(binSize))
        .cast("long"))

  case class Iv(chrom: String, start: Long, end: Long)
  case class MergedRun(chrom: String, start: Long, end: Long, nIntervals: Long)
  case class SweepState(curStart: Long, curEnd: Long, n: Long, maxSeen: Long)

  /** Stateful streaming merge: intervals arrive per chrom in event order
    * (enforce with a sorted source or a watermark+sort upstream); emits a
    * merged run whenever a gap > minDist closes it. The streaming analog of
    * the reference's cummax sweep (`arrops.py:462-477`) via
    * `flatMapGroupsWithState` — state is one open run per chrom, O(1).
    */
  def streamingMerge(intervals: Dataset[Iv], minDist: Long = 0)
                    : Dataset[MergedRun] = {
    import intervals.sparkSession.implicits._
    intervals
      .groupByKey(_.chrom)
      .flatMapGroupsWithState[SweepState, MergedRun](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (chrom: String, rows: Iterator[Iv], state: GroupState[SweepState]) =>
          // batch arrivals are not globally ordered: sort this micro-batch
          val sorted = rows.toSeq.sortBy(iv => (iv.start, iv.end))
          var st = state.getOption.getOrElse(SweepState(Long.MinValue, Long.MinValue, 0L, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer.empty[MergedRun]
          for (iv <- sorted) {
            if (st.n == 0L) {
              st = SweepState(iv.start, iv.end, 1L, iv.end)
            } else if (iv.start <= st.curEnd + minDist) {
              st = st.copy(curEnd = math.max(st.curEnd, iv.end), n = st.n + 1)
            } else {
              out += MergedRun(chrom, st.curStart, st.curEnd, st.n)
              st = SweepState(iv.start, iv.end, 1L, iv.end)
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
