package graft.core

import org.apache.spark.sql.SparkSession

/** Local-mode scratch placement.
  *
  * `spark.local.dir` receives every shuffle file, spill, localCheckpoint
  * block, and streaming state/WAL write. The sandbox VM throttles block-
  * device writes for hours at a time (~40 MB/s fdatasync measured mid-
  * phase vs 400+ MB/s tmpfs), which stalls exactly the multi-job persist/
  * checkpoint/state-store queries the r5 verdict flagged as 15-65x slow
  * while pure scans stay fast. Single-node runs on this box have 126 GiB
  * of /dev/shm — placing scratch there makes the engine immune to the
  * phase. On a real cluster this comes from the resource manager
  * (YARN/K8s local dirs), not this helper.
  */
object Scratch {
  /** tmpfs scratch dir if available, else None (Spark default applies). */
  lazy val dir: Option[String] = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) {
      val sub = new java.io.File(shm, "graft-spark-local")
      sub.mkdirs()
      Some(sub.getAbsolutePath)
    } else None
  }

  /** Apply to a builder: scratch placement plus stall-proof heartbeats.
    *
    * The heartbeat settings exist because the sandbox VM's documented
    * stall phases (D-state storms) can freeze the whole JVM for minutes:
    * with the stock 120s `spark.network.timeout`, the driver-side
    * HeartbeatReceiver then "removes" the local executor and shuts the
    * context down mid-job — observed twice on the sf1
    * iv_overlap_bucketed cert (a ~138s gap killed an otherwise healthy
    * 15-minute run; the identical rerun under calm weather passed). A
    * 10-minute timeout rides out the phase; in local mode there is no
    * real liveness question for the in-process "executor" anyway. On a
    * real cluster these would come from the site config, not here. */
  def tune(b: SparkSession.Builder): SparkSession.Builder =
    dir.fold(b)(d => b.config("spark.local.dir", d))
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "20s")
}
