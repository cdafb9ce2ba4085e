package graft
import org.apache.spark.sql.SparkSession
/** Prints formatted physical plans for representative queries — used to
  * audit pushdown/broadcast/shuffle structure per round. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Scratch.tune(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("iv_select", "iv_overlap_inner", "iv_merge", "iv_coverage")
    for (n <- names) {
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
