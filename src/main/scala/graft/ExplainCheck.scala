package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan inspection helper: prints formatted plans for key queries. */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val which = if (args.nonEmpty) args(0) else "all"
    def show(name: String): Unit = {
      println(s"########## $name")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    which match {
      case "all" => Seq("q_stats", "q_unique_url", "q_ref_orphans", "q_topk",
        "e_ann_brute").foreach(show)
      case q => show(q)
    }
    spark.stop()
  }
}
