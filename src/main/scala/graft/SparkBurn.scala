package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SparkBurn {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup
    spark.range(0, 10000000, 1, cores * 4).select(sum(length(sha2(col("id").cast("string"), 256)))).collect()
    val t0 = System.nanoTime()
    spark.range(0, 100000000, 1, cores * 4).select(sum(length(sha2(col("id").cast("string"), 256)))).collect()
    println(f"BURN cores=$cores ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
