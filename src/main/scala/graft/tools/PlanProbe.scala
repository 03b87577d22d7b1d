package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway plan inspector used while iterating on operator plans —
  * prints the formatted physical plan of one declared query. Not part
  * of the driver contract. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("bm25_topk")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.init(spark)
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    println("==== BEFORE EXECUTION (formatted) ====")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    df.collect()
    println("==== AFTER EXECUTION (AQE final) ====")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
