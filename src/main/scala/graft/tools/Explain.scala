package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the formatted physical plan of declared queries.
  * Usage: runMain graft.tools.Explain <query> [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args(0).split(",").foreach { name =>
      println(s"===== $name =====")
      println(graft.SparkEntry.queries(name)(spark, sf)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
