package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one gate query
  * WITHOUT executing it — `runMain graft.ExplainQuery <sfDir> <name>`.
  * The plan-shape companion to [[TimeQueries]]: when a query dies at a
  * scale the fixtures never reach (partitioning lies, zip mismatches,
  * codegen fallbacks), the plan names the offending operator without a
  * 10-minute run. */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.maxFields", "256")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      println(s"==== $name ====")
      println(fn(spark, sfDir).queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
