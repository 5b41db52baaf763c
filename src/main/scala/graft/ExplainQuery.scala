package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one gate query
  * WITHOUT executing it — `runMain graft.ExplainQuery <sfDir> <name>`.
  * The plan-shape companion to [[TimeQueries]]: when a query dies at a
  * scale the fixtures never reach (partitioning lies, zip mismatches,
  * codegen fallbacks), the plan names the offending operator without a
  * 10-minute run.
  *
  * Exception to the no-execute contract: queries whose FRAME
  * CONSTRUCTION already runs Spark jobs execute for real here —
  * every `stream_*` harness (building the returned frame runs the
  * whole stream to completion) and guard-bearing rows like
  * `emb_outlier` (its i64-headroom guard is a collect at construction
  * time). For those names this tool prints the plan of the FINAL
  * read-back frame and pays the run; prefer [[TimeQueries]] when the
  * run itself is what you want measured. */
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
