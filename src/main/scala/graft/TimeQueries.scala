package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: steady-state timing of a query subset without the full
  * [[Bench]] sweep. `runMain graft.TimeQueries <sfDir> <n1,n2,...> [reps]`
  * prints per-run and min seconds per query (min = least-noise estimate,
  * same rationale as Bench's re-run rule).
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
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
      // rows via one untimed count (sanity), timing via the noop sink —
      // count() lets Catalyst prune row-count-preserving tails (left
      // joins against unique aggregates vanish entirely; see Bench)
      val rows = fn(spark, sfDir).count()
      val times = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"TIME $name%-26s run$i $sec%7.2fs rows=$rows")
        sec
      }
      println(f"TIME $name%-26s min  ${times.min}%7.2fs")
    }
    spark.stop()
  }
}
