import org.apache.spark.sql.SparkSession
val spark = SparkSession.builder().master("local[8]")
  .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false")
  .config("spark.sql.session.timeZone","UTC")
  .config("spark.sql.codegen.maxFields","256").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
val d = "/root/testdata/sf0.01"
val skip = Set("stream_source_read","stream_exactly_once","stream_window_agg")
graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
  if (!skip(name)) {
    try {
      val plan = fn(spark, d).queryExecution.executedPlan.toString
      val pushed = "PushedFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined
      val bhj = plan.contains("BroadcastHashJoin")
      val smj = plan.contains("SortMergeJoin")
      val cart = plan.contains("CartesianProduct")
      val bnl = plan.contains("BroadcastNestedLoopJoin")
      // tree toString marks whole-stage codegen with "*(n)" node prefixes;
      // the literal word only appears in explain("formatted")
      val wsc = plan.contains("*(")
      val took = plan.contains("TakeOrderedAndProject")
      println(f"AUDIT $name%-26s pushed=$pushed%-5s bhj=$bhj%-5s smj=$smj%-5s cart=$cart%-5s bnl=$bnl%-5s codegen=$wsc%-5s topk=$took")
    } catch { case e: Exception => println(s"AUDIT $name ERROR ${e.getMessage.take(60)}") }
  }
}
spark.stop(); sys.exit(0)
