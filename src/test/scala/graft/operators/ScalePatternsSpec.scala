package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Scale-pattern evidence the gate queries can't show directly:
  * bucketing removes the join shuffle entirely (the co-located-join
  * story for repeatedly-joined 100 TB tables), and foreachBatch gives an
  * idempotent, batch-id-addressed sink (the exactly-once output story).
  */
class ScalePatternsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val warehouse = Files.createTempDirectory("graft-wh").toString

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events.ts is TIMESTAMP(NANOS)
    // force a sort-merge plan so the assertion is about bucketing, not
    // about the dim being small enough to broadcast
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  test("bucketed tables join without any shuffle exchange") {
    import spark.implicits._
    spark.read.parquet(s"$sf/lineitem.parquet")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    spark.read.parquet(s"$sf/orders.parquet")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must be exchange-free: both sides arrive pre-hashed
    // into the same 8 buckets. (The later single aggregation exchange on
    // o_orderpriority is expected and unrelated to the join.)
    val joinSubtree = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(plan.contains("SortMergeJoin"))
    assert(!joinSubtree.contains("Exchange hashpartitioning(l_orderkey")
      && !joinSubtree.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join still shuffles:\n$plan")
    // and it is not just planned but correct
    val viaBuckets = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/orders.parquet"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaBuckets == direct)
  }

  test("foreachBatch sink writes batch-id-addressed output idempotently") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-fb").toString
    val input = spark.read.parquet(s"$sf/events.parquet")
      .select($"event_id", $"event_type").limit(100)
    val stage = Files.createTempDirectory("graft-fb-in").toString
    input.coalesce(1).write.mode("overwrite").parquet(stage)

    val stream = spark.readStream.schema(input.schema).parquet(stage)
    val q = stream.writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
      // deterministic, re-runnable: a retried batch overwrites its own
      // directory instead of appending duplicates
      df.write.mode("overwrite").parquet(s"$out/batch=$id")
      // simulate the retry a failure-mid-commit would cause
      df.write.mode("overwrite").parquet(s"$out/batch=$id")
      ()
    }.start()
    try q.processAllAvailable() finally q.stop()

    val written = spark.read.parquet(s"$out/batch=0")
    assert(written.count() == 100)
    assert(written.select(sum($"event_id")).head.getLong(0) ==
      input.select(sum($"event_id")).head.getLong(0))
  }
}
