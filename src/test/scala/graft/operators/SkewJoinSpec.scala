package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Layout

/** Plan-shape law for q48: AQE's skew-join handling must actually SPLIT
  * the hot partition. The session scales the skew thresholds down to the
  * test data (production defaults are 256 MB partitions — toy-scale data
  * would never trip them), exactly the way a 100 TB deployment leaves
  * them at defaults; what is being pinned is that the query's shape is
  * one AQE can rescue. The values themselves are gated by the DuckDB
  * oracle in the correctness run.
  */
class SkewJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // scale the skew detector to fixture bytes: a partition is skewed if
    // > factor x median AND > threshold; split targets the advisory size
    .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // sf0.01: ~60k lineitem rows, ~92% on the hot key — hot partition is
  // comfortably past the scaled-down threshold, siblings are not
  private val sf = "/root/testdata/sf0.01"

  test("q48: AQE splits the hot partition (skew=true on the sort-merge join)") {
    val df = Layout.q48SkewJoin(spark, sf)
    val rows = df.collect()
    // final adaptive plan exists only after execution
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), s"adaptive plan did not finalize:\n$plan")
    assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
    assert(plan.contains("skew=true"),
      s"AQE did not split the skewed partition — straggler shape survived:\n$plan")
    // hot key 0 + passthrough keys 23, 24 -> three nations
    assert(rows.length == 3, s"expected 3 nation rows, got ${rows.length}")
    val total = rows.map(_.getLong(1)).sum
    val expected = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(total == expected,
      s"skew split must not duplicate or drop rows: joined $total of $expected")
  }

  test("q48 control: without the skew-join rule the hot partition stays whole") {
    val prev = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try {
      val df = Layout.q48SkewJoin(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") && !plan.contains("skew=true"),
        s"control run should keep the straggler shape:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.skewJoin.enabled", prev)
  }
}
