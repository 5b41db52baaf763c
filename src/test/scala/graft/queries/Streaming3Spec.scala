package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the transformWithState gate: the cross-batch profile must be
  * run-deterministic (state accumulation + timer flush cannot depend on
  * scheduling), and the state-store provider conf must be restored after
  * the query so co-resident streaming queries keep their default.
  */
class Streaming3Spec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.codegen.maxFields", "256")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("stream_tws_profile is run-deterministic and restores the provider conf") {
    val dir = "/root/testdata/sf0.001"
    val before = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val a = Streaming3.streamTwsProfile(spark, dir).collect().map(_.toString).toSeq
    val b = Streaming3.streamTwsProfile(spark, dir).collect().map(_.toString).toSeq
    assert(a.nonEmpty, "profile gate must emit rows")
    assert(a == b, "two runs of the same binary+data must emit identical rows")
    assert(spark.conf.getOption("spark.sql.streaming.stateStore.providerClass") == before,
      "provider conf must be restored after the query")
  }
}
