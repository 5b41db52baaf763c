package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Global determinism law over the whole batch inventory.
  *
  * The driver's correctness gate hashes each query's rows IN ORDER, so any
  * query whose output depends on partitioning or run-to-run scheduling —
  * an under-specified ORDER BY with ties, a double aggregate summed in
  * shuffle order, an argmax with a nondeterministic tie-break — is a gate
  * flake waiting for the partition count to change. This spec runs every
  * batch query under TWO different shuffle-partition counts and demands
  * byte-identical ordered output, so the hazard fails here, by name,
  * instead of surfacing as an unreproducible gate mismatch.
  *
  * Streaming rows are excluded (each run stages its own source feed;
  * their determinism is gated by the stream/batch parity oracles).
  */
class DeterminismSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.codegen.maxFields", "256")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  private def canon(name: String, parts: Int): String = {
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    graft.SparkEntry.queries(name)(spark, sf)
      .collect().map(_.toString).mkString("\n")
  }

  test("every batch query returns identical ordered rows at 4 vs 7 shuffle partitions") {
    val batch = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("stream_"))
    val diffs = batch.flatMap { name =>
      val a = canon(name, 4)
      val b = canon(name, 7)
      if (a != b) Some(name) else None
    }
    assert(diffs.isEmpty,
      s"partitioning-dependent output (gate-flake hazard) in: ${diffs.mkString(", ")}")
  }
}
