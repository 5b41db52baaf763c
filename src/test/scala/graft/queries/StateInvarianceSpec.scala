package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Measured state-size invariance for the always-on streaming monitors.
  *
  * Each harness claims its state is bounded by the KEY DOMAIN (users /
  * types×days / labels×dim), never by event volume — scaladoc claims
  * until round 15. This spec replays a 10× event volume with the SAME
  * key domain through the real gate harnesses and asserts the final
  * progress's `stateOperators.numRowsTotal` (recorded by
  * [[StreamPlans.capture]]) is IDENTICAL across volumes and equal to
  * the key-domain size. A state leak that scales with events (e.g. a
  * per-event cell, a missing aggregate pushdown) fails here with the
  * two measured counts in the message.
  */
class StateInvarianceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val Users = 20
  private val Types = Array("view", "click", "cart", "purchase", "error")
  private val Days = 5
  private val Labels = 10
  private val Dim = 8
  private val BaseUs = 1767225600000000L // 2026-01-01T00:00:00Z

  /** `n` events over a FIXED key domain: `Users` users, 5 types, 5 days
    * (all ids < the harness CUTOFF of 2000, so every event streams). */
  private def writeEvents(n: Int): String = {
    require(n <= 2000, "ids must stay under the streaming-harness CUTOFF")
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft-sinv").toString
    (0 until n).map { i =>
      val tsUs = BaseUs + ((i / 5) % Days).toLong * 86400000000L + i.toLong * 1000L
      (i.toLong, tsUs, (i % Users).toLong, Types(i % Types.length),
        (i % 7).toDouble, "{}")
    }.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .select($"event_id",
        timestamp_micros($"ts_us").cast(TimestampNTZType).as("ts"),
        $"user_id", $"event_type", $"value", $"props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** `n` vectors over a fixed `Labels`-label, `Dim`-dim domain. */
  private def writeEmbeddings(n: Int): String = {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft-sinv-emb").toString
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(Dim)(p => 0.01f * ((i + p) % 50)), i % Labels)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def stateRowsAfter(name: String)(run: => Unit): Long = {
    run
    StreamPlans.stateRowsOf(name).getOrElse(
      fail(s"$name recorded no state rows — capture() saw no state operator"))
  }

  test("stream_journey_markov: state rows = users, invariant under 10x events") {
    val s1 = stateRowsAfter("stream_journey_markov") {
      Streaming3.streamJourneyMarkov(spark, writeEvents(200)).collect()
    }
    val s10 = stateRowsAfter("stream_journey_markov") {
      Streaming3.streamJourneyMarkov(spark, writeEvents(2000)).collect()
    }
    assert(s1 == s10, s"state grew with volume: $s1 rows at x1 vs $s10 at x10")
    assert(s1 == Users.toLong,
      s"state must be one ValueState cell per user ($Users), got $s1")
  }

  test("stream_value_anomaly: state rows = types x days, invariant under 10x events") {
    val keyDomain = Types.length.toLong * Days
    val s1 = stateRowsAfter("stream_value_anomaly") {
      Streaming3.streamValueAnomaly(spark, writeEvents(200)).collect()
    }
    val s10 = stateRowsAfter("stream_value_anomaly") {
      Streaming3.streamValueAnomaly(spark, writeEvents(2000)).collect()
    }
    assert(s1 == s10, s"state grew with volume: $s1 rows at x1 vs $s10 at x10")
    assert(s1 == keyDomain,
      s"state must be the types x days daily frame ($keyDomain), got $s1")
  }

  test("stream_emb_drift: state rows = labels x dim, invariant under 10x vectors") {
    val keyDomain = Labels.toLong * Dim
    val s1 = stateRowsAfter("stream_emb_drift") {
      Streaming3.streamEmbDrift(spark, writeEmbeddings(50)).collect()
    }
    val s10 = stateRowsAfter("stream_emb_drift") {
      Streaming3.streamEmbDrift(spark, writeEmbeddings(500)).collect()
    }
    assert(s1 == s10, s"state grew with volume: $s1 rows at x1 vs $s10 at x10")
    assert(s1 == keyDomain,
      s"state must be the labels x dim centroid frame ($keyDomain), got $s1")
  }
}
