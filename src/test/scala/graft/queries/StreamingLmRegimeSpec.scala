package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Regime equality for the streaming LM scorer: forcing every LM table
  * past the broadcast guard (maxTypes = 0) switches the per-batch
  * scoring joins from three broadcasts to shuffle equi-joins, and the
  * accumulated scores must be BIT-IDENTICAL to the broadcast regime's:
  * the guard crossover is a plan decision, never a semantics decision
  * (the batch row's TextBigramKnSpec pins the same law for its
  * inner-join ladder; this pins the OOV left-join ladder the streaming
  * scorer adds). */
class StreamingLmRegimeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("forced above-guard shuffle regime scores exactly like the broadcast regime") {
    val dir = "/root/testdata/sf0.001"
    def rows(maxTypes: Long) =
      Streaming4.streamLmScoreWith(spark, dir, maxTypes).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val broadcastRegime = rows(Long.MaxValue)
    val gramKeyRegime = rows(0L)
    assert(broadcastRegime.nonEmpty)
    assert(gramKeyRegime == broadcastRegime,
      "gram-key regime diverged from the broadcast regime")
  }
}
