package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The document-frequency cap — the knob that bounds pair-join fan-out
  * on degenerate shingles at 100 TB. A cap looser than every shingle's
  * df must be a no-op (exactness), and any cap can only REMOVE pairs
  * relative to uncapped (it lowers observed intersections, never raises
  * them), so capped results are always a subset. */
class DedupDfCapSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("BoundedGroupAgg: a group at the cap survives whole, one over overflows to empty") {
    val s = spark
    import s.implicits._
    // groups: key 1 -> 4 members (== cap), key 2 -> 5 members (> cap)
    val rows = (1L to 4L).map(i => (1L, i, 10L)) ++ (1L to 5L).map(i => (2L, i, 10L))
    val got = rows.toDF("k", "doc_id", "sz")
      .repartition(4) // members spread across partials: merge path exercised
      .groupBy($"k")
      .agg(graft.functions.BoundedGroupAgg.boundedGroup($"doc_id", $"sz", 4).as("ds"))
      .collect().map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1).length).toMap
    assert(got(1L) == 4, s"at-cap group must keep all members: $got")
    assert(got(2L) == 0, s"over-cap group must overflow to empty (sticky across merges): $got")
  }

  test("a cap above every shingle df is exact; tighter caps only remove pairs") {
    val uncapped = pairs(Dedup.dedupNgramJaccard(spark, sf))
    val loose = pairs(Dedup.dedupNgramJaccardCapped(spark, sf, dfCap = 1000000))
    assert(loose == uncapped, "loose cap must be a no-op")
    val tight = pairs(Dedup.dedupNgramJaccardCapped(spark, sf, dfCap = 3))
    assert(tight.subsetOf(uncapped), "capping must never invent pairs")
  }
}
