package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Crafted-fixture pins for [[Dedup.ccFixpointDelta]]'s one-level-closure
  * argument — the invariant the oracled gate rows cover only end-to-end.
  *
  * The load-bearing case is a CHAIN of standing clusters merged through
  * multiple fresh edges: closure holds because every cluster on the chain
  * contains a fresh ENDPOINT, so one level of "clusters touching a fresh
  * doc" is already the transitive touched set. The spec also pins the
  * untouched-cluster bit-pass-through, fresh docs the standing map has
  * never seen (new clusters and new members of standing clusters), and
  * the enforced broadcast-precondition boundary (an over-limit touched
  * membership must fall back to the full rebuild, same labels). */
class CcFixpointDeltaSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def edges(ps: (Long, Long)*): DataFrame = {
    val s = spark; import s.implicits._
    ps.toDF("a_id", "b_id")
  }

  /** Standing corpus: clusters A={1,2}, B={3,4}, C={5,6} (the chain
    * fodder) and D={7,8,9} (must pass through untouched). */
  private val standingEdges: Seq[(Long, Long)] =
    Seq(1L -> 2L, 3L -> 4L, 5L -> 6L, 7L -> 8L, 8L -> 9L)

  private def rows(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def check(fresh: DataFrame, maxBroadcastMembers: Long): Unit = {
    val standing = edges(standingEdges: _*)
    val standingMap = Dedup.ccFixpoint(standing)
    val merged = Dedup.ccFixpointDelta(standingMap, standing, fresh,
      maxBroadcastMembers)
    val rebuild = Dedup.ccFixpoint(standing.unionByName(fresh))
    assert(merged.count() === rebuild.count(),
      "merged map row count diverged from the full rebuild")
    assert(rows(merged) === rows(rebuild),
      "merged labels diverged from the full rebuild")
    merged.unpersist(); rebuild.unpersist(); standingMap.unpersist()
  }

  test("chain of 3 standing clusters merged through fresh edges == full rebuild") {
    // 2-3 and 4-5 chain A-B-C; cluster B contributes no fresh endpoint
    // beyond the chain, which is exactly the closure case under test
    check(edges(2L -> 3L, 4L -> 5L), Dedup.DeltaBroadcastMaxMembers)
  }

  test("fresh docs unseen by the standing map: new cluster + new member") {
    // 200-201 is a brand-new cluster; 300 joins standing cluster A; 100
    // extends chain-end C — none of 100/200/201/300 exists in the map
    check(edges(2L -> 3L, 4L -> 5L, 6L -> 100L, 200L -> 201L, 2L -> 300L),
      Dedup.DeltaBroadcastMaxMembers)
  }

  test("untouched standing cluster rows are bit-identical pass-throughs") {
    val standing = edges(standingEdges: _*)
    val standingMap = Dedup.ccFixpoint(standing)
    val merged = Dedup.ccFixpointDelta(standingMap, standing,
      edges(2L -> 3L, 4L -> 5L))
    val before = rows(standingMap).filter(r => Set(7L, 8L, 9L)(r._1))
    val after = rows(merged).filter(r => Set(7L, 8L, 9L)(r._1))
    assert(before.nonEmpty && after === before,
      s"untouched cluster D changed: $before -> $after")
    merged.unpersist(); standingMap.unpersist()
  }

  test("over-limit touched membership falls back to the full rebuild") {
    // threshold 0 forces the guard for ANY touched membership: the
    // fallback must produce the same labels through shuffled joins
    check(edges(2L -> 3L, 4L -> 5L, 6L -> 100L), maxBroadcastMembers = 0L)
  }

  test("randomized closure property: delta merge == full rebuild on seeded graphs") {
    // the hand cases above pick the structures the closure ARGUMENT
    // names; this sweeps seeded random graphs so cluster shapes nobody
    // thought of (multi-edge chains, fresh-only islands touching two
    // standing chains, self-referential merges) are also pinned to the
    // rebuild. Seeded — a failure names its seed and replays exactly.
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 7919)
      def randomEdges(n: Int, maxNode: Int): Seq[(Long, Long)] =
        Seq.fill(n) {
          val a = rnd.nextInt(maxNode); val b = rnd.nextInt(maxNode)
          (math.min(a, b).toLong, (math.max(a, b) + 1).toLong)
        }
      val standingSeq = randomEdges(15, 30)
      // fresh edges range over a WIDER node set: some touch standing
      // clusters, some are brand-new docs the map has never seen
      val freshSeq = randomEdges(8, 45)
      val standing = edges(standingSeq: _*)
      val fresh = edges(freshSeq: _*)
      val standingMap = Dedup.ccFixpoint(standing)
      val merged = Dedup.ccFixpointDelta(standingMap, standing, fresh)
      val rebuild = Dedup.ccFixpoint(standing.unionByName(fresh))
      assert(rows(merged) === rows(rebuild),
        s"seed $seed: standing=$standingSeq fresh=$freshSeq")
      merged.unpersist(); rebuild.unpersist(); standingMap.unpersist()
    }
  }
}
