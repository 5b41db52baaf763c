package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Hand-arithmetic pin for the integer PageRank recurrence
  * ([[Graph.pagerankOn]]) plus its structural invariants. The recurrence
  * is pure 64-bit integer math (micro-unit ranks, integer division,
  * integer-percent damping), so every expected value below is computed
  * by hand — a wrong join direction, a missed dangling coalesce, or a
  * float sneaking into the sum changes these digits. */
class GraphPagerankSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ranksOf(pairs: Seq[(Long, Long)], iters: Int): Map[Long, (Long, Long)] = {
    import spark.implicits._
    Graph.pagerankOn(pairs.toDF("a_id", "b_id"), iters)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
  }

  test("path graph 1-2-3: two hand-computed iterations") {
    // edges (symmetrized): 1->2, 2->1, 2->3, 3->2; deg 1:1, 2:2, 3:1
    // r0 = 1_000_000 each.
    // iter 1 contributions: node1 <- r0(2) DIV 2 = 500_000
    //                       node2 <- r0(1) DIV 1 + r0(3) DIV 1 = 2_000_000
    //                       node3 <- 500_000
    // r1 = 150_000 + (85 * in) DIV 100:
    //   node1: 150_000 + 42_500_000 DIV 100 = 575_000
    //   node2: 150_000 + 170_000_000 DIV 100 = 1_850_000
    //   node3: 575_000
    val r1 = ranksOf(Seq((1L, 2L), (2L, 3L)), iters = 1)
    assert(r1 == Map(1L -> (1L, 575000L), 2L -> (2L, 1850000L), 3L -> (1L, 575000L)))

    // iter 2 contributions: node1 <- r1(2) DIV 2 = 925_000
    //                       node2 <- 575_000 + 575_000 = 1_150_000
    //                       node3 <- 925_000
    // r2: node1/3: 150_000 + (85 * 925_000) DIV 100 = 936_250
    //     node2:   150_000 + (85 * 1_150_000) DIV 100 = 1_127_500
    val r2 = ranksOf(Seq((1L, 2L), (2L, 3L)), iters = 2)
    assert(r2 == Map(1L -> (1L, 936250L), 2L -> (2L, 1127500L), 3L -> (1L, 936250L)))
  }

  test("symmetric regular graph is a fixed point at its uniform rank") {
    // triangle: every node has deg 2 and identical neighborhoods, so
    // ranks stay equal across nodes at every iteration; with integer
    // damping the uniform value converges to 999_999..1_000_000
    // (150_000 + 85% of 1_000_000 = 1_000_000 exactly at r1)
    val r = ranksOf(Seq((1L, 2L), (2L, 3L), (1L, 3L)), iters = Graph.PrIters)
    assert(r.values.map(_._2).toSet.size == 1, s"uniform ranks expected: $r")
    assert(r(1L) == (2L, 1000000L))
  }

  test("star center out-ranks leaves; leaves tie exactly") {
    import spark.implicits._
    val pairs = Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L))
    val out = Graph.pagerankOn(pairs.toDF("a_id", "b_id"), Graph.PrIters)
      .orderBy(org.apache.spark.sql.functions.desc("r_micro"),
        org.apache.spark.sql.functions.asc("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.head._1 == 10L, s"hub first: ${out.toSeq}")
    // rank-desc, doc_id-asc tiebreak: leaves in id order
    assert(out.map(_._1).toSeq == Seq(10L, 1L, 2L, 3L, 4L))
    assert(out.tail.map(_._2).toSet.size == 1, "leaves tie exactly")
  }

  test("keep-central: one survivor per cluster, the max-rank member, ties to min id") {
    import spark.implicits._
    // two components: path 1-2-3 (center 2 out-ranks the ends) and
    // pair 7-8 (exact rank tie -> smallest doc_id survives)
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("a_id", "b_id")
    val cmap = Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (7L, 7L, 2L), (8L, 7L, 2L)).toDF("doc_id", "cluster_id", "cluster_size")
    val out = Graph.dedupKeepCentralOn(cmap, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(4))).toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L, 7L, 8L), "doc_id-ordered output")
    val kept = out.filter(_._3).map(t => t._2 -> t._1).toMap
    assert(kept == Map(1L -> 2L, 7L -> 7L),
      s"path center 2 and tie-min 7 must survive: $out")
  }

  test("randomized: Spark recurrence equals an independent in-memory reference on 5 seeded graphs") {
    // differential oracle: a direct Map-based spelling of the integer
    // recurrence, sharing NO code with the Spark plan — a wrong join
    // direction, a double-counted symmetric edge, or a lost dangling
    // coalesce diverges on some random structure nobody hand-picked
    val rng = new scala.util.Random(20260816L)
    for (trial <- 1 to 5) {
      val n = 8 + rng.nextInt(10)
      val pairs = for {
        a <- 0 until n; b <- (a + 1) until n if rng.nextInt(4) == 0
      } yield (a.toLong, b.toLong)
      if (pairs.nonEmpty) {
        val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
          .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
        val deg = adj.view.mapValues(_.size.toLong).toMap
        var r = adj.keys.map(_ -> 1000000L).toMap
        for (_ <- 1 to Graph.PrIters)
          r = adj.keys.map { v =>
            val in = adj(v).map(u => r(u) / deg(u)).sum
            v -> (150000L + 85L * in / 100L)
          }.toMap
        val expected = adj.keys.map(v => v -> ((deg(v), r(v)))).toMap
        val got = ranksOf(pairs, Graph.PrIters)
        assert(got == expected, s"trial $trial (n=$n, ${pairs.size} pairs) diverged")
      }
    }
  }

  test("isolated pair: both endpoints at the two-node fixed point") {
    // two nodes, deg 1 each: in(v) = r(u) exactly, so the recurrence is
    // r' = 150_000 + 85% r — fixed point 1_000_000 (integer-exact)
    val r = ranksOf(Seq((7L, 8L)), iters = Graph.PrIters)
    assert(r == Map(7L -> (1L, 1000000L), 8L -> (1L, 1000000L)))
  }

  test("rank frame is a train-once artifact keyed on the LSH parameters") {
    // the Curation7Spec clusterMap law, for the rank artifact: repeat
    // consumers share ONE build per corpus, and the key carries the
    // parameters that shape the LSH pair path (a constant change must
    // rebuild, not silently reuse — the r19 ADVICE hazard)
    val d = "/root/testdata/sf0.001"
    Graph.dedupKeepCentral(spark, d).collect()
    Graph.dedupKeepCentral(spark, d).collect()
    val key = s"pagerank|$d|iters=${Graph.PrIters}|${Dedup.LshParamsKey}" +
      s"|in=${Models.inputFingerprint(s"$d/documents.parquet")}"
    assert(Models.builds(key) == 1,
      s"rank frame must build exactly once per JVM, built ${Models.builds(key)} times")
  }
}
