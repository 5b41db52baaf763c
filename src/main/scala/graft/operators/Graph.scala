package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-importance propagation over the near-dup similarity graph —
  * the curation family BETWEEN connected components and survivor
  * selection. CC answers "which documents are interchangeable copies";
  * PageRank over the same edges answers "which copy is the most
  * CENTRAL version of its neighborhood" — the standard graph-importance
  * signal web-scale corpora use to pick canonical pages (and to weight
  * quality propagation), computed here as a first-class Spark plan.
  *
  * Engine parity by construction: the whole recurrence is 64-bit
  * integer arithmetic in micro-units (`r0 = 1e6`; each step is
  * `(1-d) + d * Σ r(u) DIV deg(u)` with integer division and integer
  * percent damping), so the DuckDB oracle matches bit-for-bit with ZERO
  * IEEE exposure — no rounding discipline needed, unlike the micro-nat
  * ln family ([[TextAnalysis.textPerplexity]]).
  *
  * Scale shape (100 TB): edges come from the df-capped pair kernel
  * ([[Dedup.dedupNgramJaccardCapped]] at [[Dedup.CcDfCap]] — the same
  * bounded-fan-out argument as `dedup_cc`), are SYMMETRIZED once and
  * persisted; each of the fixed [[Graph.PrIters]] iterations is one
  * equi-join of the persisted edge table against the O(nodes) rank
  * frame plus one partial-aggregated groupBy — per-iteration shuffle is
  * O(E) with map-side combine, no iteration-count blowup (iterations
  * are a constant, the plan grows linearly and never re-reads the
  * corpus). The output is K-bounded (TakeOrderedAndProject), never a
  * corpus-sized sort.
  */
object Graph {
  private[graft] val PrIters = 4
  private[graft] val PrTopK = 50
  /** Damping 0.85 as integer percent; (1-d) as rank micro-units. */
  private[graft] val DampPct = 85L
  private[graft] val BaseMicro = 150000L

  /** Fixed-iteration integer PageRank over undirected `pairs(a_id, b_id)`.
    * Nodes are the vertices incident to at least one pair (isolated
    * documents carry no graph signal — their rank is the closed-form
    * `BaseMicro + DampPct*1e6/100` fixed point and is excluded, exactly
    * as [[Dedup.ccFixpoint]] labels clustered docs only). */
  private[graft] def pagerankOn(pairs: DataFrame, iters: Int): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    val edges = pairs
      .unionByName(pairs.select($"b_id".as("a_id"), $"a_id".as("b_id")))
      .select($"a_id".as("src"), $"b_id".as("dst"))
      .persist()
    // symmetric graph: out-degree == in-degree, one aggregate serves both
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg")).persist()
    var ranks = deg.select($"src".as("doc_id"), $"deg")
      .withColumn("r_micro", lit(1000000L))
    for (_ <- 1 to iters) {
      // r(u) DIV deg(u): integer division is exact and order-free, so
      // the BIGINT contribution sum is associative — bit-equal on any
      // engine and any partitioning
      val contrib = edges.join(ranks, edges("src") === ranks("doc_id"))
        .select(edges("dst").as("doc_id"), expr("r_micro DIV deg").as("c_micro"))
      val summed = contrib.groupBy($"doc_id").agg(sum($"c_micro").as("in_micro"))
      ranks = deg.select($"src".as("doc_id"), $"deg")
        .join(summed, Seq("doc_id"), "left")
        .select($"doc_id", $"deg",
          expr(s"CAST($BaseMicro AS BIGINT) + " +
            s"($DampPct * coalesce(in_micro, CAST(0 AS BIGINT))) DIV 100")
            .as("r_micro"))
    }
    // materialize the K-bounded result while the loop's pins are alive,
    // then release them (the dedupClusters persist discipline)
    val out = ranks.orderBy($"r_micro".desc, $"doc_id").limit(PrTopK).persist()
    out.count()
    edges.unpersist()
    deg.unpersist()
    out
  }

  /** Gate row: top-[[PrTopK]] most central documents of the near-dup
    * similarity graph. */
  def graphPagerank(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    pagerankOn(
      Dedup.dedupNgramJaccardCapped(s, d, Dedup.CcDfCap).select($"a_id", $"b_id"),
      PrIters)
  }

  /** One unrolled iteration of the integer recurrence (the Spark loop
    * body, spelled in SQL). `e(s, t)` is [[Dedup.CcCteSql]]'s symmetric
    * edge CTE — the SAME pair semantics the Spark side consumes. */
  private def iterCte(k: Int): String =
    s"""r$k AS (
       |  SELECT dg.src AS doc_id, dg.deg,
       |    CAST($BaseMicro + ($DampPct * COALESCE(sm.in_micro, 0)) // 100 AS BIGINT) AS r_micro
       |  FROM deg dg LEFT JOIN (
       |    SELECT e.t AS doc_id, SUM(r.r_micro // r.deg) AS in_micro
       |    FROM e JOIN r${k - 1} r ON e.s = r.doc_id GROUP BY e.t
       |  ) sm ON dg.src = sm.doc_id
       |)""".stripMargin

  val graphPagerankSql: String =
    s"""WITH RECURSIVE ${Dedup.CcCteSql},
       |deg AS (SELECT s AS src, COUNT(*) AS deg FROM e GROUP BY s),
       |r0 AS (SELECT src AS doc_id, deg, CAST(1000000 AS BIGINT) AS r_micro FROM deg),
       |${(1 to PrIters).map(iterCte).mkString(",\n")}
       |SELECT doc_id, deg, r_micro FROM r$PrIters
       |ORDER BY r_micro DESC, doc_id LIMIT $PrTopK""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> graphPagerank _,
  )
  val oracles: Map[String, String] = Map(
    "graph_pagerank" -> graphPagerankSql,
  )
}
