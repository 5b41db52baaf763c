package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.VectorOps
import graft.queries.Tables

/** K-means clustering over the embeddings table (Lloyd's algorithm),
  * built for determinism and scale:
  *
  *  - Assignment is pure codegen: per centroid, score = |c|² − 2·x·c
  *    (the |x|² term is constant under argmin) via the native
  *    [[VectorOps.dotf]] kernel against a broadcast literal centroid;
  *    argmin = array_min over (score, k) structs, ties to the lowest k.
  *    No UDF, no driver loop over rows — one narrow map per iteration.
  *  - Centroid update is a (cluster, dim) hash aggregate with exact
  *    decimal sums, so the new centroids do not depend on partitioning
  *    or aggregation order (a plain double mean would drift run-to-run
  *    and break the gate's hash check).
  *  - Only K×D numbers ever reach the driver per iteration.
  *
  * At 100 TB the same loop holds: the scan dominates, each iteration is
  * one map + one shuffle on (cluster, dim) — K·D groups — and the
  * centroid table stays driver-sized. Init is the K lowest vec_ids
  * (deterministic; k-means|| would replace it at real scale without
  * changing the iteration shape).
  */
object Clustering {
  private val K = 10
  private val Iters = 3
  private val SumDec = DecimalType(28, 10)

  private def norm2(c: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < c.length) { acc += c(i).toDouble * c(i).toDouble; i += 1 }
    acc
  }

  /** Adds `cluster` (argmin centroid) and `score` (|c|² − 2·x·c). */
  private def assign(emb: DataFrame, centroids: Array[Array[Float]]): DataFrame = {
    val scored = centroids.zipWithIndex.map { case (c, k) =>
      struct(
        (lit(norm2(c)) - lit(2.0) * VectorOps.dotf(col("embedding"), lit(c))).as("s"),
        lit(k).as("k"))
    }
    emb.withColumn("best", array_min(array(scored: _*)))
      .withColumn("cluster", col("best.k"))
      .withColumn("score", col("best.s"))
      .drop("best")
  }

  /** Final per-cluster stats: size and exact WCSS (decimal-summed). */
  def embKmeans(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d).select($"vec_id", $"embedding").persist()
    var centroids: Array[Array[Float]] = emb.orderBy($"vec_id").limit(K)
      .collect().map(_.getSeq[Float](1).toArray)
    for (_ <- 0 until Iters) {
      val means = assign(emb, centroids)
        .select($"cluster", posexplode($"embedding").as(Seq("pos", "x")))
        .groupBy($"cluster", $"pos")
        .agg((sum($"x".cast(SumDec)) / count(lit(1))).cast("float").as("m"))
        .collect()
      val next = centroids.map(_.clone()) // empty cluster keeps its centroid
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getFloat(2)
      }
      centroids = next
    }
    assign(emb, centroids)
      .withColumn("dist2", VectorOps.dotf($"embedding", $"embedding") + $"score")
      .groupBy($"cluster")
      .agg(count(lit(1)).as("n_vecs"),
        sum($"dist2".cast(SumDec)).cast("double").as("wcss"))
      .orderBy($"cluster")
  }

  /** WCSS against the deterministic init centroids (spec baseline). */
  def initialWcss(s: SparkSession, d: String): Double = {
    import s.implicits._
    val emb = Tables.embeddings(s, d).select($"vec_id", $"embedding")
    val init = emb.orderBy($"vec_id").limit(K).collect().map(_.getSeq[Float](1).toArray)
    assign(emb, init)
      .withColumn("dist2", VectorOps.dotf($"embedding", $"embedding") + $"score")
      .agg(sum($"dist2".cast(SumDec)).cast("double")).head.getDouble(0)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_kmeans" -> embKmeans _,
  )
  /** No oracle: iterative clustering is not SQL-expressible; the spec
    * asserts determinism, partition-count invariance, and WCSS descent. */
  val oracles: Map[String, String] = Map.empty
}
