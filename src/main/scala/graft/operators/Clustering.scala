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
    try {
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
      // the result is K rows — land it on the driver so the scan cache can
      // be dropped before this frame leaves the operator
      val rows = assign(emb, centroids)
        .withColumn("dist2", VectorOps.dotf($"embedding", $"embedding") + $"score")
        .groupBy($"cluster")
        .agg(count(lit(1)).as("n_vecs"),
          sum($"dist2".cast(SumDec)).cast("double").as("wcss"))
        .orderBy($"cluster")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      s.createDataFrame(rows).toDF("cluster", "n_vecs", "wcss")
    } finally emb.unpersist()
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

  // --------------------------------------------------------------- PQ
  private val PqM = 4          // subspaces
  private val PqSub = 16       // dims per subspace (4 x 16 = 64)
  private val PqK = 16         // codes per subspace (4-bit codes)
  private val PqIters = 2

  /** Product quantization: an independent K-code codebook per subspace,
    * trained with the same deterministic Lloyd loop as [[embKmeans]]
    * (codegen'd assignment, decimal-exact centroid updates). A 64-dim
    * float vector compresses to M=4 4-bit codes — 256 B → 2 B, the
    * memory step that lets IVF-PQ indexes hold billions of vectors in
    * RAM at 100 TB corpus scale. Output: per-subspace code usage and
    * exact total squared reconstruction error (the codebook quality
    * metric), plus the compression ratio.
    *
    * Training cost per subspace-iteration is one scan + one (cluster,
    * dim) aggregate, all subspaces sharing the persisted base; only
    * M·K·PqSub floats reach the driver. */
  def embPq(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d).select($"vec_id", $"embedding").persist()
    try {
      embPqOn(s, emb)
    } finally emb.unpersist()
  }

  private def embPqOn(s: SparkSession, emb: DataFrame): DataFrame = {
    import s.implicits._
    val stats = (0 until PqM).map { m =>
      val sdf = emb.select($"vec_id",
        slice($"embedding", m * PqSub + 1, PqSub).as("embedding"))
      var codebook: Array[Array[Float]] = sdf.orderBy($"vec_id").limit(PqK)
        .collect().map(_.getSeq[Float](1).toArray)
      for (_ <- 0 until PqIters) {
        val means = assign(sdf, codebook)
          .select($"cluster", posexplode($"embedding").as(Seq("pos", "x")))
          .groupBy($"cluster", $"pos")
          .agg((sum($"x".cast(SumDec)) / count(lit(1))).cast("float").as("m"))
          .collect()
        val next = codebook.map(_.clone())
        means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getFloat(2))
        codebook = next
      }
      val agg = assign(sdf, codebook)
        .withColumn("dist2", VectorOps.dotf($"embedding", $"embedding") + $"score")
        .agg(countDistinct($"cluster").as("codes_used"),
          sum($"dist2".cast(SumDec)).cast("double").as("sq_err"),
          count(lit(1)).as("n_vecs"))
        .head()
      (m, agg.getLong(0), agg.getDouble(1), agg.getLong(2))
    }
    // 64 B of float32 per subspace vs one 4-bit code = 128x
    val compression = (PqSub * 4.0) / 0.5
    s.createDataFrame(stats).toDF("subspace", "codes_used", "sq_err", "n_vecs")
      .withColumn("compression_x", lit(compression))
      .orderBy($"subspace")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_kmeans" -> embKmeans _,
    "emb_pq" -> embPq _,
  )
  /** No oracle: iterative clustering is not SQL-expressible; the spec
    * asserts determinism, partition-count invariance, and WCSS descent. */
  val oracles: Map[String, String] = Map.empty
}
