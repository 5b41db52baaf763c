package graft.queries

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.InMemoryQueueRegistry

/** Streaming consumers of standing MODEL artifacts: rows where the
  * expensive thing (an n-gram LM, an index) is trained once on the
  * standing corpus and every arriving micro-batch is scored against it
  * — the always-on form of "train the filter, then run it over the
  * crawl". Same gate discipline as [[Streaming2]]/[[Streaming3]]: a
  * real micro-batch pipeline over the `graft-files` source whose
  * accumulated sink must hash-equal batch SQL over the same slice.
  */
object Streaming4 {
  private val seq = new AtomicInteger(0)

  private val docsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType)))

  private val KnDiscount = 0.75

  /** Streaming LM quality gate (`stream_lm_score`): the interpolated
    * Kneser-Ney bigram LM of `text_bigram_kn`, trained ONCE on the
    * standing corpus (doc_id % 5 != 0) as prep, scoring every ARRIVING
    * document (doc_id % 5 == 0, staged through the push source) at
    * ingest — the quality filter a crawl pipeline runs on each batch
    * the moment it lands, against a model that does NOT retrain per
    * batch.
    *
    * Unlike the batch row (LM trained on the scored corpus itself, no
    * OOV possible), arriving text is held-out, so the scorer needs the
    * full KN backoff ladder, spelled identically on both engines:
    *  - bigram seen:  (c-D)/ctot + (D·n1f/ctot)·Pc(w2)
    *  - only w1 seen: (D·n1f/ctot)·Pc(w2)   (the bigram mass is all
    *    discount — the backoff weight times the continuation prob)
    *  - w1 unseen:    Pc(w2)
    * with Pc(w2) = n1b(w2)/nTypes for a seen continuation and a
    * deterministic 1/(V+1) floor for an unseen token (V = standing
    * vocabulary size) — a floor, not a normalized distribution, which
    * is fine for a monotone quality signal and keeps ln defined.
    *
    * Scale shape: the LM tables are bigram-TYPE-bounded (built once,
    * broadcast per batch — at web-scale vocabularies they'd be
    * shuffle equi-joins, still on LM keys only); each batch explodes
    * only its own bigrams and aggregates per doc before the
    * storage append, so appended bytes track the BATCH (one row per
    * arriving doc), never the history. Per-batch accounting feeds the
    * StateInvarianceSpec family via [[StreamPlans]]. Above the
    * per-table guard the oversized table's join falls back to an AQE
    * shuffle equi-join; StreamingLmRegimeSpec forces that regime
    * through the maxTypes parameter and pins score equality. */
  def streamLmScore(s: SparkSession, dir: String): DataFrame =
    streamLmScoreWith(s, dir, graft.operators.TextAnalysis.LmBroadcastMaxTypes)

  private[graft] def streamLmScoreWith(s: SparkSession, dir: String,
      maxTypes: Long): DataFrame =
      Streaming.withStateShuffle(s, 8) {
    import s.implicits._
    val runId = s"slm${seq.incrementAndGet()}_${System.nanoTime()}"
    StreamPlans.resetIngest("stream_lm_score")
    val prepT0 = System.nanoTime()
    val docs = Tables.documents(s, dir)
    def bigramsOfToks(df: DataFrame): DataFrame = df
      .filter(size($"t") >= 2)
      .select($"doc_id", explode(zip_with(
        slice($"t", lit(1), size($"t") - 1),
        slice($"t", lit(2), size($"t") - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select($"doc_id", $"bg.w1".as("w1"), $"bg.w2".as("w2"))
    def bigrams(df: DataFrame): DataFrame = bigramsOfToks(
      df.select($"doc_id", graft.functions.TextFunctions.tokens($"text").as("t")))

    // ---- prep: the standing LM as a TRAIN-ONCE Models artifact (the
    // ccStandingArtifacts shape, r22): bigram/context/continuation
    // tables plus the scalar stats row committed as parquet once per
    // corpus fingerprint. Until r22 the LM was re-aggregated from the
    // standing corpus on EVERY invocation — the production shape trains
    // once and every later run (including the bench's min-of-2 rerun)
    // reads the tables. The build tokenizes the standing corpus ONCE
    // (a prep-only cache feeds both the bigram build and the
    // vocabulary-size floor — the textBigramKn no-extra-pass
    // discipline), and ONE fused scalar action over big yields the
    // continuation normalizer and both context-table guard sizes.
    val fp = graft.operators.Models.inputFingerprint(s"$dir/documents.parquet")
    val lmDir = graft.operators.Models.root(
        s"stream-lm|$dir|kn=$KnDiscount|in=$fp") { out =>
      val toks = docs.filter($"doc_id" % 5 =!= 0)
        .select($"doc_id", graft.functions.TextFunctions.tokens($"text").as("t"))
        .persist()
      val bigB = bigramsOfToks(toks)
        .groupBy($"w1", $"w2").agg(count(lit(1)).as("c")).persist()
      bigB.write.mode("overwrite").parquet(s"$out/big")
      bigB.groupBy($"w1").agg(sum($"c").as("ctot"), count(lit(1)).as("n1f"))
        .write.mode("overwrite").parquet(s"$out/fwd")
      bigB.groupBy($"w2").agg(count(lit(1)).as("n1b"))
        .write.mode("overwrite").parquet(s"$out/bwd")
      val stats = bigB.agg(count(lit(1)), countDistinct($"w1"),
        countDistinct($"w2")).first()
      val vSizeL = toks.select(explode($"t").as("tok"))
        .agg(countDistinct($"tok")).first().getLong(0)
      Seq((stats.getLong(0), stats.getLong(1), stats.getLong(2), vSizeL))
        .toDF("n_types", "n_fwd", "n_bwd", "v_size")
        .write.mode("overwrite").parquet(s"$out/stats")
      bigB.unpersist(); toks.unpersist()
      java.nio.file.Files.createFile(java.nio.file.Paths.get(out, "_SUCCESS"))
    }
    // session-lived pins over the artifact reads: the per-batch joins
    // broadcast these frames, and a pinned read materializes once
    val big = s.read.parquet(s"$lmDir/big").persist()
    val fwd = s.read.parquet(s"$lmDir/fwd").persist()
    val bwd = s.read.parquet(s"$lmDir/bwd").persist()
    val st = s.read.parquet(s"$lmDir/stats").first()
    val (nTypesL, nFwd, nBwd) =
      (st.getAs[Long]("n_types"), st.getAs[Long]("n_fwd"), st.getAs[Long]("n_bwd"))
    val nTypes = nTypesL.toDouble
    val vSize = st.getAs[Long]("v_size").toDouble
    // bigram types GROW with the standing corpus, so each table's
    // per-batch broadcast is guarded by its own (artifact-carried)
    // count — fwd/bwd are vocab-bounded and usually keep broadcasting
    // after big (a row per bigram TYPE) has to fall back to a shuffle
    // equi-join (regime equality pinned by StreamingLmRegimeSpec).
    def lm(df: DataFrame, rows: Long): DataFrame =
      if (rows <= maxTypes) broadcast(df) else df
    // materialize the pins before the stream races them
    big.count(); fwd.count(); bwd.count()
    StreamPlans.recordPrep("stream_lm_score", (System.nanoTime() - prepT0) / 1e9)

    // ---- arriving corpus staged as 4 files -> 2 micro-batches
    val stage = StageCache.dir("stream_lm_score",
        s"$dir|docs|mod5eq0|hash:4:doc_id", Seq(s"$dir/documents.parquet")) { out =>
      docs.filter($"doc_id" % 5 === 0)
        .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
        .repartition(4, $"doc_id")
        .write.mode("overwrite").parquet(out)
    }
    val queue = InMemoryQueueRegistry.queue(runId)
    val files = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    files.foreach(f => queue.send(
      s"""{"path":"file:${f.getAbsolutePath}","timestampMs":1000}"""))

    val scoresDir = Files.createTempDirectory(s"graft-$runId-scores").toString
    val query = s.readStream.format("graft-files").schema(docsSchema)
      .option("fileFormat", "parquet").option("queueName", runId)
      .option("queueFetchWaitTimeoutSeconds", "10")
      .option("maxFilesPerTrigger", "2")
      .option("minFilesForFirstBatch", files.length.toString)
      .load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val ingestT0 = System.nanoTime()
        val bytes0 = StreamPlans.dirBytes(scoresDir)
        // Pc materialized as a column FIRST so both engines build the
        // identical expression tree (the oracle's `parts` CTE)
        // One left-join ladder serves BOTH regimes: under the guard
        // each table broadcasts; above it the oversized table's join
        // falls back to an AQE shuffle equi-join on the token strings
        // (the gram-key respell was measured WORSE — see the batch
        // row's regime comment + BENCH_NOTES round 18; regime equality
        // of this fallback is pinned by StreamingLmRegimeSpec through
        // the maxTypes parameter).
        val parts = bigrams(batch)
          .join(lm(big, nTypesL), Seq("w1", "w2"), "left")
          .join(lm(fwd, nFwd), Seq("w1"), "left")
          .join(lm(bwd, nBwd), Seq("w2"), "left")
          .withColumn("pc",
            when($"n1b".isNotNull, $"n1b".cast("double") / lit(nTypes))
              .otherwise(lit(1.0) / lit(vSize + 1.0)))
        val p =
          when($"c".isNotNull,
            ($"c".cast("double") - KnDiscount) / $"ctot".cast("double") +
              (lit(KnDiscount) * $"n1f".cast("double") / $"ctot".cast("double")) * $"pc")
          .when($"ctot".isNotNull,
            (lit(KnDiscount) * $"n1f".cast("double") / $"ctot".cast("double")) * $"pc")
          .otherwise($"pc")
        val scores = parts
          .withColumn("nll_micro", -round(log(p) * 1e6).cast("long"))
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            (sum($"nll_micro").cast("double") / (count(lit(1)) * 1e6)).as("avg_nll"))
        StreamPlans.capturePlan("stream_lm_score", scores)
        scores.write.mode("overwrite").parquet(s"$scoresDir/batch=$id")
        StreamPlans.recordIngest("stream_lm_score", id,
          StreamPlans.dirBytes(scoresDir) - bytes0,
          (System.nanoTime() - ingestT0) / 1e9)
      }
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-$runId-cp").toString)
      .start()
    // queue registration and the three session-lived LM caches must
    // release even when the stream FAILS — outside the finally they
    // leak for the session on any processAllAvailable() error
    try {
      try query.processAllAvailable() finally query.stop()
    } finally {
      InMemoryQueueRegistry.remove(runId)
      big.unpersist(); fwd.unpersist(); bwd.unpersist()
    }
    // each arriving doc lives in exactly one staged file, so the
    // accumulated sink is one row per doc already — no re-aggregation
    s.read.parquet(scoresDir)
      .select($"doc_id", $"n_bigrams", $"avg_nll")
      .orderBy($"doc_id")
  }

  /** Batch-equivalent oracle: standing-LM KN scoring of the held-out
    * slice, backoff ladder spelled with the same parenthesization. */
  val streamLmScoreSql: String =
    raw"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
         |), train_idx AS (
         |  SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks WHERE doc_id % 5 <> 0
         |), train_bi AS (
         |  SELECT t[i] AS w1, t[i + 1] AS w2 FROM train_idx
         |), big AS (
         |  SELECT w1, w2, COUNT(*) AS c FROM train_bi GROUP BY w1, w2
         |), fwd AS (
         |  SELECT w1, CAST(SUM(c) AS BIGINT) AS ctot, COUNT(*) AS n1f
         |  FROM big GROUP BY w1
         |), bwd AS (
         |  SELECT w2, COUNT(*) AS n1b FROM big GROUP BY w2
         |), nt AS (
         |  SELECT CAST(COUNT(*) AS DOUBLE) AS ntypes FROM big
         |), vsz AS (
         |  SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS v
         |  FROM (SELECT unnest(t) AS tok FROM toks WHERE doc_id % 5 <> 0)
         |), eval_idx AS (
         |  SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks WHERE doc_id % 5 = 0
         |), eval_bi AS (
         |  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM eval_idx
         |), parts AS (
         |  SELECT e.doc_id, big.c, fwd.ctot, fwd.n1f,
         |    CASE WHEN bwd.n1b IS NOT NULL
         |      THEN CAST(bwd.n1b AS DOUBLE) / (SELECT ntypes FROM nt)
         |      ELSE 1.0 / ((SELECT v FROM vsz) + 1.0) END AS pc
         |  FROM eval_bi e
         |  LEFT JOIN big ON e.w1 = big.w1 AND e.w2 = big.w2
         |  LEFT JOIN fwd ON e.w1 = fwd.w1
         |  LEFT JOIN bwd ON e.w2 = bwd.w2
         |), scored AS (
         |  SELECT doc_id,
         |    -CAST(round(ln(
         |      CASE
         |        WHEN c IS NOT NULL THEN
         |          (CAST(c AS DOUBLE) - 0.75) / CAST(ctot AS DOUBLE)
         |          + (0.75 * CAST(n1f AS DOUBLE) / CAST(ctot AS DOUBLE)) * pc
         |        WHEN ctot IS NOT NULL THEN
         |          (0.75 * CAST(n1f AS DOUBLE) / CAST(ctot AS DOUBLE)) * pc
         |        ELSE pc
         |      END) * 1000000.0) AS BIGINT) AS nll_micro
         |  FROM parts
         |)
         |SELECT doc_id, COUNT(*) AS n_bigrams,
         |  CAST(SUM(nll_micro) AS DOUBLE) / (COUNT(*) * 1000000.0) AS avg_nll
         |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_lm_score" -> streamLmScore _,
  )
  val oracles: Map[String, String] = Map(
    "stream_lm_score" -> streamLmScoreSql,
  )
}
