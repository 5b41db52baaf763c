package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Round-13 pipeline additions, part 4: one-pass table profiling and the
  * deletion-neighborhood fuzzy join.
  *
  * House rules as everywhere: keyed joins only, integer arithmetic across
  * the engine boundary, every query hash-gated against a DuckDB oracle.
  */
object Curation6 {

  // ------------------------------------------------- column profiling
  /** One-pass data profiling of the documents table — the "what landed"
    * report every ingest job posts before anything downstream trusts the
    * batch: per column, row count, null count, exact distinct count, and
    * lexicographic min/max.
    *
    * Why this shape scales: the naive spelling runs one aggregation JOB
    * per column (N scans of a 100 TB table). This plan unpivots with
    * `stack` — a pure narrow map, no shuffle — to (col_name, value) rows
    * and profiles every column in ONE aggregation over ONE scan. The
    * exact-distinct makes the shuffle O(distinct values); map-side
    * partial aggregation collapses repeats before the exchange. (At the
    * far end of scale the exact count would swap for the HLL estimate the
    * q42 sketch row already ships; exact is kept here because the gate
    * hash-compares counts.) All values profile through their string form
    * so one schema fits every column; both engines compare strings
    * binary-lexicographically, so min/max agree.
    */
  def profileColumns(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Par.spread(Tables.documents(s, d), $"doc_id")
      .select(expr(
        """stack(5,
          |  'doc_id', cast(doc_id as string),
          |  'text', text,
          |  'lang', lang,
          |  'source', source,
          |  'n_chars', cast(n_chars as string)) as (col_name, v)""".stripMargin))
      .groupBy($"col_name")
      .agg(count(lit(1)).as("n_rows"),
        sum(when($"v".isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct($"v").as("n_distinct"),
        min($"v").as("min_val"),
        max($"v").as("max_val"))
      .orderBy($"col_name")
  }
  /** DuckDB replica: the classic per-column UNION ALL spelling — an
    * independent formulation (5 scans) agreeing with the single-pass
    * unpivot is a stronger check than a replay. */
  val profileColumnsSql: String = {
    def one(name: String, value: String): String =
      s"""SELECT '$name' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(CASE WHEN $value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  CAST(COUNT(DISTINCT $value) AS BIGINT) AS n_distinct,
         |  MIN($value) AS min_val, MAX($value) AS max_val
         |FROM documents""".stripMargin
    Seq(
      one("doc_id", "CAST(doc_id AS VARCHAR)"),
      one("text", "text"),
      one("lang", "lang"),
      one("source", "source"),
      one("n_chars", "CAST(n_chars AS VARCHAR)"))
      .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY col_name")
  }

  // --------------------------------- deletion-neighborhood fuzzy join
  /** Hamming-1 self-join over a fixed-width key column (customer names,
    * `Customer#%09d`): every pair of records whose keys differ in exactly
    * one character — the record-linkage primitive for typo'd ids, SKUs,
    * and hash-like keys, where "one wrong digit" is the dominant error.
    *
    * Why this shape scales: the naive spelling is an O(n²) cross join
    * with a levenshtein filter — dead at any scale. Token blocking
    * doesn't apply (the keys share one giant "token"). This plan uses the
    * deletion/wildcard-neighborhood technique (the SymSpell family): each
    * key explodes into `length` variants, one per position, with that
    * position masked out; two fixed-width keys are Hamming-1 iff they
    * share a (position, masked) variant, so an EQUI-join on the variant
    * key finds every pair — a plain distributed hash join on short
    * strings, O(n·L) rows shuffled instead of O(n²) compared. A pair
    * differing at exactly ONE position matches at exactly one mask, so
    * the join emits no duplicates and needs no distinct (law pinned in
    * `Curation6Spec`) — but ONLY for Hamming distance exactly 1:
    * identical keys (dist 0) would match at EVERY position and emit
    * `length` rows per pair, so the verify stage filters `dist === 1`
    * strictly (not `<= 1`). The levenshtein verify stage is therefore
    * load-bearing for dist-0 exclusion, not just belt-and-braces, and
    * is the one place the full names are compared — over candidate
    * pairs, never the cross product.
    */
  def fuzzyJoinWildcard(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Par.spread(Tables.customer(s, d).select($"c_custkey", $"c_name"), $"c_custkey")
    // persisted: BOTH sides of the blocking self-join read this frame
    // (exchange reuse does not kick in for aliased sides) — without the
    // pin the explode + masked-variant construction runs twice
    // (surfaced by the round-15 noop-sink measurement)
    val variants = c
      .select($"c_custkey", $"c_name",
        explode(sequence(lit(1), length($"c_name"))).as("pos"))
      .withColumn("masked", concat(
        $"c_name".substr(lit(1), $"pos" - 1),
        $"c_name".substr($"pos" + 1, length($"c_name"))))
      .select($"pos", $"masked", $"c_custkey", $"c_name")
      .persist()
    val a = variants.toDF("pos", "masked", "a_key", "a_name")
    val b = variants.toDF("pos", "masked", "b_key", "b_name")
    a.join(b, Seq("pos", "masked"))
      .filter($"a_key" < $"b_key")
      .withColumn("dist", levenshtein($"a_name", $"b_name"))
      .filter($"dist" === 1)
      .select($"a_key", $"b_key", $"a_name", $"b_name", $"dist".cast("long").as("dist"))
      .orderBy($"a_key", $"b_key")
  }
  /** DuckDB replica — deliberately the NAIVE cross-join spelling the
    * Spark plan exists to avoid: two independent formulations agreeing
    * proves the neighborhood blocking complete (no pair missed) and
    * sound (no duplicate emitted). */
  val fuzzyJoinWildcardSql: String =
    """SELECT a.c_custkey AS a_key, b.c_custkey AS b_key,
      |  a.c_name AS a_name, b.c_name AS b_name,
      |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
      |FROM customer a JOIN customer b
      |  ON a.c_custkey < b.c_custkey
      | AND levenshtein(a.c_name, b.c_name) = 1
      |ORDER BY a_key, b_key""".stripMargin

  // ------------------------------------------- end-to-end curation run
  /** The whole curation pipeline as ONE declarative DAG
    * (`pipeline_e2e`): quality gate → exact dedup (keep-canonical) →
    * eval-set decontamination → per-source corpus report. This is the
    * "switch your training-data job to this library" demo row: each
    * stage is the SAME kernel its standalone query ships
    * ([[Curation.cascadeRule]], the md5 keep-canonical reduction,
    * [[Curation]]'s ContamN-gram keys), composed so Catalyst plans one
    * job — no materialization between stages.
    *
    * Scale shape, stage by stage: the verdict is a narrow codegen'd
    * projection (tokens projected ONCE, the fusion-trap discipline);
    * dedup groups on the md5 hash, so the exchange carries 16-byte keys
    * + ids, never text; decontamination joins the corpus's distinct
    * gram keys against the eval slice's (both sides hashed long keys)
    * and anti-joins the leaked ids back — the corpus text itself crosses
    * no shuffle after the verdict projection; the report is a 20-row
    * per-source aggregate with map-side partials. Eval docs
    * (doc_id % 10 == 7, the repo's standing eval-slice convention) feed
    * the gram blocklist unfiltered and never enter the corpus. */
  def pipelineE2e(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.functions.TextFunctions.tokens
    val docs = Par.spread(Tables.documents(s, d), $"doc_id")
    val corpus = docs.filter($"doc_id" % 10 =!= 7)
      .withColumn("toks", tokens($"text"))
      .withColumn("verdict", Curation.cascadeRule($"toks"))
      .filter($"verdict" === "pass")
    // keep-canonical: min doc_id per exact text hash; the exchange
    // carries (hash, id), and the semi-join restores the full row
    val canonIds = corpus.groupBy(md5($"text").as("h"))
      .agg(min($"doc_id").as("doc_id"))
      .select($"doc_id")
    val canon = corpus.join(canonIds, "doc_id")
    def gramKeys(df: DataFrame): DataFrame = df
      .filter(size($"toks") >= Curation.ContamN)
      .select($"doc_id", explode(Curation.ngrams($"toks", Curation.ContamN)).as("g"))
      .select($"doc_id", Curation.gramKey($"g").as("gk"))
      .distinct()
    val evalGrams = gramKeys(docs.filter($"doc_id" % 10 === 7)
      .withColumn("toks", tokens($"text"))).select($"gk").distinct()
    val leaked = gramKeys(canon).join(evalGrams, "gk").select($"doc_id").distinct()
    canon.join(leaked, Seq("doc_id"), "left_anti")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size($"toks")).cast("long").as("n_tokens"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      .orderBy($"source")
  }
  /** DuckDB replica: the same four stages spelled independently (IN /
    * NOT IN subqueries instead of aggregate-join / anti-join). */
  val pipelineE2eSql: String = {
    val stops = graft.functions.TextFunctions.StopWords.map(w => s"'$w'").mkString("[", ", ", "]")
    val n = Curation.ContamN
    raw"""WITH toks AS (
         |  SELECT doc_id, text, lang, source,
         |    string_split_regex(trim(text), '\s+') AS t
         |  FROM documents
         |), corpus AS (
         |  SELECT * FROM toks
         |  WHERE doc_id % 10 <> 7
         |    AND NOT (len(t) < ${Curation.CascadeMinTokens})
         |    AND NOT (LENGTH(text) > ${Curation.CascadeMaxChars})
         |    AND NOT (CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
         |             / LENGTH(text) > ${Curation.CascadePunctMax})
         |    AND NOT (lang = 'en' AND
         |             CAST(len(list_filter(t, x -> list_contains($stops, x))) AS DOUBLE)
         |             / len(t) < ${Curation.CascadeStopMin})
         |), canon AS (
         |  SELECT * FROM corpus
         |  WHERE doc_id IN (SELECT MIN(doc_id) FROM corpus GROUP BY md5(text))
         |), grams AS (
         |  SELECT DISTINCT doc_id, ${Curation.gramKeySql("g")} AS gk
         |  FROM (SELECT doc_id,
         |          unnest(list_transform(range(1, len(t) - ${n - 2}),
         |                 i -> array_to_string(t[i:i+${n - 1}], ' '))) AS g
         |        FROM toks WHERE len(t) >= $n AND doc_id % 10 = 7
         |        UNION ALL
         |        SELECT doc_id,
         |          unnest(list_transform(range(1, len(t) - ${n - 2}),
         |                 i -> array_to_string(t[i:i+${n - 1}], ' '))) AS g
         |        FROM canon WHERE len(t) >= $n)
         |), leaked AS (
         |  SELECT DISTINCT c.doc_id FROM grams c
         |  WHERE c.doc_id % 10 <> 7
         |    AND c.gk IN (SELECT gk FROM grams WHERE doc_id % 10 = 7)
         |)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(len(t)) AS BIGINT) AS n_tokens,
         |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM canon WHERE doc_id NOT IN (SELECT doc_id FROM leaked)
         |GROUP BY source ORDER BY source""".stripMargin
  }

  // ----------------------------------------------- key-skew diagnostics
  /** Key-skew profile of the events stream (`skew_report`): per
    * power-of-two frequency bucket, how many user_ids fall there and how
    * many rows they carry, plus the hottest key's row share in ppm — the
    * diagnostic run before choosing salting factors or AQE skew
    * thresholds (the q32/q48 operators this repo already ships).
    *
    * Scale + parity shape: per-key counts are ONE map-side-combined
    * aggregation; the bucket is `length(bin(c)) − 1` — exact integer
    * floor(log2) via the binary-string length, identical in both engines
    * (a float log2 would flip at 2^k boundaries on last-ulp differences);
    * the bucket rollup carries ≤ 64 rows, and the hot-key summary is a
    * one-row aggregate crossJoined in (BNLJ bounded by construction —
    * whitelisted with the other report joins). */
  def skewReport(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val perKey = Tables.events(s, d).groupBy($"user_id")
      .agg(count(lit(1)).as("c"))
    val tot = perKey.agg(sum($"c").as("total"), max($"c").as("cmax"))
    perKey.withColumn("bucket", (length(bin($"c")) - 1).cast("long"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_keys"), sum($"c").as("n_rows"))
      .crossJoin(broadcast(tot))
      .select($"bucket", $"n_keys", $"n_rows",
        expr("cmax * 1000000 div total").as("top_key_share_ppm"))
      .orderBy($"bucket")
  }
  val skewReportSql: String =
    """WITH pk AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id),
      |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total, CAST(MAX(c) AS BIGINT) AS cmax FROM pk)
      |SELECT CAST(LENGTH(bin(c)) - 1 AS BIGINT) AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_keys,
      |  CAST(SUM(c) AS BIGINT) AS n_rows,
      |  (SELECT (cmax * 1000000) // total FROM tot) AS top_key_share_ppm
      |FROM pk GROUP BY LENGTH(bin(c)) - 1 ORDER BY bucket""".stripMargin

  // ------------------------------------- incremental aggregate upserts
  /** Delta boundary for [[aggDeltaMerge]]. */
  private[graft] val AggBaseCut = 1500L
  private[graft] val AggDeltaCut = 2000L

  /** Incremental aggregate maintenance (`agg_delta_merge`): a standing
    * per-(user, event_type) count/sum table absorbs a delta batch and
    * emits ONLY the changed keys with their new totals — the
    * merge-on-read upsert view every feature store and reporting mart
    * maintains (same Δ-processing discipline as `dedup_incremental` /
    * `ann_ivf_append`).
    *
    * Scale shape: the base aggregate is built ONCE per (data, cut) into
    * the Models train-once store (`_SUCCESS`-guarded parquet; later
    * calls reload without touching the base slice); each call then pays
    * O(delta) aggregation + a join against the base keyed table —
    * emission is O(changed keys), never O(state). At 100 TB the base
    * table is bucketed on the key (the q58 discipline) so the merge
    * shuffles only the delta side. Values quantize to exact integer
    * millis pre-sum (floor — the ab_test_report discipline). */
  def aggDeltaMerge(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def slice(lo: Long, hi: Long) = {
      val ev = Tables.events(s, d)
      ev.filter($"event_id" >= lo && $"event_id" < hi)
        .select($"user_id", $"event_type",
          floor($"value" * lit(1000.0)).cast("long").as("vmil"))
        .groupBy($"user_id", $"event_type")
        .agg(count(lit(1)).as("n"), sum($"vmil").as("s_milli"))
    }
    val baseDir = Models.root(s"agg-base|$d|cut=$AggBaseCut" +
        s"|in=${Models.inputFingerprint(s"$d/events.parquet")}") { dir =>
      slice(Long.MinValue, AggBaseCut).write.mode("overwrite").parquet(dir)
    }
    val base = s.read.parquet(baseDir)
      .select($"user_id", $"event_type", $"n".as("n_b"), $"s_milli".as("s_b"))
    slice(AggBaseCut, AggDeltaCut)
      .join(base, Seq("user_id", "event_type"), "left")
      .select($"user_id", $"event_type",
        (coalesce($"n_b", lit(0L)) + $"n").as("n_new"),
        (coalesce($"s_b", lit(0L)) + $"s_milli").as("s_new_milli"),
        $"n".as("n_delta"))
      .orderBy($"user_id", $"event_type")
  }
  val aggDeltaMergeSql: String =
    s"""WITH ev AS (
       |  SELECT event_id, user_id, event_type,
       |    CAST(FLOOR(value * 1000.0) AS BIGINT) AS vmil
       |  FROM events
       |), b AS (
       |  SELECT user_id, event_type, COUNT(*) AS n, SUM(vmil) AS s
       |  FROM ev WHERE event_id < $AggBaseCut GROUP BY user_id, event_type
       |), dl AS (
       |  SELECT user_id, event_type, COUNT(*) AS n, SUM(vmil) AS s
       |  FROM ev WHERE event_id >= $AggBaseCut AND event_id < $AggDeltaCut
       |  GROUP BY user_id, event_type)
       |SELECT dl.user_id, dl.event_type,
       |  CAST(COALESCE(b.n, 0) + dl.n AS BIGINT) AS n_new,
       |  CAST(COALESCE(b.s, 0) + dl.s AS BIGINT) AS s_new_milli,
       |  CAST(dl.n AS BIGINT) AS n_delta
       |FROM dl LEFT JOIN b USING (user_id, event_type)
       |ORDER BY dl.user_id, dl.event_type""".stripMargin

  // --------------------------------------------- per-source quality
  /** Per-source quality matrix (`source_quality_matrix`): the cascade
    * verdict ([[Curation.cascadeRule]], the SAME codegen'd Column the
    * attrition report and the streaming cascade share) crossed with the
    * source dimension — which feeds are supplying the rejects. One
    * narrow projection + one aggregation; the shuffle carries
    * ≤ sources × 5 rows after map-side combine. */
  def sourceQualityMatrix(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.functions.TextFunctions.tokens
    // projection BEFORE the verdict: the scan prunes to the four columns
    // the matrix needs (law-swept — a full-width read here is a bug)
    Tables.documents(s, d).select($"text", $"lang", $"source", $"n_chars")
      .withColumn("toks", tokens($"text"))
      .withColumn("rule", Curation.cascadeRule($"toks"))
      .groupBy($"source", $"rule")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("n_chars"))
      .orderBy($"source", $"rule")
  }
  val sourceQualityMatrixSql: String = {
    val stops = graft.functions.TextFunctions.StopWords.map(w => s"'$w'").mkString("[", ", ", "]")
    raw"""WITH scored AS (
         |  SELECT doc_id, lang, source, n_chars, LENGTH(text) AS len, len(toks) AS nt,
         |    CAST(len(list_filter(toks, t -> list_contains($stops, t))) AS DOUBLE) / len(toks) AS sr,
         |    CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
         |      / LENGTH(text) AS pr
         |  FROM (SELECT *, string_split_regex(trim(text), '\s+') AS toks FROM documents)
         |), verdict AS (
         |  SELECT source,
         |    CASE WHEN nt < ${Curation.CascadeMinTokens} THEN 'too_short'
         |         WHEN len > ${Curation.CascadeMaxChars} THEN 'too_long'
         |         WHEN pr > ${Curation.CascadePunctMax} THEN 'high_punct'
         |         WHEN lang = 'en' AND sr < ${Curation.CascadeStopMin} THEN 'low_stopword'
         |         ELSE 'pass' END AS rule,
         |    n_chars
         |  FROM scored)
         |SELECT source, rule, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS n_chars
         |FROM verdict GROUP BY source, rule ORDER BY source, rule""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "source_quality_matrix" -> sourceQualityMatrix _,
    "skew_report" -> skewReport _,
    "agg_delta_merge" -> aggDeltaMerge _,
    "pipeline_e2e" -> pipelineE2e _,
    "profile_columns" -> profileColumns _,
    "fuzzy_join_wildcard" -> fuzzyJoinWildcard _,
  )
  val oracles: Map[String, String] = Map(
    "source_quality_matrix" -> sourceQualityMatrixSql,
    "skew_report" -> skewReportSql,
    "agg_delta_merge" -> aggDeltaMergeSql,
    "pipeline_e2e" -> pipelineE2eSql,
    "profile_columns" -> profileColumnsSql,
    "fuzzy_join_wildcard" -> fuzzyJoinWildcardSql,
  )
}
