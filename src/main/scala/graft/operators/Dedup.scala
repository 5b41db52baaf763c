package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.queries.Tables

/** Document deduplication for training-data pipelines, at four levels of
  * fuzziness: exact (content hash), normalized fingerprint, n-gram
  * Jaccard (exact set similarity), and MinHash+LSH (approximate, the
  * 100 TB scale path). SimHash-based near-dup lives here too.
  *
  * Scale design: nothing ever cross-joins documents. Pair generation is
  * always an equi-join on a derived key (shingle, LSH band key, simhash
  * chunk), so candidates shuffle on that key and skew is bounded by key
  * frequency. Verification (exact Jaccard / hamming) runs only on
  * candidate pairs. The two 100 TB additions are both in place: the
  * document-frequency cap on ultra-common shingles
  * ([[dedupNgramJaccardCapped]] — they contribute no discriminative
  * signal and cause quadratic blowup) and AQE skew-join handling
  * (asserted in ScalePatternsSpec), both orthogonal to the operator
  * shape used here.
  */
object Dedup {
  private[graft] val ShingleSize = 3
  // 32 bands x 4 rows (k=128): recall at J=0.8 is 1 - 4.8e-8, while the
  // candidate rate for background pairs (J ~ 0.1, common in a small-vocab
  // corpus) is ~32 * 1e-4 — r=2 banding melted down here: every doc pair
  // with J ~ 0.3 collided somewhere, 12.5M candidate pairs at sf0.1.
  private val MinhashK = 128
  private val LshBands = 32
  private val LshRows = 4
  /** Band-bucket pair window: all pairs for buckets <= BucketW+1 docs,
    * doc_id-ordered sliding window beyond (see the candidate stage). */
  private[graft] val BucketW = 64
  /** The near-dup verification threshold: a pair is a near-dup iff its
    * exact shingle Jaccard is >= this. Shapes every LSH pair list
    * ([[lshVerify]], [[dedupMinhashLsh]]) and every oracle's HAVING
    * clause, so it lives in [[LshParamsKey]] like the other kernel
    * constants (r19 ADVICE: a literal 0.8 outside the key would let a
    * threshold change silently reuse stale pair/map/rank artifacts). */
  private[graft] val JaccardThreshold = 0.8
  /** Models-store key fragment naming the LSH parameters that actually
    * shape an LSH-built standing artifact — a cached frame keyed on
    * these rebuilds when the kernel's constants change, instead of
    * silently reusing a stale build (the exact-kernel df cap is NOT
    * in play on the LSH path and must not appear in these keys).
    * Carries the shingle width and verify threshold too (r19 ADVICE):
    * every LSH-built artifact derives from ShingleSize-wide shingles
    * and JaccardThreshold-verified pairs, so a change to EITHER must
    * rebuild every artifact keyed on this fragment. */
  private[graft] val LshParamsKey =
    s"k=$MinhashK|bands=$LshBands|w=$BucketW|sh=$ShingleSize|j=$JaccardThreshold"

  /** doc_id + distinct 3-word shingles, the shared base of the fuzzy ops.
    * [[Par.spread]]-gated on doc_id first: the fixture is one small
    * parquet file (= one input split), and without a re-bucket every
    * downstream shingle/signature computation runs on a single core. At
    * real scale the scan has thousands of splits and the gate makes the
    * re-bucket a no-op. */
  private[operators] def docShingles(s: SparkSession, d: String): DataFrame =
    docShinglesOf(Tables.documents(s, d))

  /** The shingle builder over an explicit documents frame — the
    * incremental rows shingle their corpus and delta slices SEPARATELY
    * so the "only the delta re-shingles" claim is structural. */
  private[graft] def docShinglesOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    // Two-step projection on purpose: `toks` must be a materialized
    // attribute before entering the shingle lambda. Passing
    // `tokens($"text")` straight into `shingles` embeds the regex split
    // inside the transform lambda, re-splitting the document once PER
    // SHINGLE (measured 8s/pass at sf0.1 vs ~0.5s this way). Multiple
    // references to a non-trivial alias also keep CollapseProject from
    // re-inlining it. No size filter here: predicate pushdown would clone
    // the expression below the project, and empty shingle arrays are
    // dropped by the downstream explode anyway.
    // persisted: the self-joins below read this base TWICE (exchange
    // reuse does not kick in for the aliased sides), and recomputing the
    // tokenize+shingle pass dominates the query (measured ~10s vs ~1.8s
    // at sf0.1). At real scale the same move is materializing the shingle
    // table once before pair generation.
    Par.spread(docs, $"doc_id")
      .withColumn("toks", tokens($"text"))
      .select($"doc_id", shingles($"toks", ShingleSize).as("sh"))
      .persist()
  }

  // ---------------------------------------------------------------- exact
  /** Exact dedup: group by content hash (sha2 so the shuffle key is 32
    * bytes, not the full text — the at-scale trick), keep the smallest
    * doc_id as the canonical representative. */
  def dedupExact(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .groupBy(sha2($"text", 256).as("h"))
      .agg(min($"doc_id").as("rep_id"), count(lit(1)).as("n_copies"))
      .select($"rep_id", $"n_copies")
      .orderBy($"rep_id")
  }
  val dedupExactSql: String =
    """SELECT MIN(doc_id) AS rep_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY text ORDER BY rep_id""".stripMargin

  // ---------------------------------------------------------- fingerprint
  /** Near-exact dedup on the normalized-text fingerprint (lowercase,
    * whitespace-collapsed), via the custom 64-bit fingerprint column. */
  def dedupFingerprint(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .groupBy(fingerprint($"text").as("fp"))
      .agg(min($"doc_id").as("rep_id"), count(lit(1)).as("n_docs"))
      .select($"rep_id", $"n_docs")
      .orderBy($"rep_id")
  }
  val dedupFingerprintSql: String =
    """SELECT MIN(doc_id) AS rep_id, COUNT(*) AS n_docs
      |FROM documents
      |GROUP BY array_to_string(string_split_regex(trim(lower(text)), '\s+'), ' ')
      |ORDER BY rep_id""".stripMargin

  // ------------------------------------------------------- exact jaccard
  /** All pairs with exact 3-gram Jaccard >= 0.8. Pair generation is an
    * equi-join on shared shingles (shuffle on shingle), intersection =
    * count of shared shingles, union from per-doc set sizes. The jaccard
    * value is an exact integer ratio, so the double is bit-identical in
    * any engine. */
  def dedupNgramJaccard(s: SparkSession, d: String): DataFrame =
    dedupNgramJaccardCapped(s, d, dfCap = Int.MaxValue)

  /** @param dfCap document-frequency cap: shingles shared by more than
    *   this many documents are dropped BEFORE pair generation. This is
    *   the 100 TB knob — an ultra-common shingle contributes ~df²/2
    *   candidate pairs and no discriminative signal, so capping bounds
    *   the worst key's shuffle fan-out. Capping can only lower a pair's
    *   observed intersection (union sizes are unchanged), so it never
    *   creates false pairs — at threshold 0.8 it can only drop pairs
    *   whose evidence was mostly degenerate shingles.
    *   `DedupDfCapSpec` shows a loose cap is exact on the fixture. */
  def dedupNgramJaccardCapped(s: SparkSession, d: String, dfCap: Int): DataFrame = {
    import s.implicits._
    val docs = docShingles(s, d)
    // set size rides along with each exploded shingle, so union sizes fall
    // out of the grouping keys — no join back to a per-doc sizes branch
    // (which would re-run the whole shingle pipeline two more times)
    // join on the 64-bit shingle hash, not the string: long keys shuffle
    // and compare far cheaper, and a cross-shingle collision (~n^2/2^64)
    // is negligible against the corpus sizes this runs at
    // sz as long: BoundedGroupAgg's struct contract is (long, long)
    val ex0 = docs.select($"doc_id", size($"sh").cast("long").as("sz"), explode($"sh").as("s0"))
      .select($"doc_id", $"sz", xxhash64($"s0").as("s"))
    val pairs =
      if (dfCap == Int.MaxValue) {
        ex0.as("a").join(ex0.as("b"), $"a.s" === $"b.s" && $"a.doc_id" < $"b.doc_id")
          .select($"a.doc_id".as("a_id"), $"b.doc_id".as("b_id"),
            $"a.sz".as("sz_a"), $"b.sz".as("sz_b"))
      } else {
        // the df cap rides the pair-generation shuffle itself: group the
        // exploded table by shingle ONCE with a bounded collector
        // (overflowed = df > cap = degenerate key = empty member list,
        // O(1) buffer — see BoundedGroupAgg), then emit each surviving
        // group's pairs map-side with a nested transform. One full pass
        // over the exploded table instead of the three the former
        // count-filter-join spelling paid (df aggregate + join-back +
        // pair join; measured ~2x the whole operator at sf0.1).
        ex0.groupBy($"s")
          .agg(graft.functions.BoundedGroupAgg.boundedGroup($"doc_id", $"sz", dfCap).as("ds"))
          .filter(size($"ds") > 1)
          .select(explode(expr(
            """flatten(transform(ds, (a, i) ->
              |  transform(slice(ds, i + 2, size(ds)), b ->
              |    if(a.doc_id < b.doc_id,
              |       struct(a.doc_id AS a_id, b.doc_id AS b_id, a.sz AS sz_a, b.sz AS sz_b),
              |       struct(b.doc_id AS a_id, a.doc_id AS b_id, b.sz AS sz_a, a.sz AS sz_b)))))"""
              .stripMargin)).as("p"))
          .select($"p.a_id", $"p.b_id", $"p.sz_a", $"p.sz_b")
      }
    pairs
      .groupBy($"a_id", $"b_id", $"sz_a", $"sz_b")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", $"inter".cast("double") / ($"sz_a" + $"sz_b" - $"inter"))
      .filter($"jaccard" >= JaccardThreshold)
      .select($"a_id", $"b_id", $"jaccard")
      .orderBy($"a_id", $"b_id")
  }
  /** Shared oracle CTE: exploded (doc_id, set size, shingle) rows. */
  /** The shingle CTEs, optionally over a row-bounded corpus slice (the
    * streaming gate caps its staged corpus like every other stream query;
    * `pred` is a bare SQL predicate on documents, e.g. "doc_id < 2000"). */
  private[graft] def shingleCteSql(pred: String): String = {
    val where = if (pred.isEmpty) "" else s" WHERE $pred"
    raw"""sh AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(range(1, len(toks)-1),
         |      i -> array_to_string(toks[i:i+2], ' '))) AS shset
         |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents$where)
         |  WHERE len(toks) >= 3
         |), ex AS (
         |  SELECT doc_id, len(shset) AS sz, unnest(shset) AS s FROM sh
         |)""".stripMargin
  }
  private[operators] val ShingleCteSql: String = shingleCteSql("")
  val dedupNgramJaccardSql: String =
    s"""WITH $ShingleCteSql
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |  COUNT(*)::DOUBLE / (ANY_VALUE(a.sz) + ANY_VALUE(b.sz) - COUNT(*)) AS jaccard
       |FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
       |GROUP BY a.doc_id, b.doc_id
       |HAVING COUNT(*)::DOUBLE / (ANY_VALUE(a.sz) + ANY_VALUE(b.sz) - COUNT(*)) >= $JaccardThreshold
       |ORDER BY a_id, b_id""".stripMargin

  // -------------------------------------------------------- minhash + LSH
  /** MinHash/LSH near-dup: 64-perm minhash signature, 32x2 banding for
    * candidate generation (equi-join on band key), exact-Jaccard
    * verification of candidates only. At J >= 0.8 the miss probability is
    * ~3.6e-15, so the oracle is the exact-Jaccard pair list. This is the
    * shape that scales: signature+bands are one narrow map, candidates
    * shuffle on band keys, verification touches only candidate pairs. */
  def dedupMinhashLsh(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    minhashLshPairs(s, d).orderBy($"a_id", $"b_id")
  }

  /** [[dedupMinhashLsh]] WITHOUT the trailing doc-id sort — for
    * consumers that aggregate, cluster, or re-sort the pair list anyway
    * (CC-LSH, pagerank's edge source, contrastive mining, the estimator
    * bound): the global sort buys them nothing and each materialization
    * pays its range-partitioning sample job. The gate row keeps the
    * ordered contract. */
  private[graft] def minhashLshPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = docShingles(s, d)
    // Signature via explode + 128 partial-aggregated per-position minima:
    // every shingle is hashed exactly once. (The closed-form column
    // `minhashSignature` is correct but Catalyst's projection collapse
    // inlines it into each downstream band key, recomputing the whole
    // signature 32x; an aggregation is a collapse barrier, and this shape
    // — shingle-level parallelism + map-side combine — is also the one
    // that scales to a 100 TB corpus.)
    // hash each shingle string ONCE; the K permutation hashes + minima are
    // computed by the MinHashAgg imperative aggregate in one loop per row
    // (K separate min(xxhash64(...)) aggregate columns pay per-expression
    // overhead K times per row and exceed codegen field limits)
    val ex = docs.select($"doc_id", explode($"sh").as("s"))
      .select($"doc_id", xxhash64($"s").as("hs"))
    val sig = ex.groupBy($"doc_id")
      .agg(graft.functions.MinHashAgg.minhashAgg($"hs", MinhashK).as("sig"))
    val bandKeyCols = (0 until LshBands).map { b =>
      xxhash64(lit(b), slice($"sig", b * LshRows + 1, LshRows))
    }
    val bandsEx = sig.select($"doc_id",
      posexplode(array(bandKeyCols: _*)).as(Seq("band_idx", "band_key")))
      // rank within the band bucket: the pair stage below only links docs
      // within BucketW rank positions, which is ALL pairs for any bucket
      // of <= BucketW+1 docs (every fixture bucket — results unchanged)
      // and a doc_id-ordered sliding window beyond. An oversized bucket
      // is either a true duplicate pile — whose members all mutually
      // verify, so windowed links reconnect the pile transitively in CC —
      // or a collision pile of short/hot-token docs, whose O(bucket²)
      // candidate fan-out is exactly the degenerate cost this bounds (the
      // LSH analogue of the shingle dfCap; measured in the round-14 scale
      // table as the term that bent the LSH path super-linear on Zipf
      // text with many short documents).
      .withColumn("rn", row_number().over(
        Window.partitionBy($"band_idx", $"band_key").orderBy($"doc_id")))
    val cand = bandsEx.as("a")
      .join(bandsEx.as("b"),
        $"a.band_idx" === $"b.band_idx" && $"a.band_key" === $"b.band_key" &&
          $"a.doc_id" < $"b.doc_id" && $"b.rn" - $"a.rn" <= BucketW)
      .select($"a.doc_id".as("a_id"), $"b.doc_id".as("b_id"))
      .distinct()
    cand
      .join(docs.select($"doc_id".as("a_id"), $"sh".as("sh_a")), "a_id")
      .join(docs.select($"doc_id".as("b_id"), $"sh".as("sh_b")), "b_id")
      .withColumn("inter", size(array_intersect($"sh_a", $"sh_b")))
      .withColumn("jaccard", $"inter".cast("double") / (size($"sh_a") + size($"sh_b") - $"inter"))
      .filter($"jaccard" >= JaccardThreshold)
      .select($"a_id", $"b_id", $"jaccard")
  }
  /** Oracle: the exact pair list (LSH recall at this operating point is
    * 1 - 3.6e-15; candidates are verified exactly). */
  val dedupMinhashLshSql: String = dedupNgramJaccardSql

  // ------------------------------------------- minhash estimator bound
  /** MinHash estimator accuracy gate (`minhash_est_bound`): over every
    * VERIFIED near-dup pair, count how many 128-perm signature-agreement
    * estimates of Jaccard sit MORE than 0.15 from the exact value — the
    * gate pins `n_pairs` (the verified pair count, exactly oracle-able)
    * and `n_out_of_bound = 0`. 0.15 is ~4.2σ for J ≥ 0.8 at K = 128
    * (σ = √(J(1−J)/K) ≈ 0.035), so a correct estimator never trips it
    * and a broken permutation/hash spelling blows the count; the margin
    * is CORPUS-PINNED — signature agreement is deterministic per corpus,
    * so the zero is a property of (estimator, fixtures, 4.2σ), asserted
    * as an aggregate precisely so a single unlucky pair on a regenerated
    * corpus reads as "1 pair beyond 4.2σ" rather than an opaque hash
    * flip. The `q42_sketch_bound` pattern applied to the dedup
    * estimator: the sketch internals can't be oracled across engines, so
    * the oracle pins the exact pair count + the asserted verdict. */
  def minhashEstBound(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ex = docShingles(s, d).select($"doc_id", explode($"sh").as("s"))
      .select($"doc_id", xxhash64($"s").as("hs"))
    val sig = ex.groupBy($"doc_id")
      .agg(graft.functions.MinHashAgg.minhashAgg($"hs", MinhashK).as("sig"))
    minhashLshPairs(s, d)
      .join(sig.select($"doc_id".as("a_id"), $"sig".as("sig_a")), "a_id")
      .join(sig.select($"doc_id".as("b_id"), $"sig".as("sig_b")), "b_id")
      .withColumn("match_pos",
        expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), b -> b))"))
      .withColumn("out_of_bound",
        abs(expr(s"(match_pos * 1000000) div $MinhashK")
          - round($"jaccard" * 1e6).cast("long")) > 150000L)
      .agg(count(lit(1)).as("n_pairs"),
        // coalesce: sum over an EMPTY input is NULL in Spark, while the
        // oracle emits a literal 0 — a pair-free corpus must read (0, 0)
        // on both engines, not (0, NULL) vs (0, 0)
        coalesce(sum(when($"out_of_bound", 1L).otherwise(0L)), lit(0L))
          .as("n_out_of_bound"))
  }
  val minhashEstBoundSql: String =
    s"""WITH $ShingleCteSql,
       |pairs AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id
       |  HAVING COUNT(*)::DOUBLE / (ANY_VALUE(a.sz) + ANY_VALUE(b.sz) - COUNT(*)) >= $JaccardThreshold
       |)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  CAST(0 AS BIGINT) AS n_out_of_bound
       |FROM pairs""".stripMargin

  // ------------------------------------------------------------- simhash
  /** SimHash near-dup: 64-bit signature per doc (custom Catalyst
    * expression), candidates from 4x16-bit chunk equality (pigeonhole:
    * hamming <= 3 implies >= 1 equal chunk), verified by exact hamming.
    * Oracle-checked since the token hash became an md5 prefix (see
    * [[dedupSimhashSql]]); locality also asserted on planted near-dups. */
  def dedupSimhash(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sigs = Par.spread(Tables.documents(s, d), $"doc_id")
      .select($"doc_id", simhash(tokens($"text")).as("h"))
    val chunks = sigs.select($"doc_id", $"h",
      posexplode(array((0 until 4).map(c => hashChunk($"h", c)): _*)).as(Seq("chunk_idx", "chunk_val")))
    chunks.as("a")
      .join(chunks.as("b"),
        $"a.chunk_idx" === $"b.chunk_idx" && $"a.chunk_val" === $"b.chunk_val" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("a_id"), $"b.doc_id".as("b_id"),
        hamming64($"a.h", $"b.h").as("hamming"))
      .distinct()
      .filter($"hamming" <= 3)
      .orderBy($"a_id", $"b_id")
  }

  /** DuckDB replay of the full simhash pipeline — possible because the
    * per-token hash is an md5 prefix (SimHash.tokenHash64), not a
    * JVM-only hash: UBIGINT carries the unsigned 64-bit signature, bit_or
    * assembles the sign vector, and bit_count(xor) is the hamming
    * verify. */
  val dedupSimhashSql: String =
    raw"""WITH th AS (
         |  SELECT doc_id, CAST(concat('0x', substring(md5(tok), 1, 16)) AS UBIGINT) AS h
         |  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
         |        FROM documents)
         |), sig AS (
         |  SELECT doc_id,
         |    bit_or(CASE WHEN v > 0 THEN 1::UBIGINT << bit ELSE 0::UBIGINT END) AS h
         |  FROM (
         |    SELECT doc_id, b.bit,
         |      SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
         |    FROM th CROSS JOIN (SELECT unnest(range(0, 64)) AS bit) b
         |    GROUP BY doc_id, b.bit)
         |  GROUP BY doc_id
         |), chunks AS (
         |  SELECT doc_id, h, c.ci, (h >> (16 * c.ci)) & 65535 AS cv
         |  FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS ci) c
         |), pairs AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
         |    CAST(bit_count(xor(a.h, b.h)) AS INT) AS hamming
         |  FROM chunks a JOIN chunks b
         |    ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id)
         |SELECT a_id, b_id, hamming FROM pairs
         |WHERE hamming <= 3
         |ORDER BY a_id, b_id""".stripMargin

  // --------------------------------------------- connected components
  /** Cluster the exact-verified near-dup pairs into connected components
    * (a pair list alone under-merges: A~B and B~C must collapse into one
    * cluster even when A~C misses the threshold). Iterative min-label
    * propagation over the symmetric edge list, ACCELERATED by label-path
    * shortcutting: each round takes the min over (own label, neighbors'
    * labels, label-of-label). The shortcut is the pointer-doubling step
    * of hash-to-min CC (Rastogi et al.), collapsing label chains
    * geometrically, so rounds are O(log diameter) instead of O(diameter)
    * — a 1000-link near-dup chain converges in ~10 rounds, not 1000.
    * Every round is two distributed join+aggregates; convergence is
    * detected by the monotone label-sum (labels only ever decrease); the
    * 50-round cap is a safety rail that O(log d) growth can't realistically
    * hit. Invariant kept by both steps: lab(v) is always the id of a
    * vertex in v's component with lab(v) <= v, so the fixpoint is exactly
    * the component-min labeling the recursive-CTE oracle computes.
    * Output: every clustered doc with its component id (= min doc_id in
    * the component) and the component size. */
  /** Fixpoint rounds of the last [[dedupClusters]] run (observability for
    * the one-action-per-round job-count law in DedupJobsSpec). */
  @volatile private[graft] var lastCcRounds: Int = -1

  /** Document-frequency cap for the CC kernel's pair generation — ON by
    * default here (unlike the standalone exact-jaccard query): an
    * ultra-common shingle contributes ~df²/2 candidate pairs, and the
    * round-14 scale harness MEASURED that term bending the CC kernel's
    * shuffle super-linear on a Zipf corpus (BENCH_NOTES round-14 slope
    * table) while the capped kernel stays ~linear. 64 is >2x the max df
    * ever observed on the fixtures (7 at sf0.01, 25 at sf0.1), so gate
    * hashes are unchanged; at scale it bounds the worst key's fan-out to
    * <= 64²/2 pairs. The oracle CTE applies the same cap. */
  private[graft] val CcDfCap = 64

  def dedupClusters(s: SparkSession, d: String): DataFrame =
    dedupClustersWithCap(s, d, CcDfCap)

  /** The CC kernel WITHOUT the df cap — scale-harness comparison arm
    * only (quantifies what the cap buys; never a gate query). */
  private[graft] def dedupClustersUncapped(s: SparkSession, d: String): DataFrame =
    dedupClustersWithCap(s, d, Int.MaxValue)

  private def dedupClustersWithCap(s: SparkSession, d: String, dfCap: Int): DataFrame = {
    import s.implicits._
    ccFixpoint(dedupNgramJaccardCapped(s, d, dfCap).select($"a_id", $"b_id"))
  }

  /** CC over the minhash-LSH candidate path (dedup_cc_lsh): identical
    * fixpoint kernel, but candidate pairs come from banded minhash
    * signatures instead of the exact shingle equi-join. This is the
    * 100 TB spelling of near-dup clustering: the exact path's pair
    * generation carries a Σ df² term that the round-14 scale harness
    * measured bending super-linear on Zipf text even under the df cap
    * (BENCH_NOTES slope table), while the LSH path's shuffle is the
    * signature pass (O(corpus shingles)) plus band buckets bounded by
    * the real near-dup density — measured ~linear. On the fixtures the
    * two paths produce IDENTICAL components (banding at these
    * parameters catches every >= 0.8 pair there — the same argument
    * that lets dedup_minhash_lsh share the exact oracle), so the oracle
    * is the same recursive CTE over exact pairs. */
  def dedupClustersLsh(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    ccFixpoint(minhashLshPairs(s, d).select($"a_id", $"b_id"))
  }

  /** The STANDING cluster map — committed once through the [[Models]]
    * train-once store, keyed on the corpus fingerprint, and consumed by
    * survivor selection, cluster stats, cross-corpus merge accounting,
    * and the composed pipelines — the same argument as `q58_dedup_index`.
    * Since round 15 the standing index is BUILT FROM THE LSH KERNEL
    * ([[dedupClustersLsh]]): the round-14 scale harness measured the
    * exact kernel's pair generation at shuffle slope ~1.21 (Σ df² term)
    * vs ~1.00 for the banded-minhash path, and the two kernels produce
    * identical components at the gate parameters (every >= 0.8 pair
    * lands in a shared band — see [[dedupClustersLsh]]), so every
    * consumer row keeps its hash while the ingest-time build cost drops
    * to the measured-linear path. The KERNEL rows (`dedup_cc`,
    * `dedup_cc_lsh`) deliberately do NOT use this cache: they measure
    * the kernels themselves. */
  private[graft] def clusterMap(s: SparkSession, d: String): DataFrame =
    clusterMapLsh(s, d)

  /** The standing cluster map over the LSH candidate path — identical
    * components on the fixtures (see [[dedupClustersLsh]]); consumed by
    * the leakage-safe splitter. */
  private[graft] def clusterMapLsh(s: SparkSession, d: String): DataFrame = {
    val dir = Models.root(s"cc-clusters-lsh|$d|$LshParamsKey" +
        s"|in=${Models.inputFingerprint(s"$d/documents.parquet")}") { out =>
      dedupClustersLsh(s, d).write.mode("overwrite").parquet(out)
    }
    s.read.parquet(dir)
  }

  // ------------------------------------------- incremental CC maintenance
  /** Minhash signatures of a shingle frame (the [[dedupMinhashLsh]]
    * signature stage, frame-parameterized for the incremental row). */
  private[graft] def lshSignatures(sh: DataFrame): DataFrame = {
    val s = sh.sparkSession
    import s.implicits._
    sh.select($"doc_id", explode($"sh").as("s"))
      .select($"doc_id", xxhash64($"s").as("hs"))
      .groupBy($"doc_id")
      .agg(graft.functions.MinHashAgg.minhashAgg($"hs", MinhashK).as("sig"))
  }

  /** Band keys of a signature frame (32 x 4 banding, same spelling as
    * [[dedupMinhashLsh]]). */
  private[graft] def lshBands(sig: DataFrame): DataFrame = {
    val s = sig.sparkSession
    import s.implicits._
    val bandKeyCols = (0 until LshBands).map { b =>
      xxhash64(lit(b), slice($"sig", b * LshRows + 1, LshRows))
    }
    sig.select($"doc_id",
      posexplode(array(bandKeyCols: _*)).as(Seq("band_idx", "band_key")))
  }

  /** Band-bucket candidate pairs with the BucketW rank-window fan-out
    * bound (see [[dedupMinhashLsh]] for why windowed links suffice). */
  private[graft] def lshCandidates(bands: DataFrame): DataFrame = {
    val s = bands.sparkSession
    import s.implicits._
    val ranked = bands.withColumn("rn", row_number().over(
      Window.partitionBy($"band_idx", $"band_key").orderBy($"doc_id")))
    ranked.as("a").join(ranked.as("b"),
      $"a.band_idx" === $"b.band_idx" && $"a.band_key" === $"b.band_key" &&
        $"a.doc_id" < $"b.doc_id" && $"b.rn" - $"a.rn" <= BucketW)
      .select($"a.doc_id".as("a_id"), $"b.doc_id".as("b_id"))
      .distinct()
  }

  /** Exact-Jaccard verification of candidate pairs against a shingle
    * frame covering both endpoints. */
  private[graft] def lshVerify(cand: DataFrame, sh: DataFrame): DataFrame = {
    val s = cand.sparkSession
    import s.implicits._
    cand
      .join(sh.select($"doc_id".as("a_id"), $"sh".as("sh_a")), "a_id")
      .join(sh.select($"doc_id".as("b_id"), $"sh".as("sh_b")), "b_id")
      .withColumn("inter", size(array_intersect($"sh_a", $"sh_b")))
      .withColumn("jaccard",
        $"inter".cast("double") / (size($"sh_a") + size($"sh_b") - $"inter"))
      .filter($"jaccard" >= JaccardThreshold)
      .select($"a_id", $"b_id", $"jaccard")
  }

  /** The standing corpus's LSH artifacts — shingle table, band table,
    * verified pair list, AND the standing cluster map — committed ONCE
    * through the [[Models]] train-once store keyed on the corpus
    * fingerprint: exactly what a prior ingest leaves on storage, and
    * what both incremental rows ([[dedupCcDelta]], the streaming twin)
    * read instead of re-running the corpus-side kernel. The map is an
    * artifact too (a prior ingest necessarily labeled its own corpus),
    * which is what lets the delta merge be COMPONENT-LOCAL
    * ([[ccFixpointDelta]]) instead of re-running the fixpoint over
    * every standing edge. Returns (shingles, bands, pairs, map). */
  private[graft] def ccStandingArtifacts(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    import s.implicits._
    val fp = Models.inputFingerprint(s"$d/documents.parquet")
    // keys carry the kernel parameters that shape each artifact (the
    // rankMap/clusterMapLsh discipline, r19 ADVICE): the shingle table
    // depends on the shingle width, everything downstream additionally
    // on the LSH constants — changing either must rebuild, not reuse
    val shDir = Models.root(s"ccdelta-sh|$d|sh=$ShingleSize|in=$fp") { out =>
      docShinglesOf(Tables.documents(s, d).filter($"doc_id" % 5 =!= 0))
        .write.mode("overwrite").parquet(out)
    }
    val sh = s.read.parquet(shDir)
    // LshParamsKey carries sh= and j= itself since r20 (the ADVICE fold)
    val lshFp = LshParamsKey
    val bandsDir = Models.root(s"ccdelta-bands|$d|$lshFp|in=$fp") { out =>
      lshBands(lshSignatures(sh)).write.mode("overwrite").parquet(out)
    }
    val bands = s.read.parquet(bandsDir)
    val pairsDir = Models.root(s"ccdelta-pairs|$d|$lshFp|in=$fp") { out =>
      lshVerify(lshCandidates(bands), sh).select($"a_id", $"b_id")
        .write.mode("overwrite").parquet(out)
    }
    val mapDir = Models.root(s"ccdelta-map|$d|$lshFp|in=$fp") { out =>
      val m = ccFixpoint(s.read.parquet(pairsDir))
      m.write.mode("overwrite").parquet(out)
      m.unpersist() // the artifact lives on storage; drop the build's cache
    }
    (sh, bands, s.read.parquet(pairsDir), s.read.parquet(mapDir))
  }

  /** COMPONENT-LOCAL incremental merge: given the standing corpus's
    * cluster map and edge list (both storage artifacts of the prior
    * ingest) and the delta's verified fresh edges, re-run the label
    * fixpoint ONLY over standing components incident to a fresh edge
    * and pass every untouched cluster's rows through unchanged.
    *
    * Why one level of cluster closure suffices (no iteration): a chain
    * of standing clusters merged by fresh edges has a fresh ENDPOINT
    * inside every cluster on the chain, so "clusters containing a fresh
    * endpoint" is already the transitive touched set. And no connecting
    * path can detour through an untouched cluster: standing clusters
    * are maximal under standing edges, so any intermediate doc on a
    * merged path sits in a cluster that itself contains a fresh
    * endpoint. Hence fixpoint(touched-cluster edges ∪ fresh) computes
    * exactly the full rebuild's labels for the touched zone, and the
    * untouched rows are bit-identical pass-throughs — the result equals
    * [[ccFixpoint]] over ALL standing ∪ fresh edges, at merge cost
    * O(delta-touched component mass × log diameter) instead of O(total
    * corpus dup mass × log diameter): the "100 GB arrived at a 100 TB
    * corpus" cost shape.
    *
    * Broadcast precondition (ENFORCED, not just documented): the
    * touched cluster-id set is ≤ one id per fresh endpoint, and the
    * touched MEMBER set is that times the bounded cluster size — both
    * delta-bounded, so both are broadcast to keep the standing map and
    * the standing edge list scan-only (columnar read, ZERO shuffle of
    * either full artifact; only touched-zone survivors shuffle into the
    * fixpoint). The guard is TWO-STAGE so that no broadcast is planned
    * before a shuffled count has cleared it: first the touched
    * cluster-id count (shuffled semi-join + distinct, safe at any delta
    * size), then — only under the bound — the touched MEMBER count via
    * the now-provably-small cluster broadcast. A delta exceeding
    * `maxBroadcastMembers` at either stage falls back to the full
    * [[ccFixpoint]] rebuild over standing ∪ fresh edges — at that size
    * it is no longer an increment, and silently exceeding Spark's
    * broadcast/driver limits would fail at runtime instead.
    *
    * Cost scoping: the O(delta-touched) claim covers the MERGE COMPUTE.
    * The trailing `orderBy(doc_id)` re-materializes (and so shuffles)
    * the full merged map once, because the gate contract needs one
    * deterministic output frame; a production ingest would emit only
    * the relabeled zone and leave untouched cluster artifacts in place
    * on storage, paying nothing per delta for the pass-through rows.
    *
    * Cache contract: the returned map is the ONE persisted frame this
    * call leaves behind (materialized here, inner fixpoint cache
    * released before returning) — callers that are done with it
    * (e.g. after committing it to storage) own its `unpersist()`. */
  private[graft] val DeltaBroadcastMaxMembers = 2000000L
  private[graft] def ccFixpointDelta(standingMap: DataFrame,
      standingEdges: DataFrame, fresh: DataFrame,
      maxBroadcastMembers: Long = DeltaBroadcastMaxMembers): DataFrame = {
    val s = standingMap.sparkSession
    import s.implicits._
    val touchedDocs = fresh.select($"a_id".as("doc_id"))
      .unionByName(fresh.select($"b_id".as("doc_id"))).distinct()
    // both guard frames are PERSISTED the moment their counts are
    // taken: each is re-read several times (the membership count, the
    // touched-edge semi-join, and the pass-through anti-join each plan
    // a broadcast of one of them), and without the cache every re-read
    // re-scans the FULL standing map — 2-3 redundant corpus-map scans
    // per delta. Once a count clears the bound the frame is <= the
    // broadcast limit by definition, so caching it is delta-bounded.
    val touchedClusters = standingMap
      .join(touchedDocs, Seq("doc_id"), "leftsemi")
      .select($"cluster_id").distinct().persist()
    // guard ORDER matters: the cluster-id count runs on shuffled plans
    // only (safe at any delta size) and must clear BEFORE the first
    // broadcast is ever planned — otherwise the guard's own membership
    // count would materialize an over-limit broadcast(touchedClusters)
    // and die in exactly the way the guard exists to prevent. Clusters
    // <= members, so the one bound serves both checks.
    if (touchedClusters.count() > maxBroadcastMembers) {
      touchedClusters.unpersist()
      ccFixpoint(standingEdges.unionByName(fresh))
    } else {
    val touchedMembers = standingMap
      .join(broadcast(touchedClusters), Seq("cluster_id"), "leftsemi")
      .select($"doc_id".as("a_id")).persist()
    if (touchedMembers.count() > maxBroadcastMembers) {
      // the delta touches too much standing mass to stay broadcast-side:
      // run the full fixpoint (same result by the closure argument above,
      // with shuffled joins instead of an over-limit broadcast)
      touchedClusters.unpersist(); touchedMembers.unpersist()
      ccFixpoint(standingEdges.unionByName(fresh))
    } else {
      // a standing edge is intra-cluster by construction, so membership
      // of its a_id endpoint decides the whole edge
      val touchedEdges = standingEdges
        .join(broadcast(touchedMembers), Seq("a_id"), "leftsemi")
      // unordered inner fixpoint: the pass-through union below re-sorts
      // the full map, so the touched-zone sort would be thrown away
      val inner = ccFixpoint(touchedEdges.unionByName(fresh), ordered = false)
      val relabeled = inner.select($"doc_id", $"cluster_id", $"cluster_size")
      val untouched = standingMap
        .join(broadcast(touchedClusters), Seq("cluster_id"), "left_anti")
        .select($"doc_id", $"cluster_id", $"cluster_size")
      val out = untouched.unionByName(relabeled).orderBy($"doc_id").persist()
      out.count() // materialize while the inner fixpoint is still cached
      inner.unpersist()
      touchedClusters.unpersist(); touchedMembers.unpersist()
      out
    }
    }
  }

  /** Incremental cluster-map maintenance (`dedup_cc_delta`): a DELTA of
    * new documents (the `dedup_incremental` slice convention,
    * doc_id % 5 == 0) merges into the STANDING corpus's near-dup
    * clusters without a full rebuild. The standing side's expensive
    * artifacts — its shingle sets, band table, and verified pair list —
    * are read from the [[Models]] train-once store
    * ([[ccStandingArtifacts]]; the production shape: a prior ingest's
    * tables on storage): the ONLY new tokenize/shingle/sign work is
    * O(delta). Delta-touching candidates come from ranking the standing
    * band table union the delta's bands (band keys are 8-byte rows —
    * the cheap, unavoidable re-rank, since new docs change bucket
    * membership), exact verification touches only delta-touching pairs,
    * and the merged map is the COMPONENT-LOCAL fixpoint
    * [[ccFixpointDelta]]: only standing clusters a fresh edge touches
    * are re-labeled, every untouched cluster passes through from the
    * standing map artifact.
    *
    * Correctness: standing-internal pairs ∪ delta-touching pairs = ALL
    * near-dup pairs of the merged corpus, so the result equals the full
    * [[dedupClustersLsh]] rebuild — the oracle is the same recursive
    * CTE every CC row shares. PRECONDITION (same as
    * [[dedupMinhashLsh]]): the "= ALL pairs" claim needs every band
    * bucket to fit the BucketW rank window — standing pairs were
    * windowed by standing-only rank while a rebuild windows union rank,
    * so in an OVERSIZED bucket the incremental candidate set is a
    * strict superset and merged components could diverge from the
    * shared oracle; at the gate parameters every bucket is far inside
    * the window (asserted by the LSH recall gates). This is the
    * ingest-shape answer to "do I re-cluster 100 TB because 100 GB
    * arrived": no — re-shingle the 100 GB, re-rank band keys, verify
    * the touched pairs, re-label only the touched components. */
  def dedupCcDelta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (corpusSh, corpusBands, standing, standingMap) = ccStandingArtifacts(s, d)
    val deltaSh = docShinglesOf(Tables.documents(s, d).filter($"doc_id" % 5 === 0))
    val deltaBands = lshBands(lshSignatures(deltaSh)).persist()
    // new pairs can only form inside band BUCKETS a delta doc landed in,
    // and the candidate rank is bucket-local — so restricting the rank +
    // pair join to delta-touched buckets is EXACT and keeps the
    // incremental candidate stage O(delta-touching bucket rows) instead
    // of re-ranking the whole standing band table (measured: the full
    // re-rank cost the entire LSH candidate stage, ~6 s at sf0.1)
    val deltaKeys = deltaBands.select($"band_idx", $"band_key").distinct()
    // broadcast semi-join, and not only because the delta's distinct
    // bucket keys are small: with a SHUFFLED semi on both union
    // branches, the union's children end in exchanges with IDENTICAL
    // hash partitioning and Spark 4.1 propagates that partitioning
    // through the Union while the union RDD physically has the SUM of
    // the children's partitions — the downstream rank-window then skips
    // its exchange and the pair self-join dies with "Can't zip RDDs
    // with unequal numbers of partitions" (hit at the x100 harness).
    // Broadcasting keeps each branch's own partitioning, the union
    // reports unknown, and the window plans its one exchange.
    val touched = corpusBands.unionByName(deltaBands)
      .join(broadcast(deltaKeys), Seq("band_idx", "band_key"), "leftsemi")
    // fresh edges: candidates with >= 1 delta endpoint, verified against
    // the union shingle table (a fresh-vs-standing join at scale)
    val allSh = corpusSh.unionByName(deltaSh)
    // pinned: the fixpoint reads its edge input twice (forward + swapped
    // union) and then loops — without the pin the whole delta pipeline
    // (sign + bucket semi-join + rank + verify) re-executes per read.
    // LAZY localCheckpoint + count (r21; previously persist + count):
    // materialization cost is identical (the count runs the pipeline
    // once through the normal AQE action path), but the checkpoint also
    // TRUNCATES the lineage, so the merge's several downstream actions
    // (guard counts, touched-zone fixpoint, pass-through union) plan
    // against a leaf instead of re-analyzing the whole delta pipeline
    // per action. Never the EAGER variant: it materializes through a
    // pre-AQE RDD path that dies on unequal-partition SMJ zips (hit at
    // the x100 scale harness — "Can't zip RDDs with unequal numbers of
    // partitions").
    val fresh = ccCheckpoint(lshVerify(
      lshCandidates(touched)
        .filter($"a_id" % 5 === 0 || $"b_id" % 5 === 0),
      allSh)
      .select($"a_id", $"b_id"))
    // no eager count: the lazy checkpoint materializes inside the merge's
    // FIRST action (the touched-cluster guard count) — one driver action
    // fewer per merge at identical distributed work (r21 verdict item 4)
    // the merge returns fully materialized, so the delta pipeline's pins
    // can be released here — the merged map is the one cache left behind
    val merged = ccFixpointDelta(standingMap, standing, fresh)
    deltaBands.unpersist()
    Par.releaseLocalCheckpoint(fresh) // GC-independent release (r21 ADVICE)
    merged
  }

  /** Lineage-truncating checkpoint for the CC/pagerank kernels: LOCAL
    * by default (fast; blocks live on executors, so an executor loss
    * makes the frame unrecomputable and fails the job — acceptable on
    * this harness and a standard trade), RELIABLE when
    * `spark.graft.cc.reliableCheckpoint=true` (requires
    * `sc.setCheckpointDir`; survives executor loss at the cost of one
    * write to the checkpoint dir per truncation — the production
    * setting for a 100 TB fixpoint; CcReliableCheckpointSpec pins label
    * equality across the two modes). Always LAZY: the eager variants
    * materialize through a pre-AQE RDD path that dies on
    * unequal-partition SMJ zips (the r14 x100-harness failure). */
  private[graft] def ccCheckpoint(df: DataFrame): DataFrame =
    if (df.sparkSession.conf
        .getOption("spark.graft.cc.reliableCheckpoint").contains("true"))
      df.checkpoint(false)
    else df.localCheckpoint(false)

  /** The shared pointer-doubling fixpoint: `pairs(a_id, b_id)` ->
    * `(doc_id, cluster_id, cluster_size)` over clustered docs. */
  private[graft] def ccFixpoint(pairs: DataFrame): DataFrame =
    ccFixpoint(pairs, ordered = true)

  /** `ordered = false` skips the trailing doc_id sort: the delta merge's
    * INNER fixpoint feeds a union that re-sorts globally anyway, so the
    * touched-zone sort (and its range-partitioning sample job) is
    * thrown away — gate-facing callers keep the ordered contract. */
  private[graft] def ccFixpoint(pairs: DataFrame, ordered: Boolean): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    // LAZY localCheckpoint on the pair list BEFORE the symmetrizing
    // union (r21): the union's two branches each executed the full pair
    // KERNEL (the shingle/LSH pipeline — by far the biggest plan in the
    // query; measured as two ~1.5 s job waves per call at sf0.1), and
    // the kernel's logical plan was re-analyzed by every downstream
    // action (init witness, each round, the final window). The
    // checkpoint computes the kernel exactly once — inside the same
    // first action, so the one-job-per-round law (DedupJobsSpec) holds —
    // and truncates the lineage so every later action plans against a
    // leaf. Lazy, never eager: the eager variant materializes through a
    // pre-AQE RDD path that dies on unequal-partition SMJ zips (the
    // r14 x100-harness failure; same rationale as the loop below).
    // [[ccCheckpoint]] gates the reliable (executor-loss-tolerant) mode.
    val p = ccCheckpoint(pairs)
    val edges = p
      .union(p.select($"b_id".as("a_id"), $"a_id".as("b_id")))
      .toDF("src", "dst").persist()
    var labels = edges.select($"src".as("doc_id")).distinct()
      .withColumn("lab", $"doc_id").persist()
    // fixpoint loop: labels only ever decrease, so the label sum is a
    // strictly-monotone convergence witness (one cheap action per round)
    var prevSum = Option(labels.agg(sum($"lab")).first().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    var converged = prevSum == 0L
    var iter = 0
    try {
      while (!converged && iter < 50) {
        // min over neighbors' labels…
        val viaEdges = edges.join(labels, edges("dst") === labels("doc_id"))
          .select(edges("src").as("doc_id"), labels("lab"))
        // …and over label-of-label (the pointer-doubling shortcut): v's
        // label L is itself a vertex, so jump straight to L's label
        val l2 = labels.select($"doc_id".as("l_id"), $"lab".as("l_lab"))
        val viaShortcut = labels.join(l2, labels("lab") === l2("l_id"))
          .select(labels("doc_id"), l2("l_lab").as("lab"))
        // localCheckpoint, not persist: the shortcut references the
        // label frame three times, so round k's LOGICAL PLAN would grow
        // 3^k without lineage truncation (plan rendering alone OOMs by
        // round ~10). Checkpointing makes each round's plan constant-size;
        // at cluster scale the reliable checkpoint() variant adds fault
        // tolerance at the same cost shape. LAZY (eager=false) so the
        // convergence-witness aggregate below is the round's ONE action:
        // it materializes the checkpoint and returns the label sum in the
        // same job, instead of paying a separate materialization pass.
        val prop = viaEdges.union(viaShortcut).union(labels)
          .groupBy($"doc_id").agg(min($"lab").as("lab"))
        val propCk = ccCheckpoint(prop)
        val newSum = propCk.agg(sum($"lab")).first().getLong(0)
        // deterministic release of the PREVIOUS round's frame now that
        // this round is materialized: unpersist covers round 0's cache,
        // releaseLocalCheckpoint the later rounds' checkpoint blocks
        // (otherwise one block set per round waits on the GC — r21
        // ADVICE on lazy-checkpoint reclamation)
        labels.unpersist()
        Par.releaseLocalCheckpoint(labels)
        labels = propCk
        converged = newSum == prevSum
        prevSum = newSum
        iter += 1
      }
      lastCcRounds = iter
      // under-merged labels would silently diverge from the transitive
      // closure the caller (and the oracle) expects — refuse to return them
      if (!converged) {
        throw new IllegalStateException(
          s"dedupClusters did not converge in $iter rounds — with shortcutting " +
            "that needs a component of diameter ~2^50; investigate the edge list")
      }
      val wc = org.apache.spark.sql.expressions.Window.partitionBy($"lab")
      val labeled = labels
        .select($"doc_id", $"lab".as("cluster_id"),
          count(lit(1)).over(wc).as("cluster_size"))
      val out = (if (ordered) labeled.orderBy($"doc_id") else labeled)
        .persist()
      out.count() // materialize while labels is still cached
      out
    } finally {
      edges.unpersist()
      labels.unpersist() // the result is its own (clustered-docs-sized) cache
      Par.releaseLocalCheckpoint(labels) // final round's checkpoint blocks
      Par.releaseLocalCheckpoint(p) // the pair-kernel checkpoint
    }
  }
  /** Shared CC oracle CTEs: near-dup pairs -> symmetric edges ->
    * transitive closure -> component-min labels (clustered docs only). */
  private[graft] val CcCteSql: String =
    s"""$ShingleCteSql,
       |rare AS (
       |  SELECT s FROM ex GROUP BY s HAVING COUNT(*) <= $CcDfCap
       |), exc AS (
       |  SELECT ex.* FROM ex JOIN rare USING (s)
       |), p AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM exc a JOIN exc b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id
       |  HAVING COUNT(*)::DOUBLE / (ANY_VALUE(a.sz) + ANY_VALUE(b.sz) - COUNT(*)) >= $JaccardThreshold
       |), e AS (
       |  SELECT a_id AS s, b_id AS t FROM p UNION SELECT b_id, a_id FROM p
       |), walk(s, t) AS (
       |  SELECT s, t FROM e
       |  UNION
       |  SELECT walk.s, e2.t FROM walk JOIN e e2 ON walk.t = e2.s
       |), lab AS (
       |  SELECT s AS doc_id, LEAST(s, MIN(t)) AS cluster_id FROM walk GROUP BY s
       |)""".stripMargin
  val dedupClustersSql: String =
    s"""WITH RECURSIVE $CcCteSql
       |SELECT doc_id, cluster_id,
       |  COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
       |FROM lab ORDER BY doc_id""".stripMargin

  // --------------------------------------------- canonical selection
  /** The step after clustering that real dedup pipelines run: decide
    * WHICH copy survives. Every document gets a verdict row — clustered
    * docs keep exactly one representative per component (longest text
    * wins, ties to the smallest doc_id; "keep the longest version" is
    * the standard near-dup survivor heuristic), unclustered docs are
    * their own singleton cluster and trivially survive. The gate entry
    * reads the standing [[clusterMap]] artifact (built once per corpus
    * fingerprint via the LSH kernel and cached in the [[Models]] store),
    * so survivor selection never pays the CC fixpoint a second time;
    * the kernel rows `dedup_cc`/`dedup_cc_lsh` remain deliberately
    * uncached and measure the fixpoint itself. The overload below
    * accepts any precomputed map for pipelines that manage their own
    * artifact lifecycle.
    *
    * Scale shape: one left join of the corpus against the (much smaller)
    * cluster map on an 8-byte key, one per-cluster window ranking —
    * both shuffle on keys bounded by the corpus, no fan-out. */
  def dedupKeepCanonical(s: SparkSession, d: String): DataFrame =
    dedupKeepCanonical(s, d, clusterMap(s, d))

  /** Survivor selection over a PRECOMPUTED cluster map (`doc_id,
    * cluster_id, cluster_size` — [[dedupClusters]]'s schema). */
  def dedupKeepCanonical(s: SparkSession, d: String, clusterMap: DataFrame): DataFrame = {
    import s.implicits._
    val clusters = clusterMap
      .select($"doc_id", $"cluster_id", $"cluster_size")
    val verdicts = Tables.documents(s, d).select($"doc_id", $"n_chars")
      .join(clusters, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"cluster_id", $"doc_id").as("cluster_id"),
        coalesce($"cluster_size", lit(1L)).as("cluster_size"),
        $"n_chars")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"cluster_id").orderBy($"n_chars".desc, $"doc_id")
    verdicts
      .withColumn("keep", row_number().over(w) === 1)
      .select($"doc_id", $"cluster_id", $"cluster_size", $"keep")
      .orderBy($"doc_id")
  }
  val dedupKeepCanonicalSql: String =
    s"""WITH RECURSIVE $CcCteSql,
       |cc AS (
       |  SELECT doc_id, cluster_id,
       |    COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
       |  FROM lab
       |), alldocs AS (
       |  SELECT d.doc_id, COALESCE(cc.cluster_id, d.doc_id) AS cluster_id,
       |    CAST(COALESCE(cc.cluster_size, 1) AS BIGINT) AS cluster_size, d.n_chars
       |  FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id
       |)
       |SELECT doc_id, cluster_id, cluster_size,
       |  (ROW_NUMBER() OVER (PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id) = 1) AS keep
       |FROM alldocs ORDER BY doc_id""".stripMargin

  // --------------------------------------------- cluster observability
  /** Near-dup cluster-size histogram (`dedup_cluster_stats`): per
    * cluster size, how many clusters and documents — INCLUDING the
    * singleton row (documents in no near-dup pair), which the raw
    * component table cannot show and which dominates any healthy
    * corpus. The dedup dashboard row: a fattening tail here is the
    * early warning that a source started minting templated near-dups.
    *
    * Built ON TOP of the [[dedupClusters]] kernel (components are ≥2 by
    * construction — every labeled vertex has an edge — so the singleton
    * row never collides with a computed size). The histogram reduces
    * O(docs) component rows to O(distinct sizes); the singleton count is
    * a crossJoin of two one-row counts (bounded, whitelisted). */
  def dedupClusterStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val clusters = clusterMap(s, d)
    val hist = clusters.groupBy($"cluster_id").agg(count(lit(1)).as("sz"))
      .groupBy($"sz".as("cluster_size")).agg(count(lit(1)).as("n_clusters"))
      .select($"cluster_size", $"n_clusters",
        ($"cluster_size" * $"n_clusters").as("n_docs"))
    val singletons = Tables.documents(s, d).agg(count(lit(1)).as("n_total"))
      .crossJoin(clusters.agg(count(lit(1)).as("n_clustered")))
      .select(lit(1L).as("cluster_size"),
        ($"n_total" - $"n_clustered").as("n_clusters"),
        ($"n_total" - $"n_clustered").as("n_docs"))
    singletons.unionAll(hist).orderBy($"cluster_size")
  }
  val dedupClusterStatsSql: String =
    s"""WITH RECURSIVE $CcCteSql,
       |per AS (SELECT cluster_id, COUNT(*) AS sz FROM lab GROUP BY cluster_id),
       |hist AS (
       |  SELECT CAST(sz AS BIGINT) AS cluster_size,
       |    CAST(COUNT(*) AS BIGINT) AS n_clusters,
       |    CAST(sz * COUNT(*) AS BIGINT) AS n_docs
       |  FROM per GROUP BY sz)
       |SELECT * FROM (
       |  SELECT CAST(1 AS BIGINT) AS cluster_size,
       |    CAST((SELECT COUNT(*) FROM documents) - (SELECT COUNT(*) FROM lab) AS BIGINT) AS n_clusters,
       |    CAST((SELECT COUNT(*) FROM documents) - (SELECT COUNT(*) FROM lab) AS BIGINT) AS n_docs
       |  UNION ALL SELECT cluster_size, n_clusters, n_docs FROM hist)
       |ORDER BY cluster_size""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_cluster_stats" -> dedupClusterStats _,
    "dedup_exact" -> dedupExact _,
    "dedup_fingerprint" -> dedupFingerprint _,
    "dedup_ngram_jaccard" -> dedupNgramJaccard _,
    "dedup_minhash_lsh" -> dedupMinhashLsh _,
    "minhash_est_bound" -> minhashEstBound _,
    "dedup_simhash" -> dedupSimhash _,
    "dedup_cc" -> dedupClusters _,
    "dedup_cc_lsh" -> dedupClustersLsh _,
    "dedup_cc_delta" -> dedupCcDelta _,
    "dedup_keep_canonical" -> dedupKeepCanonical _,
  )
  val oracles: Map[String, String] = Map(
    "dedup_cluster_stats" -> dedupClusterStatsSql,
    "dedup_exact" -> dedupExactSql,
    "dedup_fingerprint" -> dedupFingerprintSql,
    "dedup_ngram_jaccard" -> dedupNgramJaccardSql,
    "dedup_minhash_lsh" -> dedupMinhashLshSql,
    "minhash_est_bound" -> minhashEstBoundSql,
    "dedup_simhash" -> dedupSimhashSql,
    "dedup_cc" -> dedupClustersSql,
    "dedup_cc_lsh" -> dedupClustersSql,
    // identical components by construction (standing ∪ delta-touching
    // pairs = all pairs) => shares the CC oracle
    "dedup_cc_delta" -> dedupClustersSql,
    "dedup_keep_canonical" -> dedupKeepCanonicalSql,
  )
}
