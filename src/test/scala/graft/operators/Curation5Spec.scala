package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Planted-scenario laws for the Curation5 operators and the BPE
  * encoder: entropy's integer micro-nat arithmetic must be exact on a
  * hand-computable histogram, winnowing must honor its published match
  * guarantee (shared substring of length ≥ k+w−1 ⇒ shared fingerprint),
  * and BPE encoding must compress exactly as the learned merge table
  * dictates — training exactly once per JVM (the Models law).
  */
class Curation5Spec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.codegen.maxFields", "256")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def stageDocs(rows: Seq[(Long, String, String)]): String = {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-c5").toString
    rows.toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'en' AS lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("text_entropy: constant doc scores 0, abab scores exactly ln2 micro-nats") {
    val dir = stageDocs(Seq(
      (1L, "aaaaaaaa", "s"),
      (2L, "abab", "s")))
    val got = Curation5.textEntropy(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((8L, 1L, 0L)), s"constant doc: ${got(1L)}")
    // n=4, two chars x2: ent = (4*lnu(4) - 2*(2*lnu(2))) div 4 = lnu(2) = 693147
    assert(got(2L) == ((4L, 2L, 693147L)), s"abab doc: ${got(2L)}")
  }

  test("winnow_fingerprint: docs sharing a >= k+w-1 substring share a fingerprint; disjoint docs share none") {
    val shared = "zqxjkvwpyg_unique_marker_block" // 30 chars >= k+w-1 = 11
    val dir = stageDocs(Seq(
      (1L, s"first document prefix $shared and a suffix here", "s"),
      (2L, s"totally different opening then $shared trailing words", "s"),
      (3L, "completely disjoint content in this third row 0123456789 end", "s")))
    val got = Curation5.winnowFingerprint(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L)._2 >= 1, s"doc 1 must share a winnowed fingerprint: ${got(1L)}")
    assert(got(2L)._2 >= 1, s"doc 2 must share a winnowed fingerprint: ${got(2L)}")
    assert(got(3L)._2 == 0, s"doc 3 shares nothing: ${got(3L)}")
    // density sanity: selected fingerprints never exceed the full-window count
    got.foreach { case (id, (nFp, _)) =>
      assert(nFp >= 1, s"doc $id selected no fingerprint")
    }
  }

  test("bpe_encode: merge table applies exactly, and training runs once per JVM") {
    val dir = stageDocs(Seq(
      (1L, "aa aa aa", "s"),
      (2L, "aa b", "s")))
    val first = TextAnalysis.bpeEncode(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // learned merge 1: "a a" (count 4) -> every "aa" word becomes one token;
    // no adjacent pairs remain, so the loop exhausts after round 1
    assert(first(1L) == ((6L, 3L)), s"doc 1 units: ${first(1L)}")
    assert(first(2L) == ((3L, 2L)), s"doc 2 units: ${first(2L)}")
    val second = TextAnalysis.bpeEncode(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(second == first, "encode must be deterministic across calls")
    val key = s"bpe:${Models.inputFingerprint(dir)}:m${TextAnalysis.BpeMerges}"
    assert(Models.builds(key) == 1,
      s"merge table must train exactly once per JVM, trained ${Models.builds(key)} times")
  }

  test("q59_interval_union: overlapping intervals merge, disjoint intervals open islands") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-c5e").toString
    val t0 = java.time.LocalDateTime.of(2026, 1, 1, 0, 0, 0)
    // user 1: events 10 min apart (intervals overlap -> one island, 40 min)
    // user 2: events 2 h apart (disjoint -> two islands, 60 min)
    Seq(
      (1L, t0, 1L), (2L, t0.plusMinutes(10), 1L),
      (3L, t0, 2L), (4L, t0.plusHours(2), 2L))
      .toDF("event_id", "ts", "user_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.queries.Relational3.q59IntervalUnion(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((2L, 1L, 40L * 60 * 1000000)), s"user 1: ${got(1L)}")
    assert(got(2L) == ((2L, 2L, 60L * 60 * 1000000)), s"user 2: ${got(2L)}")
  }
}
