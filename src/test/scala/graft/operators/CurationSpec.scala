package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture behavior of the curation operators (the oracle gate
  * covers the driver tables; these pin down the semantics on inputs with
  * known answers). */
class CurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def plantDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-curation").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("fixture"))
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("decontaminate flags the planted benchmark leak and nothing else") {
    val leaked = (1 to 12).map(i => s"leak$i").mkString(" ")
    val dir = plantDocs(Seq(
      7L -> leaked,                               // benchmark doc (7 % 10 == 7)
      17L -> ((1 to 12).map(i => s"only$i").mkString(" ")), // clean benchmark doc
      3L -> s"prefix tokens here $leaked trailing bits",    // corpus doc leaking it
      4L -> ((100 to 120).map(i => s"c$i").mkString(" "))))  // unrelated corpus doc
    val got = Curation.decontaminate(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(7L)._1 == 1L, s"leak not detected: $got")
    assert(got(7L)._2 == 5L, "12 shared tokens hold 5 distinct 8-grams")
    assert(got(17L) == ((0L, 0L)), s"clean benchmark doc flagged: $got")
    assert(got.keySet == Set(7L, 17L), "every benchmark doc reports, nothing else")
  }

  test("decontaminate plans an equi-join, not a nested loop") {
    val dir = plantDocs(Seq(7L -> "a b c d e f g h", 1L -> "a b c d e f g h"))
    val plan = Curation.decontaminate(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"contamination join degenerated:\n$plan")
  }

  test("text_repetition scores a looping doc high and a diverse doc low") {
    val dir = plantDocs(Seq(
      1L -> "spam ham spam ham spam ham spam ham spam ham", // top 2-gram dominates
      2L -> ((1 to 10).map(i => s"w$i").mkString(" "))))     // all distinct
    val got = Curation.textRepetition(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    // doc 1: 9 bigrams, "spam ham" appears 5 times
    assert(math.abs(got(1L)._1 - 5.0 / 9.0) < 1e-12)
    assert(got(1L)._3 == 0.2) // 2 distinct / 10 tokens
    assert(got(2L)._1 == 1.0 / 9.0 && got(2L)._3 == 1.0)
  }

  test("text_cooccur ranks an always-together pair above independent tokens") {
    // pair (aa, bb) always co-occurs; cc floats independently
    val docs = (1L to 8L).map(i => i -> s"aa bb filler$i") ++
      (9L to 16L).map(i => i -> s"cc alone$i aa")
    val dir = plantDocs(docs)
    val rows = Curation.textCooccur(spark, dir).collect()
    val lift = rows.map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    // aa:16 docs, bb:8, together 8 -> lift = 8*16/(16*8) = 1
    // aa-cc together 8 of 16, cc:8 -> same 1.0; bb-cc never together -> absent
    assert(lift(("aa", "bb")) == 1.0)
    assert(!lift.contains(("bb", "cc")), "never-co-occurring pair must not appear")
    // perfect exclusive pair beats the structural baseline: plant one
    val dir2 = plantDocs((1L to 4L).map(i => i -> s"xx yy noise$i") ++
      (5L to 12L).map(i => i -> s"zz other$i"))
    val rows2 = Curation.textCooccur(spark, dir2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    // xx,yy: 4 docs each, together 4, N=12 -> lift 12*4/16 = 3
    assert(rows2(("xx", "yy")) == 3.0)
  }
}
