package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Direct pins for [[ArrayTopCount]] — the per-row mode-count kernel
  * behind text_repetition. The oracled gate row checks the whole query;
  * this checks the expression against a naive Scala model on seeded
  * random arrays, plus the edge semantics the scaladoc promises
  * (null elements group as ONE key like explode+groupBy; empty array
  * -> (0,0); null array -> null row). */
class ArrayTopCountSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def run(arrays: Seq[Seq[String]]): Seq[(Long, Long)] = {
    val s = spark; import s.implicits._
    arrays.zipWithIndex.map { case (a, i) => (i.toLong, a) }
      .toDF("id", "arr")
      .select($"id", ArrayTopCount.arrayTopCount(col("arr")).as("tc"))
      .orderBy($"id")
      .select($"tc.top_cnt", $"tc.total")
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
  }

  private def model(a: Seq[String]): (Long, Long) = {
    if (a.isEmpty) (0L, 0L)
    else {
      val top = a.groupBy(identity).values.map(_.size).max.toLong
      (top, a.size.toLong)
    }
  }

  test("matches the naive model on seeded random arrays") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "bb", "ccc", "d", "e", "ff", "g")
    val arrays = (1 to 200).map { _ =>
      Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
    }
    assert(run(arrays) == arrays.map(model))
  }

  test("null elements group as one key, like explode+groupBy") {
    val s = spark; import s.implicits._
    // 3 nulls vs 2 "x": the null group wins with count 3
    val df = Seq((1L, Seq[String](null, "x", null, "x", null)))
      .toDF("id", "arr")
      .select(ArrayTopCount.arrayTopCount(col("arr")).as("tc"))
      .select($"tc.top_cnt", $"tc.total")
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((3L, 5L)))
  }

  test("empty array -> (0,0); null array -> null struct") {
    val s = spark; import s.implicits._
    val df = Seq((1L, Some(Seq.empty[String])), (2L, Option.empty[Seq[String]]))
      .toDF("id", "arr")
      .select($"id", ArrayTopCount.arrayTopCount(col("arr")).as("tc"))
      .orderBy($"id")
    val rows = df.collect()
    assert(rows(0).getStruct(1).getLong(0) == 0L)
    assert(rows(0).getStruct(1).getLong(1) == 0L)
    assert(rows(1).isNullAt(1))
  }

  test("non-string array input is rejected at analysis") {
    val s = spark; import s.implicits._
    val ex = intercept[Exception] {
      Seq(Tuple1(Seq(1, 2, 3))).toDF("arr")
        .select(ArrayTopCount.arrayTopCount(col("arr"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("array<string>"))
  }
}
