import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, LambdaFunction, StringSplit}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
val spark = SparkSession.builder().master("local[8]")
  .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false")
  .config("spark.sql.session.timeZone","UTC")
  .config("spark.sql.codegen.maxFields","256").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
val d = "/root/testdata/sf0.01"

def splitsInsideLambdas(plan: LogicalPlan): Int = {
  var n = 0
  plan.foreach { node =>
    node.expressions.foreach { e =>
      e.foreach {
        case lf: LambdaFunction =>
          lf.function.foreach { case _: StringSplit => n += 1; case _ => }
        case _ =>
      }
    }
  }
  n
}
def totalSplits(plan: LogicalPlan): Int = {
  var n = 0
  plan.foreach { node => node.expressions.foreach { e => e.foreach { case _: StringSplit => n += 1; case _ => } } }
  n
}
val textQs = Seq(
  "dedup_exact","dedup_ngram_jaccard","dedup_minhash_lsh","dedup_simhash",
  "dedup_cc","dedup_segments","dedup_incremental","dedup_substrings",
  "decontaminate","dsir_resample","text_cooccur","text_repetition",
  "text_quality","text_lang_id","text_token_count","text_fingerprint_groups",
  "text_perplexity","tfidf_top_terms","pii_redact","corpus_stats")
textQs.foreach { name =>
  graft.SparkEntry.queries.get(name) match {
    case Some(fn) =>
      try {
        val qe = fn(spark, d).queryExecution
        val opt = qe.optimizedPlan
        println(f"AUDIT $name%-24s splits=${totalSplits(opt)}%-3d inLambda=${splitsInsideLambdas(opt)}%-3d")
      } catch { case e: Exception => println(s"AUDIT $name ERROR ${e.getMessage.take(80)}") }
    case None => println(s"AUDIT $name MISSING")
  }
}
spark.stop(); sys.exit(0)
