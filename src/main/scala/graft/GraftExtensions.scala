package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{MinHashAgg, SimHashExpression, VectorDotExpression}

/** Session extensions exposing the engine's native expressions to SQL:
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  *   // or: --conf spark.sql.extensions=graft.GraftExtensions
  *   spark.sql("SELECT simhash(split(text, ' ')), vector_dot(a, b) FROM t")
  *   spark.sql("SELECT minhash_agg(xxhash64(s), 128) FROM shingles GROUP BY doc_id")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("simhash"),
      info("simhash", "simhash(array<string>) - 64-bit SimHash of a token array"),
      (args: Seq[Expression]) => SimHashExpression(args.head)))

    e.injectFunction((
      FunctionIdentifier("vector_dot"),
      info("vector_dot", "vector_dot(array<float>, array<float>) - double dot product"),
      (args: Seq[Expression]) => VectorDotExpression(args(0), args(1))))

    e.injectFunction((
      FunctionIdentifier("hamming64"),
      info("hamming64", "hamming64(bigint, bigint) - hamming distance of two 64-bit hashes"),
      (args: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.{BitwiseCount, BitwiseXor}
        BitwiseCount(BitwiseXor(args(0), args(1)))
      }))

    e.injectFunction((
      FunctionIdentifier("minhash_agg"),
      info("minhash_agg", "minhash_agg(hash bigint, k int) - k-permutation minhash signature"),
      (args: Seq[Expression]) => {
        val k = args(1).eval(null).asInstanceOf[Int]
        MinHashAgg(args.head, k).toAggregateExpression()
      }))
  }
}
