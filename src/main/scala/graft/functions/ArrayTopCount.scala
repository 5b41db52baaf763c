package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Mode-count statistics of a string array — `struct(top_cnt, total)`
  * where `top_cnt` is the multiplicity of the array's most frequent
  * element and `total` its length — as a native Catalyst expression:
  * one hash-map pass per row, no per-element row ever exists.
  *
  * This is the per-document kernel behind the Gopher repetition
  * filters: `max(c)/sum(c)` over a document's n-gram counts is exactly
  * `top_cnt/total`, which the explode-then-two-hash-aggregates spelling
  * computed by shuffling every n-gram occurrence of the corpus twice
  * (per gram order). Keyed by nothing — the whole reduction happens
  * inside the row — so the operator is a shuffle-FREE projection at any
  * corpus size; the (b)-tier custom-Expression path (SURVEY §7.2), same
  * escalation as [[CharEntropy]]: built-ins can't keep a histogram
  * inside the row without an O(d²) `transform`+`filter` lambda over
  * boxed strings. `doGenCode` emits a static call so the surrounding
  * whole-stage codegen span stays intact.
  *
  * Element semantics match `explode` + `groupBy`: null elements group
  * together as one key (explode keeps null rows; groupBy groups them);
  * a null or empty array returns null struct / (0, 0) respectively —
  * callers filter the same way the aggregate spelling's inner joins
  * dropped gram-less documents.
  */
object ArrayTopCount {

  /** Shared by interpreted eval and codegen. One HashMap pass over the
    * array's UTF8String elements (bytes-equality, the same key equality
    * the groupBy used). */
  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    // mutable long[1] cells: one allocation per DISTINCT key, not a
    // boxed Long per element occurrence (Zipfy gram arrays repeat a
    // lot — merge(.., Long, ..) re-boxed on every increment)
    val counts = new java.util.HashMap[UTF8String, Array[Long]](Math.max(16, n * 2))
    var nulls = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) nulls += 1L
      else {
        val k = arr.getUTF8String(i)
        var cell = counts.get(k)
        if (cell == null) { cell = new Array[Long](1); counts.put(k, cell) }
        cell(0) += 1L
      }
      i += 1
    }
    var top = nulls // the null group is one key, like groupBy(null)
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next()(0); if (c > top) top = c }
    new GenericInternalRow(Array[Any](top, n.toLong))
  }

  def arrayTopCount(arr: Column): Column =
    GraftShims.column(ArrayTopCountExpression(GraftShims.expression(arr)))
}

/** Input must be array<string>; see [[ArrayTopCount]]. */
case class ArrayTopCountExpression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("top_cnt", LongType, nullable = false),
    StructField("total", LongType, nullable = false)))
  override def prettyName: String = "array_top_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"array_top_count requires array<string>, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ArrayTopCount.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ArrayTopCount.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ArrayTopCountExpression =
    copy(child = newChild)
}
