package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.{ClassicConversions, ColumnConversions}
import org.apache.spark.sql.types.StructType

/** The single `private[sql]` escape hatch this engine needs.
  *
  * Spark 4 moved `Dataset.ofRows` behind `org.apache.spark.sql.classic`
  * with `private[sql]` access, so turning a hand-built `LogicalRelation`
  * into a user-facing streaming DataFrame requires one file inside the
  * `org.apache.spark.sql` package tree. The reference does the identical
  * thing for Spark 3 (S3SparkUtils.scala:18,58-59); SNIPPETS.md shows the
  * pattern is standard for out-of-tree V1 sources. Everything else in the
  * engine uses public/DeveloperApi surface.
  */
object GraftShims {
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Wrap a raw Catalyst Expression as a user-facing Column (Spark 4 hides
    * the Column(expr) constructor behind classic ClassicConversions). */
  def column(e: Expression): Column =
    ClassicConversions.ColumnConstructorExt(Column).apply(e)

  /** Extract the Catalyst Expression backing a Column. */
  def expression(c: Column): Expression = ColumnConversions.expression(c)

  /** Empty *streaming* DataFrame (isStreaming=true), for zero-file batches. */
  def emptyStreamingDataFrame(
      spark: org.apache.spark.sql.SparkSession,
      schema: StructType): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val rdd: RDD[InternalRow] = cs.sparkContext.emptyRDD[InternalRow]
    cs.internalCreateDataFrame(rdd, schema, isStreaming = true)
  }
}
