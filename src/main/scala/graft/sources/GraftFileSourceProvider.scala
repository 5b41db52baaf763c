package graft.sources

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.execution.streaming.Source
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Registration + factory for the push-based file source
  * (reference: S3ConnectorSourceProvider.scala:30-52).
  *
  * Usage:
  * {{{
  *   spark.readStream
  *     .format("graft-files")
  *     .schema(schema)                  // mandatory: no inference
  *     .option("fileFormat", "json")
  *     .option("queueName", "myqueue")
  *     .load()
  * }}}
  */
class GraftFileSourceProvider extends DataSourceRegister with StreamSourceProvider {

  override def shortName(): String = "graft-files"

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    // schema inference is rejected by design: the queue announces paths,
    // not contents (reference: S3ConnectorSourceProvider.scala:32-39)
    if (schema.isEmpty) throw new GraftNoSchemaException
    (shortName(), schema.get)
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    new GraftFileSource(sqlContext, metadataPath,
      schema.getOrElse(throw new GraftNoSchemaException), parameters)
  }
}
