package graft.sources

import java.net.URLDecoder
import java.nio.charset.StandardCharsets
import java.time.Instant

import scala.jdk.CollectionConverters._
import scala.util.Try

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Parses queue notification bodies into [[FileMetadata]].
  *
  * Two wire formats are accepted:
  *
  *  1. S3 event notifications (reference: AsyncSqsClientImpl.scala:321-360):
  *     keep only records whose eventName contains "ObjectCreated", build
  *     `s3://bucket/key` with the URL-decoded key, parse ISO-8601
  *     eventTime to epoch millis. Malformed / non-create bodies => None.
  *  2. A minimal native format for local and test use:
  *     `{"path": "...", "timestampMs": 123}`.
  */
object EventParser {
  private val mapper = new ObjectMapper()

  def parse(message: QueueMessage): Option[FileMetadata] = {
    val root = Try(mapper.readTree(message.body)).getOrElse(return None)
    if (root == null || !root.isObject) return None
    if (root.has("path")) parseNative(root, message)
    else parseS3Event(root, message)
  }

  private def parseNative(root: JsonNode, m: QueueMessage): Option[FileMetadata] = {
    val path = root.get("path").asText()
    if (path == null || path.isEmpty) return None
    val ts = if (root.has("timestampMs")) root.get("timestampMs").asLong()
      else System.currentTimeMillis()
    Some(FileMetadata(path, ts, m.messageId))
  }

  private def parseS3Event(root: JsonNode, m: QueueMessage): Option[FileMetadata] = {
    val records = root.get("Records")
    if (records == null || !records.isArray) return None
    records.elements().asScala.flatMap { rec =>
      val eventName = Option(rec.get("eventName")).map(_.asText()).getOrElse("")
      if (!eventName.contains("ObjectCreated")) None
      else {
        for {
          s3 <- Option(rec.get("s3"))
          bucket <- Option(s3.get("bucket")).flatMap(b => Option(b.get("name"))).map(_.asText())
          keyRaw <- Option(s3.get("object")).flatMap(o => Option(o.get("key"))).map(_.asText())
        } yield {
          // S3 keys arrive URL-encoded with '+' for space
          val key = URLDecoder.decode(keyRaw.replace("+", "%20"), StandardCharsets.UTF_8)
          val ts = Option(rec.get("eventTime")).map(_.asText())
            .flatMap(t => Try(Instant.parse(t).toEpochMilli).toOption)
            .getOrElse(System.currentTimeMillis())
          FileMetadata(s"s3://$bucket/$key", ts, m.messageId)
        }
      }
    }.nextOption()
  }
}
