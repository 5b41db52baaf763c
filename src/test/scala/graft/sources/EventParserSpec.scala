package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Wire-format parsing, incl. the reference's S3 notification fixtures
  * (FIXTURES.md A5: URL-encoded keys, create vs remove events, malformed
  * bodies). */
class EventParserSpec extends AnyFunSuite {
  private def s3Event(eventName: String, key: String,
      time: String = "2023-02-14T22:53:31.748Z"): String =
    s"""{"Records":[{"eventVersion":"2.1","eventSource":"aws:s3",
       |"eventTime":"$time","eventName":"$eventName",
       |"s3":{"bucket":{"name":"testbucket"},
       |"object":{"key":"$key","size":100}}}]}""".stripMargin

  test("ObjectCreated event parses with URL-decoded key and epoch ms") {
    val body = s3Event("ObjectCreated:Put", "valPartition%3Dpart1678486410_0/part-00000-created.csv")
    val m = EventParser.parse(QueueMessage("id1", body))
    assert(m.contains(FileMetadata(
      "s3://testbucket/valPartition=part1678486410_0/part-00000-created.csv",
      1676415211748L, "id1")))
  }

  test("'+' decodes to space in keys") {
    val m = EventParser.parse(QueueMessage("id", s3Event("ObjectCreated:Put", "a+b.csv")))
    assert(m.get.filePath == "s3://testbucket/a b.csv")
  }

  test("ObjectRemoved and other events are discarded") {
    assert(EventParser.parse(QueueMessage("id", s3Event("ObjectRemoved:Delete", "x.csv"))).isEmpty)
    assert(EventParser.parse(QueueMessage("id", s3Event("TestEvent", "x.csv"))).isEmpty)
  }

  test("malformed bodies give None, not exceptions") {
    assert(EventParser.parse(QueueMessage("id", "not json")).isEmpty)
    assert(EventParser.parse(QueueMessage("id", "{}")).isEmpty)
    assert(EventParser.parse(QueueMessage("id", """{"Records": "nope"}""")).isEmpty)
    assert(EventParser.parse(QueueMessage("id", """[1,2]""")).isEmpty)
  }

  test("native format: path + timestampMs") {
    val m = EventParser.parse(QueueMessage("id9", """{"path":"file:/tmp/x.json","timestampMs":42}"""))
    assert(m.contains(FileMetadata("file:/tmp/x.json", 42L, "id9")))
  }
}
